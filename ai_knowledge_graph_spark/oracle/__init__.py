"""Single-node oracles for testing the Spark engine."""
