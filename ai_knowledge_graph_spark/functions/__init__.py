"""Pure functions shared by the Spark UDFs, the single-node oracle and tests."""
