"""Sources & sinks: triple/graph JSON scans, CSV export, checkpoint tables."""
