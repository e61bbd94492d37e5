"""Spark operators: each module re-expresses one reference pipeline phase."""
