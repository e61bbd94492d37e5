"""Materialized graph tables + DataFrame query layer."""
