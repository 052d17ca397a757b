"""Utilities: checkpoint conversion, logging/metrics, profiling."""
