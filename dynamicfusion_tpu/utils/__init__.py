"""Utilities: checkpointing, metrics/profiling."""
