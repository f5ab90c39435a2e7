"""Utilities: checkpoints, profiling."""
