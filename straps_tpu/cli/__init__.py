"""CLI entry points (train / predict / eval)."""
