"""Utilities: image I/O, stats, progress, checkpointing, CLI."""
