"""Utilities: seeding, checkpointing, logging, profiling, mesh export."""
