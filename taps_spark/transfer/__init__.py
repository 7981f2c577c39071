"""Whole-dataset transfer jobs (the reference's pull/push surface,
re-expressed as parallel DataFrame reads/writes with a resume
manifest and checksum verification)."""
