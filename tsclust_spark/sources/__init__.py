"""Sequence-table sources/sinks + deterministic synthetic generation."""
