"""Structured Streaming surface (optional per SURVEY.md §2: the
reference has zero streaming code — 'Streaming' appears only in its
metadata, reference setup.py:10 — so this mirrors the batch tier
semantics onto readStream/writeStream for parity-plus)."""
