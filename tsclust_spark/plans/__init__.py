"""Job-level plans: checkpoint manifest, incremental merge (SURVEY.md C3/C4)."""
