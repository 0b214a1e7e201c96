"""Streaming / incremental ingest (SURVEY.md §2.5 streaming notes)."""
