"""Query-time and ingest-time operators (SURVEY.md §2)."""
