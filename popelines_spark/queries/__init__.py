"""Registered correctness queries, one module per SURVEY.md §2 group."""
