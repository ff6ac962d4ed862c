"""Composable DataFrame operators (SURVEY.md §2 Part B custom pieces)."""
