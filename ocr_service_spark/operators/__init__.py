"""Spark DataFrame operator library (see SURVEY.md §2 inventory)."""
