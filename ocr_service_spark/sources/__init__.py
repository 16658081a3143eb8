"""Source/sink tier (SURVEY.md §2.1)."""
