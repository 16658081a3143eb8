"""Structured Streaming tier: the reference's incremental subsystem
(feedback → active-learning, SURVEY.md §2.10) as real streams."""
