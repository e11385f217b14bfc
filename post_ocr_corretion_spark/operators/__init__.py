"""DataFrame-level operators of the engine (SURVEY.md §2 inventory)."""
