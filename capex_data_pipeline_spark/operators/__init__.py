"""Relational operators of the engine (SURVEY.md §2), as pure
DataFrame -> DataFrame / Column transforms. No driver-side state."""
