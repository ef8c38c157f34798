"""Search layer (SURVEY.md §2.8): normalized name index + exact and
fuzzy lookup with the reference's re-scoring arithmetic."""
