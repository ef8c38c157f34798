"""Composable relational operators (SURVEY.md §2.2–2.6).

Each function is a pure ``DataFrame -> DataFrame`` transformation built
from Catalyst-native expressions, so predicate pushdown, column
pruning, and whole-stage codegen apply end-to-end.
"""
