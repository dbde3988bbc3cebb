"""Pure, batchable scalar/string/set functions (SURVEY.md §2.8)."""
