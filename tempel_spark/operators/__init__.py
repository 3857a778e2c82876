"""Relational + ER operators (SURVEY.md §2) as DataFrame → DataFrame
library functions. Each module cites the reference behavior it
re-expresses; none of them port reference code."""
