"""Composite operators the reference/Spark lack as single primitives:
as-of join, sessionization, dedup families, similarity search. Each is a
pure DataFrame composition (shuffle-conscious) — no custom Catalyst rules
needed (SURVEY §4.4)."""
