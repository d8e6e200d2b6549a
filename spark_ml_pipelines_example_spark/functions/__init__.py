"""Column-expression builders shared by operators and declared queries.
Everything here returns Catalyst Column expressions (codegen-friendly,
JVM-side) — no UDFs."""

from .similarity import cosine, dot, l2_norm  # noqa: F401
from .text import bigrams, tokens  # noqa: F401
