from .registry import REGISTRY, QuerySpec, load_all, query  # noqa: F401
