from .io import TABLES, load  # noqa: F401
