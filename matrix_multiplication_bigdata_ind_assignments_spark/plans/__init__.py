from .strategy import choose_multiply_strategy  # noqa: F401
