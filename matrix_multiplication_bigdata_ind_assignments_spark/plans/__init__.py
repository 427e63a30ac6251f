from .strategy import choose_block_size, choose_multiply_strategy  # noqa: F401
