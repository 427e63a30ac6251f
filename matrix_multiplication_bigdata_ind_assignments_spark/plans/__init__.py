from .strategy import (  # noqa: F401
    choose_block_size,
    choose_join_salting,
    choose_multiply_strategy,
)
