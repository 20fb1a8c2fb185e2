"""Alias for :mod:`spotlight_tpu.data.movielens`."""

from spotlight_tpu.data.movielens import (  # noqa: F401
    VARIANTS,
    get_movielens_dataset,
)
