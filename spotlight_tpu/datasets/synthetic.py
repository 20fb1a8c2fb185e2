"""Alias for :mod:`spotlight_tpu.data.synthetic`."""

from spotlight_tpu.data.synthetic import (  # noqa: F401
    generate_factorization,
    generate_sequential,
)
