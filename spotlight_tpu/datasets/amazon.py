"""Alias for :mod:`spotlight_tpu.data.amazon`."""

from spotlight_tpu.data.amazon import get_amazon_dataset  # noqa: F401
