"""Alias for :mod:`spotlight_tpu.data.goodbooks`."""

from spotlight_tpu.data.goodbooks import get_goodbooks_dataset  # noqa: F401
