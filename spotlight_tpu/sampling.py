"""Alias module mirroring the reference's ``spotlight.sampling`` import path."""

from spotlight_tpu.ops.sampling import (  # noqa: F401
    sample_items,
    sample_items_device,
)
