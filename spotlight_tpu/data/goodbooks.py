"""Goodbooks-10K dataset fetcher.

Equivalent of `/root/reference/spotlight/datasets/goodbooks.py:32`.
"""

from __future__ import annotations

import h5py
import numpy as np

from spotlight_tpu.data import transport
from spotlight_tpu.data.interactions import Interactions


def _get_dataset():
    path = transport.get_data(
        'https://github.com/zygmuntz/goodbooks-10k/'
        'releases/download/v1.0/goodbooks-10k.hdf5',
        'goodbooks',
        'goodbooks.hdf5')

    with h5py.File(path, 'r') as data:
        return (data['ratings'][:, 0],
                data['ratings'][:, 1],
                data['ratings'][:, 2].astype(np.float32),
                np.arange(len(data['ratings']), dtype=np.int32))


def get_goodbooks_dataset():
    """Download (or read from cache) the goodbooks-10k dataset.

    Returns
    -------
    :class:`~spotlight_tpu.data.interactions.Interactions`
    """
    return Interactions(*_get_dataset())
