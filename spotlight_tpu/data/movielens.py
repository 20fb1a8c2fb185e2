"""MovieLens dataset fetchers (100K/1M/10M/20M).

Equivalent of `/root/reference/spotlight/datasets/movielens.py:17,46`: fetches
the HDF5-packaged MovieLens variants and returns an
:class:`~spotlight_tpu.data.interactions.Interactions` instance.
"""

from __future__ import annotations

import os

import h5py

from spotlight_tpu.data import transport
from spotlight_tpu.data.interactions import Interactions

VARIANTS = ('100K', '1M', '10M', '20M')

URL_PREFIX = ('https://github.com/maciejkula/recommender_datasets/'
              'releases/download')
VERSION = 'v0.2.0'


def _get_movielens(dataset):
    extension = '.hdf5'
    path = transport.get_data(
        '/'.join((URL_PREFIX, VERSION, dataset + extension)),
        os.path.join('movielens', VERSION),
        'movielens_{}{}'.format(dataset, extension))

    with h5py.File(path, 'r') as data:
        return (data['/user_id'][:],
                data['/item_id'][:],
                data['/rating'][:],
                data['/timestamp'][:])


def get_movielens_dataset(variant='100K'):
    """Download (or read from cache) one of the MovieLens datasets.

    Parameters
    ----------
    variant : str, one of ('100K', '1M', '10M', '20M')

    Returns
    -------
    :class:`~spotlight_tpu.data.interactions.Interactions`
    """
    if variant not in VARIANTS:
        raise ValueError('Variant must be one of {}, '
                         'got {}.'.format(VARIANTS, variant))

    url = 'movielens_{}'.format(variant)
    return Interactions(*_get_movielens(url))
