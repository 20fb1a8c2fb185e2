"""Amazon co-purchasing dataset fetcher.

Equivalent of `/root/reference/spotlight/datasets/amazon.py:35,43,56`: the SNAP
co-purchase set (~8M ratings over 550K products) with minimum-count filtering
and contiguous id remapping.  The remapping here is vectorized with
``np.searchsorted`` instead of the reference's per-element Python dict loop.
"""

from __future__ import annotations

import numpy as np

from spotlight_tpu.data.interactions import Interactions
from spotlight_tpu.data.transport import fetch_hdf5_columns

_URL = ('https://github.com/maciejkula/recommender_datasets/'
        'releases/download/0.1.0/amazon_co_purchasing.hdf5')
_COLUMNS = ('/user_id', '/item_id', '/rating', '/timestamp',
            '/features_item_id', '/features_feature_id')


def _download_amazon():
    return fetch_hdf5_columns(_URL, 'amazon', 'amazon_co_purchasing.hdf5',
                              _COLUMNS)


def _filter_by_count(elements, min_count):
    unique_elements, element_counts = np.unique(elements, return_counts=True)
    return unique_elements[element_counts >= min_count]


def get_amazon_dataset(min_user_interactions=10, min_item_interactions=10):
    """Download (or read from cache) the Amazon co-purchasing dataset.

    Users and items with fewer than the requested number of interactions are
    dropped (filters applied independently), and the surviving ids are
    remapped to a contiguous range starting at 1 (id 0 stays free for
    sequence padding).

    Returns
    -------
    :class:`~spotlight_tpu.data.interactions.Interactions`
    """
    (user_ids, item_ids, ratings,
     timestamps, _feature_item_ids, _feature_ids) = _download_amazon()

    retain_user_ids = _filter_by_count(user_ids, min_user_interactions)
    retain_item_ids = _filter_by_count(item_ids, min_item_interactions)

    retain = np.logical_and(np.isin(user_ids, retain_user_ids),
                            np.isin(item_ids, retain_item_ids))

    user_ids = user_ids[retain]
    item_ids = item_ids[retain]
    ratings = ratings[retain]
    timestamps = timestamps[retain]

    # Contiguous remap to 1..len(retained): retained id arrays are sorted
    # (np.unique output), so searchsorted gives each element's new id - 1.
    user_ids = (np.searchsorted(retain_user_ids, user_ids) + 1).astype(
        user_ids.dtype)
    item_ids = (np.searchsorted(retain_item_ids, item_ids) + 1).astype(
        item_ids.dtype)

    return Interactions(user_ids,
                        item_ids,
                        ratings=ratings,
                        timestamps=timestamps,
                        num_users=len(retain_user_ids) + 1,
                        num_items=len(retain_item_ids) + 1)
