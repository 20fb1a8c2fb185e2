"""Dataset fetcher tests (network-dependent parts skip when offline,
mirroring the reference's download smoke tests)."""

import os

import numpy as np
import pytest

from spotlight_tpu.data import transport


def _cached(subdir, filename):
    return os.path.isfile(
        os.path.join(transport.data_dir(), subdir, filename))


@pytest.mark.skipif(
    not _cached('movielens/v0.2.0', 'movielens_movielens_100K.hdf5'),
    reason='MovieLens cache not present (no network in CI)')
def test_movielens_100k():
    from spotlight_tpu.data.movielens import get_movielens_dataset

    interactions = get_movielens_dataset('100K')
    assert len(interactions) == 100000
    assert interactions.ratings is not None
    assert interactions.timestamps is not None


def test_movielens_rejects_unknown_variant():
    from spotlight_tpu.data.movielens import get_movielens_dataset

    with pytest.raises(ValueError, match='Variant must be one of'):
        get_movielens_dataset('17M')


def test_transport_cache_miss_raises(tmp_path, monkeypatch):
    monkeypatch.setenv('SPOTLIGHT_DATA_DIR', str(tmp_path))
    with pytest.raises(IOError):
        transport.get_data('http://unused', 'sub', 'missing.hdf5',
                           download_if_missing=False)


def test_amazon_contiguous_remap_helpers():
    """The vectorized remap matches the reference's dict-based remap
    semantics (`/root/reference/spotlight/datasets/amazon.py:43-52`)."""
    from spotlight_tpu.data.amazon import _filter_by_count

    elements = np.array([5, 5, 9, 9, 9, 2, 7, 7])
    retained = _filter_by_count(elements, 2)
    np.testing.assert_array_equal(retained, [5, 7, 9])

    # searchsorted remap: sorted retained ids -> 1..len (0 kept for padding)
    remapped = np.searchsorted(retained, np.array([5, 9, 7])) + 1
    np.testing.assert_array_equal(remapped, [1, 3, 2])


def test_synthetic_properties(random_state):
    from spotlight_tpu.data.synthetic import generate_sequential

    interactions = generate_sequential(
        num_users=50, num_items=100, num_interactions=2000,
        concentration_parameter=0.05, random_state=random_state)
    assert interactions.num_users == 50
    assert interactions.num_items == 100
    assert len(interactions) == 2000
    # Item 0 reserved for padding.
    assert interactions.item_ids.min() >= 1
    assert interactions.item_ids.max() < 100
    # Timestamps strictly increasing (arange).
    assert np.all(np.diff(interactions.timestamps) > 0)
