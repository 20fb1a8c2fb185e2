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


def test_amazon_end_to_end(tmp_path, monkeypatch):
    """``get_amazon_dataset`` runs its full transport + HDF5 + filter +
    remap path against a cache-installed fixture, and the result matches
    an independent oracle of the reference's semantics
    (`/root/reference/spotlight/datasets/amazon.py:28-97`: independent
    min-count filters, contiguous remap to ids starting at 1)."""
    import collections

    import h5py

    from spotlight_tpu.data import fixtures
    from spotlight_tpu.data.amazon import get_amazon_dataset

    monkeypatch.setenv('SPOTLIGHT_DATA_DIR', str(tmp_path))
    path = fixtures.install_amazon_fixture()

    with h5py.File(path, 'r') as f:
        raw_users = f['/user_id'][:]
        raw_items = f['/item_id'][:]
        raw_ratings = f['/rating'][:]

    interactions = get_amazon_dataset(min_user_interactions=10,
                                      min_item_interactions=10)

    # Oracle: reference semantics via Counter (a different code path than
    # the loader's np.unique/searchsorted).
    user_counts = collections.Counter(raw_users.tolist())
    item_counts = collections.Counter(raw_items.tolist())
    keep_users = sorted(u for u, c in user_counts.items() if c >= 10)
    keep_items = sorted(i for i, c in item_counts.items() if c >= 10)
    user_map = {u: idx + 1 for idx, u in enumerate(keep_users)}
    item_map = {i: idx + 1 for idx, i in enumerate(keep_items)}
    mask = np.array([u in user_map and i in item_map
                     for u, i in zip(raw_users, raw_items)])

    assert mask.sum() > 0
    # The fixture's long tail must give the filters real work.
    assert mask.sum() < len(raw_users)
    assert len(interactions) == mask.sum()
    np.testing.assert_array_equal(
        interactions.user_ids,
        np.array([user_map[u] for u in raw_users[mask]]))
    np.testing.assert_array_equal(
        interactions.item_ids,
        np.array([item_map[i] for i in raw_items[mask]]))
    np.testing.assert_array_equal(interactions.ratings, raw_ratings[mask])
    assert interactions.num_users == len(keep_users) + 1
    assert interactions.num_items == len(keep_items) + 1
    # Timestamps survive filtering in order.
    assert np.all(np.diff(interactions.timestamps) >= 0)


def test_goodbooks_end_to_end(tmp_path, monkeypatch):
    """``get_goodbooks_dataset`` reads the single ratings matrix and maps
    it to Interactions columns (reference semantics:
    `/root/reference/spotlight/datasets/goodbooks.py:20-28`)."""
    import h5py

    from spotlight_tpu.data import fixtures
    from spotlight_tpu.data.goodbooks import get_goodbooks_dataset

    monkeypatch.setenv('SPOTLIGHT_DATA_DIR', str(tmp_path))
    path = fixtures.install_goodbooks_fixture()

    with h5py.File(path, 'r') as f:
        matrix = f['ratings'][:]

    interactions = get_goodbooks_dataset()

    assert len(interactions) == len(matrix)
    np.testing.assert_array_equal(interactions.user_ids, matrix[:, 0])
    np.testing.assert_array_equal(interactions.item_ids, matrix[:, 1])
    np.testing.assert_array_equal(interactions.ratings,
                                  matrix[:, 2].astype(np.float32))
    assert interactions.ratings.dtype == np.float32
    # Interaction order stands in for timestamps.
    np.testing.assert_array_equal(interactions.timestamps,
                                  np.arange(len(matrix)))
    # Ids start at 1 (0 free for sequence padding).
    assert interactions.user_ids.min() >= 1
    assert interactions.item_ids.min() >= 1
    # Fixture-installed files are marked so they are never mistaken for
    # real provisioned data.
    assert fixtures.is_synthetic_fixture(path)


def test_goodbooks_sequence_pipeline(tmp_path, monkeypatch):
    """The goodbooks loader output feeds ``to_sequence`` (the reference's
    main use of this dataset is sequence experiments)."""
    from spotlight_tpu.data import fixtures
    from spotlight_tpu.data.goodbooks import get_goodbooks_dataset

    monkeypatch.setenv('SPOTLIGHT_DATA_DIR', str(tmp_path))
    fixtures.install_goodbooks_fixture()

    sequences = get_goodbooks_dataset().to_sequence(
        max_sequence_length=20, min_sequence_length=5)
    assert sequences.sequences.shape[1] == 20
    assert len(sequences.sequences) > 0


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
