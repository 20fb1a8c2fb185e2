"""Deterministic MovieLens-100K-scale fixture dataset.

This environment has no network egress, so the reference's real-data CI
gates (`/root/reference/tests/factorization/test_implicit.py:25-57` trains
on the actual MovieLens-100K download) cannot run against the published
file.  This module generates a *stand-in at the same scale and with the
same structure* — 943 users, 1682 items, exactly 100,000 ratings on a
1-5 integer scale, every user with >= 20 ratings — and installs it through
the standard dataset cache, so ``get_movielens_dataset('100K')`` exercises
the full transport + HDF5 + ``Interactions`` path end-to-end.

The generator mimics the statistics that make the real dataset learnable:

- **Item popularity** follows a Zipf-like long tail (the real 100K's top
  item has ~583 ratings; the tail has 1), correlated with item quality.
- **User activity** is log-normal, clipped to the real dataset's [20, 737]
  range and renormalized to sum to exactly 100,000.
- **Ratings** come from a low-rank user x item affinity plus user/item
  biases around the real global mean (3.53), with observation noise chosen
  so a well-fit factorization lands near the published test RMSE (~0.95,
  `examples/movielens_explicit/readme.md`).
- **Which items a user rates** is biased toward that user's high-affinity
  items (Gumbel-top-k over log-popularity + affinity), so implicit ranking
  models have signal beyond popularity — as in the real data.

When a real dataset cache is provisioned, the cache-gated tests in
``tests/test_datasets.py`` take over; nothing here overwrites an existing
cache file.
"""

from __future__ import annotations

import os

import numpy as np

NUM_USERS = 943
NUM_ITEMS = 1682
NUM_RATINGS = 100_000
GLOBAL_MEAN = 3.53
LATENT_DIM = 8

FIXTURE_SEED = 20260818


def generate_movielens_100k_like(seed=FIXTURE_SEED):
    """Generate the fixture columns.

    Returns
    -------
    dict with keys 'user_id', 'item_id', 'rating', 'timestamp'
        int32/float32 arrays of length ``NUM_RATINGS``.  Ids are 0-based
        (the packaged real file is 0-based too; the reference adds +1 for
        num_users/num_items headroom inside ``Interactions``).
    """
    rs = np.random.RandomState(seed)

    # Latent structure: low-rank affinity + biases.
    user_factors = rs.normal(0, 1.0 / np.sqrt(LATENT_DIM),
                             (NUM_USERS, LATENT_DIM))
    item_factors = rs.normal(0, 1.0 / np.sqrt(LATENT_DIM),
                             (NUM_ITEMS, LATENT_DIM))
    user_bias = rs.normal(0, 0.35, NUM_USERS)
    item_bias = rs.normal(0, 0.45, NUM_ITEMS)
    affinity = user_factors @ item_factors.T  # (U, I)

    # Item popularity: Zipf-ish tail, tilted toward well-liked items.
    ranks = np.arange(1, NUM_ITEMS + 1, dtype=np.float64)
    zipf = 1.0 / ranks ** 0.9
    rs.shuffle(zipf)
    log_pop = np.log(zipf) + 0.8 * item_bias

    # Per-user rating counts: log-normal in [20, 737], total exactly 100K.
    counts = np.exp(rs.normal(4.2, 0.75, NUM_USERS))
    counts = np.clip(counts, 20, 737)
    counts = np.floor(counts * (NUM_RATINGS / counts.sum())).astype(np.int64)
    counts = np.clip(counts, 20, NUM_ITEMS - 1)
    deficit = NUM_RATINGS - counts.sum()
    # Distribute the rounding deficit over users with headroom.
    order = rs.permutation(NUM_USERS)
    for u in np.tile(order, 10):
        if deficit == 0:
            break
        step = 1 if deficit > 0 else -1
        new = counts[u] + step
        if 20 <= new <= NUM_ITEMS - 1:
            counts[u] = new
            deficit -= step
    assert counts.sum() == NUM_RATINGS, counts.sum()

    users = np.repeat(np.arange(NUM_USERS, dtype=np.int32), counts)
    items = np.empty(NUM_RATINGS, dtype=np.int32)
    timestamps = np.empty(NUM_RATINGS, dtype=np.int32)

    base_time = 874_000_000  # the real dataset's epoch-seconds era
    offset = 0
    for u in range(NUM_USERS):
        n_u = counts[u]
        # Distinct items via Gumbel-top-k over popularity + affinity.
        gumbel = rs.gumbel(size=NUM_ITEMS)
        scores = log_pop + 1.2 * affinity[u] + gumbel
        chosen = np.argpartition(-scores, n_u)[:n_u].astype(np.int32)
        items[offset:offset + n_u] = chosen
        start = base_time + rs.randint(0, 20_000_000)
        timestamps[offset:offset + n_u] = (
            start + np.sort(rs.randint(0, 5_000_000, n_u)))
        offset += n_u

    noise = rs.normal(0, 0.8, NUM_RATINGS)
    raw = (GLOBAL_MEAN + user_bias[users] + item_bias[items]
           + affinity[users, items] + noise)
    ratings = np.clip(np.rint(raw), 1, 5).astype(np.float32)

    return {
        'user_id': users,
        'item_id': items,
        'rating': ratings,
        'timestamp': timestamps,
    }


def install_movielens_100k_fixture(data_directory=None, seed=FIXTURE_SEED):
    """Write the fixture as the cached MovieLens-100K HDF5 file.

    Uses the exact cache layout ``get_movielens_dataset`` resolves
    (`spotlight_tpu/data/movielens.py:38-43`, including the reference's
    double-prefix filename quirk), so the loader runs its real code path.
    Existing cache files are never overwritten.

    Returns the file path.
    """
    import h5py

    from spotlight_tpu.data import transport

    directory = os.path.join(
        os.path.abspath(data_directory or transport.data_dir()),
        'movielens', 'v0.2.0')
    transport.create_data_dir(directory)
    path = os.path.join(directory, 'movielens_movielens_100K.hdf5')
    if os.path.isfile(path):
        return path

    columns = generate_movielens_100k_like(seed)
    tmp_path = path + '.tmp'
    with h5py.File(tmp_path, 'w') as f:
        f['/user_id'] = columns['user_id']
        f['/item_id'] = columns['item_id']
        f['/rating'] = columns['rating']
        f['/timestamp'] = columns['timestamp']
        # Mark the file so gate tests can distinguish the stand-in from a
        # provisioned real dataset (and never mistake one for the other).
        f.attrs['synthetic_fixture'] = True
        f.attrs['generator_seed'] = seed
    os.replace(tmp_path, path)
    return path


ML1M_NUM_USERS = 6040
ML1M_NUM_ITEMS = 3706          # distinct rated movies in the real ML-1M
ML1M_NUM_RATINGS = 1_000_209
ML1M_RANK = 24                 # latent rank of the transition structure
ML1M_BETA = 10.0               # sequential-signal strength (softmax scale)
ML1M_POP_WEIGHT = 0.5          # popularity weight inside the softmax
ML1M_POP_EXPONENT = 0.85       # Zipf exponent of the popularity tail
ML1M_SEED = FIXTURE_SEED + 1


def generate_movielens_1m_like(seed=ML1M_SEED):
    """Generate ML-1M-scale columns with *sequential* structure.

    The reference's flagship results are the ML-1M sequence-model sweeps
    (`/root/reference/examples/movielens_sequence/readme.rst`: best LSTM
    test MRR 0.0763-0.0808, best CNN 0.0795, pooling ~0.013-0.016).  Those
    rest on next-item structure in the real watch histories, so — unlike
    the 100K fixture above, which targets factorization RMSE/MRR — this
    stand-in is a Markov chain over items whose transition matrix is
    **low-rank**: ``p(j | i) = softmax_j(beta * z_i . w_j +
    pop_weight * log pop_j)`` with rank-24 latents and a Zipf popularity
    tail.  (A symmetric-Dirichlet transition matrix — the reference's
    synthetic-fixture family, `datasets/synthetic.py:12-34` — is full-rank
    random at 3706 items and *cannot* be represented by any
    embedding-factorized model, measured test MRR < 0.01; low-rank
    structure is what makes real watch histories learnable at dim <= 256.)

    Calibration (``scripts/`` history, beta=10, pop_weight=0.5): an oracle
    that knows the transition matrix achieves single-step MRR ~0.134;
    ranking by popularity alone achieves ~0.0145 — so trained LSTM/CNN
    models land in the published band while pooling (whose only signal
    here is popularity) lands in the published pooling band, reproducing
    the ordering and magnitudes of the reference's tables.  Scale matches
    the real dataset: 6040 users x 3706 items x 1,000,209 ratings,
    per-user counts in [20, 2314] (mean ~166).

    Returns
    -------
    dict with keys 'user_id', 'item_id', 'rating', 'timestamp'
    """
    from spotlight_tpu.data.synthetic import _generate_sequences

    rs = np.random.RandomState(seed)

    # Low-rank transition structure + popularity tail.  float32 throughout:
    # the (3706, 3706) softmax/cumsum pipeline is memory-bound on the CI
    # host, and the walk only needs CDF-grade precision.
    context = rs.normal(0, 1, (ML1M_NUM_ITEMS, ML1M_RANK))
    target = rs.normal(0, 1, (ML1M_NUM_ITEMS, ML1M_RANK))
    context = (context / np.sqrt(ML1M_RANK)).astype(np.float32)
    target = (target / np.sqrt(ML1M_RANK)).astype(np.float32)
    zipf = 1.0 / np.arange(1, ML1M_NUM_ITEMS + 1) ** ML1M_POP_EXPONENT
    rs.shuffle(zipf)
    log_pop = np.log(zipf / zipf.sum()).astype(np.float32)

    logits = np.float32(ML1M_BETA) * (context @ target.T)
    logits += np.float32(ML1M_POP_WEIGHT) * log_pop[None, :]
    logits -= logits.max(axis=1, keepdims=True)
    transition_matrix = np.exp(logits)
    transition_matrix /= transition_matrix.sum(axis=1, keepdims=True)

    # Per-user activity: log-normal, clipped to the real [20, 2314] range,
    # renormalized to sum to exactly 1,000,209.
    counts = np.exp(rs.normal(4.75, 0.85, ML1M_NUM_USERS))
    counts = np.clip(counts, 20, 2314)
    counts = np.floor(
        counts * (ML1M_NUM_RATINGS / counts.sum())).astype(np.int64)
    counts = np.clip(counts, 20, 2314)
    deficit = ML1M_NUM_RATINGS - counts.sum()
    order = rs.permutation(ML1M_NUM_USERS)
    for u in np.tile(order, 20):
        if deficit == 0:
            break
        step = 1 if deficit > 0 else -1
        new = counts[u] + step
        if 20 <= new <= 2314:
            counts[u] = new
            deficit -= step
    assert counts.sum() == ML1M_NUM_RATINGS, counts.sum()

    users = np.repeat(np.arange(ML1M_NUM_USERS, dtype=np.int32), counts)
    # One global order-1 walk segmented per user (the reference synthetic
    # generator's design, `datasets/synthetic.py:119-126`); +1 keeps id 0
    # free for sequence padding, as in the packaged real file.
    items = (_generate_sequences(ML1M_NUM_RATINGS, transition_matrix,
                                 1, rs) + 1).astype(np.int32)
    base_time = 956_700_000  # the real dataset's epoch-seconds era
    timestamps = base_time + np.arange(ML1M_NUM_RATINGS, dtype=np.int64)
    ratings = np.clip(np.rint(rs.normal(3.58, 0.95, ML1M_NUM_RATINGS)),
                      1, 5).astype(np.float32)

    return {
        'user_id': users,
        'item_id': items,
        'rating': ratings,
        'timestamp': timestamps.astype(np.int64),
    }


def install_movielens_1m_fixture(data_directory=None, seed=ML1M_SEED,
                                 columns=None):
    """Write the ML-1M-scale fixture as the cached '1M' HDF5 file.

    Same cache layout contract as :func:`install_movielens_100k_fixture`;
    the reference implementation resolves the identical path
    (`/root/reference/spotlight/datasets/_transport.py:28-32`), so one
    installed file feeds both stacks for head-to-head runs.  Existing
    cache files are never overwritten.  Pass pre-generated ``columns`` to
    skip regeneration (tests share one generation).
    """
    import h5py

    from spotlight_tpu.data import transport

    directory = os.path.join(
        os.path.abspath(data_directory or transport.data_dir()),
        'movielens', 'v0.2.0')
    transport.create_data_dir(directory)
    path = os.path.join(directory, 'movielens_movielens_1M.hdf5')
    if os.path.isfile(path):
        return path

    if columns is None:
        columns = generate_movielens_1m_like(seed)
    tmp_path = path + '.tmp'
    with h5py.File(tmp_path, 'w') as f:
        f['/user_id'] = columns['user_id']
        f['/item_id'] = columns['item_id']
        f['/rating'] = columns['rating']
        f['/timestamp'] = columns['timestamp']
        f.attrs['synthetic_fixture'] = True
        f.attrs['generator_seed'] = seed
    os.replace(tmp_path, path)
    return path


AMAZON_NUM_USERS = 4000        # fixture scale (real set: ~1.6M users)
AMAZON_NUM_ITEMS = 6000        # real set: ~550K products
AMAZON_NUM_RATINGS = 80_000    # real set: ~8M ratings
AMAZON_SEED = FIXTURE_SEED + 2

GOODBOOKS_NUM_USERS = 1500     # real set: 53,424 users
GOODBOOKS_NUM_BOOKS = 800      # real set: 10,000 books
GOODBOOKS_NUM_RATINGS = 60_000  # real set: ~6M ratings
GOODBOOKS_SEED = FIXTURE_SEED + 3


def generate_amazon_like(seed=AMAZON_SEED):
    """Generate Amazon-co-purchase-scale columns (miniature).

    The real SNAP set (`/root/reference/spotlight/datasets/amazon.py:56`)
    is *sparse*: most users and products have very few ratings, which is
    exactly why ``get_amazon_dataset`` exposes min-count filters.  The
    stand-in reproduces the properties those filters and the contiguous
    remap depend on:

    - **Non-contiguous, unsorted raw ids** drawn from a ~10x larger id
      space (SNAP ids are arbitrary), so the searchsorted remap is
      actually exercised.
    - **Long-tail activity**: user counts ~ log-normal and item counts
      ~ Zipf, calibrated so a meaningful fraction of each falls below the
      default ``min_*_interactions=10`` cutoffs.
    - The auxiliary ``features_*`` columns the real file carries (read and
      discarded by the loader).

    Returns
    -------
    dict with keys 'user_id', 'item_id', 'rating', 'timestamp',
    'features_item_id', 'features_feature_id'
    """
    rs = np.random.RandomState(seed)

    raw_user_ids = np.sort(rs.choice(
        np.arange(1, AMAZON_NUM_USERS * 10, dtype=np.int32),
        AMAZON_NUM_USERS, replace=False))
    raw_item_ids = np.sort(rs.choice(
        np.arange(1, AMAZON_NUM_ITEMS * 10, dtype=np.int32),
        AMAZON_NUM_ITEMS, replace=False))

    # Long-tail sampling weights; with 80K ratings over 4K users / 6K
    # items these land ~25-35% of users and ~40-50% of items under 10
    # interactions (the filters must have real work to do).
    user_w = rs.lognormal(0.0, 1.2, AMAZON_NUM_USERS)
    item_w = 1.0 / np.arange(1, AMAZON_NUM_ITEMS + 1) ** 1.05
    rs.shuffle(item_w)

    users = rs.choice(AMAZON_NUM_USERS, AMAZON_NUM_RATINGS,
                      p=user_w / user_w.sum())
    items = rs.choice(AMAZON_NUM_ITEMS, AMAZON_NUM_RATINGS,
                      p=item_w / item_w.sum())

    ratings = np.clip(np.rint(rs.normal(4.2, 1.0, AMAZON_NUM_RATINGS)),
                      1, 5).astype(np.float32)
    timestamps = np.sort(
        rs.randint(1_000_000_000, 1_100_000_000,
                   AMAZON_NUM_RATINGS)).astype(np.int64)

    n_features = 5000
    return {
        'user_id': raw_user_ids[users],
        'item_id': raw_item_ids[items],
        'rating': ratings,
        'timestamp': timestamps,
        'features_item_id': rs.choice(raw_item_ids,
                                      n_features).astype(np.int32),
        'features_feature_id': rs.randint(
            0, 1000, n_features).astype(np.int32),
    }


def install_amazon_fixture(data_directory=None, seed=AMAZON_SEED):
    """Write the fixture as the cached Amazon co-purchasing HDF5 file.

    Resolves the exact cache path ``get_amazon_dataset`` reads
    (`spotlight_tpu/data/amazon.py:22-24`: ``<cache>/amazon/
    amazon_co_purchasing.hdf5``) so the loader's full transport + HDF5 +
    filter + remap path executes.  Existing cache files are never
    overwritten.
    """
    import h5py

    from spotlight_tpu.data import transport

    directory = os.path.join(
        os.path.abspath(data_directory or transport.data_dir()), 'amazon')
    transport.create_data_dir(directory)
    path = os.path.join(directory, 'amazon_co_purchasing.hdf5')
    if os.path.isfile(path):
        return path

    columns = generate_amazon_like(seed)
    tmp_path = path + '.tmp'
    with h5py.File(tmp_path, 'w') as f:
        for name, values in columns.items():
            f['/' + name] = values
        f.attrs['synthetic_fixture'] = True
        f.attrs['generator_seed'] = seed
    os.replace(tmp_path, path)
    return path


def generate_goodbooks_like(seed=GOODBOOKS_SEED):
    """Generate a goodbooks-10k-scale ratings matrix (miniature).

    The real file (`/root/reference/spotlight/datasets/goodbooks.py:20-28`)
    stores one ``(n, 3)`` integer matrix of (user_id, book_id, rating)
    rows with ids starting at 1 and no timestamps.  Ratings skew positive
    (goodreads 5-star reviews).
    """
    rs = np.random.RandomState(seed)

    user_w = rs.lognormal(0.0, 0.8, GOODBOOKS_NUM_USERS)
    book_w = 1.0 / np.arange(1, GOODBOOKS_NUM_BOOKS + 1) ** 0.9
    rs.shuffle(book_w)

    users = rs.choice(GOODBOOKS_NUM_USERS, GOODBOOKS_NUM_RATINGS,
                      p=user_w / user_w.sum()) + 1
    books = rs.choice(GOODBOOKS_NUM_BOOKS, GOODBOOKS_NUM_RATINGS,
                      p=book_w / book_w.sum()) + 1
    ratings = np.clip(np.rint(rs.normal(3.9, 1.0, GOODBOOKS_NUM_RATINGS)),
                      1, 5)

    return np.stack([users, books, ratings], axis=1).astype(np.int32)


def install_goodbooks_fixture(data_directory=None, seed=GOODBOOKS_SEED):
    """Write the fixture as the cached goodbooks-10k HDF5 file.

    Cache path per ``get_goodbooks_dataset``
    (`spotlight_tpu/data/goodbooks.py:27-28`: ``<cache>/goodbooks/
    goodbooks.hdf5``).  Existing cache files are never overwritten.
    """
    import h5py

    from spotlight_tpu.data import transport

    directory = os.path.join(
        os.path.abspath(data_directory or transport.data_dir()),
        'goodbooks')
    transport.create_data_dir(directory)
    path = os.path.join(directory, 'goodbooks.hdf5')
    if os.path.isfile(path):
        return path

    tmp_path = path + '.tmp'
    with h5py.File(tmp_path, 'w') as f:
        f['ratings'] = generate_goodbooks_like(seed)
        f.attrs['synthetic_fixture'] = True
        f.attrs['generator_seed'] = seed
    os.replace(tmp_path, path)
    return path


def is_synthetic_fixture(path):
    """True when ``path`` is a fixture written by this module."""
    import h5py

    with h5py.File(path, 'r') as f:
        return bool(f.attrs.get('synthetic_fixture', False))
