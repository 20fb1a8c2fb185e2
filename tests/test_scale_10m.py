"""At-scale data-pipeline validation: the "10M config" (SURVEY §7 step 7).

Round-3 VERDICT item 8: prove there is no hidden O(n * users) host step
in the preprocessing path and no memory cliff in the sharded engine at
ML-10M-class sizes.  Slow-marked (deselected by default; run with
``pytest -m slow``); measured wall-clocks are recorded in
docs/performance.md "The 10M config".

The >=200K-item-catalog streaming evaluation on the real chip lives in
``scripts/bench_suite.py`` (``large_catalog_eval``), whose artifact is
committed per round.
"""

import time

import jax
import numpy as np
import pytest

from spotlight_tpu.data import Interactions

pytestmark = pytest.mark.slow


def _ten_million():
    rs = np.random.RandomState(0)
    n = 10_000_000
    num_users, num_items = 500_000, 200_001  # id 0 reserved as PAD
    users = rs.randint(0, num_users, n).astype(np.int64)
    items = rs.randint(1, num_items, n).astype(np.int64)
    timestamps = rs.randint(0, 1 << 30, n).astype(np.int64)
    return Interactions(users, items, timestamps=timestamps,
                        num_users=num_users, num_items=num_items)


def test_ten_million_row_pipeline_and_sharded_training():
    interactions = _ten_million()

    # Vectorized to_sequence at 10M rows: the reference's per-user Python
    # window loop (`/root/reference/spotlight/interactions.py:250-257`)
    # would take tens of minutes here; the lexsort+segment-offset path
    # must stay well under two minutes on 2 host CPUs.
    start = time.perf_counter()
    sequences = interactions.to_sequence(max_sequence_length=20,
                                         min_sequence_length=2)
    to_sequence_s = time.perf_counter() - start
    assert sequences.sequences.shape[1] == 20
    assert len(sequences.sequences) > 400_000
    # Every row ends with a real item (the to_sequence contract).
    assert (sequences.sequences[:, -1] > 0).all()
    assert to_sequence_s < 120, to_sequence_s

    if len(jax.devices()) < 8:
        pytest.skip('sharded training needs 8 (virtual) devices')

    from spotlight_tpu.factorization import ImplicitFactorizationModel
    from spotlight_tpu.parallel import make_mesh

    # A few full-scale sharded steps: 700K-row tables sharded over the
    # model axis, 2M interactions in 8 quarter-million-row batches, the
    # composed lazy engine (the regime it exists for).
    subset = Interactions(interactions.user_ids[:2_097_152],
                          interactions.item_ids[:2_097_152],
                          num_users=interactions.num_users,
                          num_items=interactions.num_items)
    model = ImplicitFactorizationModel(
        loss='bpr', embedding_dim=32, n_iter=1, batch_size=262_144,
        sparse=True, mesh=make_mesh(data=2, model=4),
        random_state=np.random.RandomState(42))
    start = time.perf_counter()
    model.fit(subset)
    train_s = time.perf_counter() - start
    assert model._lazy
    assert np.isfinite(model._last_epoch_loss)
    assert model._last_epoch_loss > 0

    # Full-catalog predict at 200K items still works at this scale.
    scores = model.predict(0)
    assert scores.shape == (interactions.num_items,)
    assert np.isfinite(scores).all()
    print('to_sequence(10M rows): {:.1f}s; 8 sharded lazy steps '
          '(2M rows, 700K-row tables): {:.1f}s'.format(to_sequence_s,
                                                       train_s))
