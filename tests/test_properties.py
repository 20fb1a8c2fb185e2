"""Property-based tests (hypothesis) for the subtlest parity surfaces:
sequence windowing, hashing, and rank math."""

import numpy as np
import scipy.stats as st
from hypothesis import given, settings, strategies as hst

from spotlight_tpu.data import Interactions
from spotlight_tpu.ops.hashing import murmurhash3_32


@settings(max_examples=25, deadline=None)
@given(
    num_interactions=hst.integers(5, 60),
    num_users=hst.integers(1, 6),
    max_len=hst.integers(2, 12),
    step=hst.integers(1, 12),
    seed=hst.integers(0, 1000),
)
def test_to_sequence_invariants(num_interactions, num_users, max_len, step,
                                seed):
    rs = np.random.RandomState(seed)
    user_ids = np.sort(rs.randint(0, num_users, num_interactions))
    item_ids = rs.randint(1, 50, num_interactions)
    timestamps = rs.randint(0, 1000, num_interactions)

    interactions = Interactions(user_ids.astype(np.int32),
                                item_ids.astype(np.int32),
                                timestamps=timestamps.astype(np.int32),
                                num_users=num_users, num_items=50)
    seq = interactions.to_sequence(max_sequence_length=max_len,
                                   step_size=step)

    # Window count: sum over users of ceil(count / step).
    _, counts = np.unique(user_ids, return_counts=True)
    expected_rows = int(np.ceil(counts / step).sum())
    assert seq.sequences.shape == (expected_rows, max_len)

    # Last column always real; no all-padding rows.
    assert (seq.sequences[:, -1] != 0).all()
    assert (seq.sequences.sum(axis=1) > 0).all()

    # Each row's non-padding suffix appears contiguously in that user's
    # time-sorted item stream.
    order = np.lexsort((timestamps, user_ids))
    sorted_users = user_ids[order]
    sorted_items = item_ids[order]
    for row_user, row in zip(seq.user_ids, seq.sequences):
        window = row[row != 0]
        stream = sorted_items[sorted_users == row_user]
        found = any(
            np.array_equal(stream[i:i + len(window)], window)
            for i in range(len(stream) - len(window) + 1))
        assert found


@settings(max_examples=50, deadline=None)
@given(key=hst.integers(-2 ** 31, 2 ** 31 - 1),
       seed=hst.integers(0, 2 ** 31 - 1))
def test_murmurhash_parity_property(key, seed):
    from sklearn.utils import murmurhash3_32 as sk_hash

    ours = int(murmurhash3_32(np.array([key], dtype=np.int32),
                              seed=seed)[0])
    theirs = int(sk_hash(int(key), seed=seed))
    assert ours == theirs


@settings(max_examples=25, deadline=None)
@given(seed=hst.integers(0, 1000),
       num_items=hst.integers(3, 40),
       num_targets=hst.integers(1, 5),
       duplicates=hst.booleans())
def test_reciprocal_ranks_match_rankdata(seed, num_items, num_targets,
                                         duplicates):
    import jax.numpy as jnp

    from spotlight_tpu.evaluation import _reciprocal_ranks

    rs = np.random.RandomState(seed)
    scores = rs.randn(2, num_items).astype(np.float32)
    if duplicates:
        # Inject ties to exercise average-rank semantics.
        scores[:, : num_items // 2] = scores[:, 0:1]
    targets = rs.randint(0, num_items, (2, num_targets))

    ours = np.asarray(_reciprocal_ranks(
        jnp.asarray(scores), jnp.asarray(targets),
        jnp.ones_like(targets, dtype=bool)))

    for row in range(2):
        ranks = st.rankdata(-scores[row])
        expected = (1.0 / ranks[targets[row]]).mean()
        assert abs(ours[row] - expected) < 1e-5
