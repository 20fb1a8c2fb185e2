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


@settings(max_examples=8, deadline=None)
@given(
    batch=hst.integers(2, 9),
    dim=hst.sampled_from([4, 8]),
    num_items=hst.integers(20, 90),
    num_targets=hst.integers(1, 7),
    tile=hst.sampled_from([16, 32]),
    seed=hst.integers(0, 10_000),
)
def test_rank_counts_random_shapes(batch, dim, num_items, num_targets,
                                   tile, seed):
    """Streaming rank counts (interpret mode) vs a host oracle on random
    shapes — including duplicated rows, which force exact ties."""
    import jax.numpy as jnp
    from spotlight_tpu.ops.kernels.ranking import rank_counts

    rs = np.random.RandomState(seed)
    # Small-integer values: every dot product is exactly representable in
    # float32 under ANY summation order, so the oracle, the chunked
    # matched_target_scores matmul, and the kernel's tile matmul are all
    # bit-identical by construction.  (With random floats, XLA's
    # shape-dependent small-matmul lowering differs by 1 ulp between the
    # chunked and full formulations — the documented reason production
    # pairs matched_target_scores with the kernel at matching shapes, and
    # a false-failure source for a property test comparing across
    # formulations.)  Ties are also plentiful with integer scores.
    users = jnp.asarray(rs.randint(-3, 4, (batch, dim)).astype(np.float32))
    items_np = rs.randint(-3, 4, (num_items, dim)).astype(np.float32)
    items_np[1] = items_np[0]  # guaranteed tie pair
    items = jnp.asarray(items_np)
    bias_np = rs.randint(-3, 4, num_items).astype(np.float32)
    bias_np[1] = bias_np[0]
    bias = jnp.asarray(bias_np)
    tids = jnp.asarray(rs.randint(0, num_items,
                                  (batch, num_targets)).astype(np.int32))

    from spotlight_tpu.ops.kernels.ranking import matched_target_scores
    scores = np.asarray(jnp.dot(items, users.T) + bias[:, None]).T
    tscores = matched_target_scores(users, items, bias, tids)
    np.testing.assert_array_equal(
        np.asarray(tscores),
        np.take_along_axis(scores, np.asarray(tids), axis=1))

    greater, equal = rank_counts(users, items, bias, tscores, tids,
                                 tile_items=tile, interpret=True)
    for b in range(batch):
        for t in range(num_targets):
            tid = int(tids[b, t])
            ts = scores[b, tid]
            others = np.arange(num_items) != tid
            assert greater[b, t] == (scores[b, others] > ts).sum()
            assert equal[b, t] == (scores[b, others] == ts).sum()


@settings(max_examples=8, deadline=None)
@given(
    batch=hst.integers(2, 7),
    num_items=hst.integers(20, 70),
    mixtures=hst.integers(1, 4),
    num_targets=hst.integers(1, 5),
    seed=hst.integers(0, 10_000),
)
def test_mixture_candidate_scores_match_tiles(batch, num_items, mixtures,
                                              num_targets, seed):
    """matched_candidate_scores must be bit-identical to the rank kernel's
    tile scores for the same (item, user) pair under mixture scoring: a
    target's `equal` count against a duplicated row is exactly 1."""
    import jax.numpy as jnp
    from spotlight_tpu.ops.kernels.ranking import (
        make_mixture_score_fn, matched_candidate_scores, rank_counts)

    dim = 4
    rs = np.random.RandomState(seed)
    users = jnp.asarray(
        rs.randn(batch, 2 * mixtures * dim).astype(np.float32))
    items_np = rs.randn(num_items, dim).astype(np.float32)
    items_np[1] = items_np[0]
    items = jnp.asarray(items_np)
    bias_np = rs.randn(num_items).astype(np.float32)
    bias_np[1] = bias_np[0]
    bias = jnp.asarray(bias_np)

    score_fn = make_mixture_score_fn(mixtures, dim)
    # Targets include the duplicated pair plus random ids.
    tids_np = rs.randint(0, num_items, (batch, num_targets))
    tids_np[:, 0] = 0
    tids = jnp.asarray(tids_np.astype(np.int32))

    tscores = matched_candidate_scores(users, items, bias, tids, score_fn,
                                       interpret=True)
    greater, equal = rank_counts(users, items, bias, tscores, tids,
                                 tile_items=16, interpret=True,
                                 score_fn=score_fn)
    # Item 0's duplicate (item 1) ties bit-exactly: equal count >= 1.
    assert (np.asarray(equal)[:, 0] >= 1).all()
    # Sanity: greater+equal never exceeds the catalog minus the target.
    total = np.asarray(greater) + np.asarray(equal)
    assert (total <= num_items - 1).all()
