"""The Pallas streaming-rank evaluation path must agree with the standard
materialize-sort path (kernel run in interpreter mode on CPU)."""

import numpy as np
import pytest

from spotlight_tpu.data import random_train_test_split
from spotlight_tpu.evaluation import mrr_score, sequence_mrr_score
from spotlight_tpu.factorization import ImplicitFactorizationModel
from spotlight_tpu.sequence import ImplicitSequenceModel

from tests._fixtures import factorization_dataset, sequential_dataset


@pytest.fixture(scope='module')
def fitted_factorization():
    interactions = factorization_dataset(
        num_users=120, num_items=90, num_interactions=4000)
    train, test = random_train_test_split(
        interactions, random_state=np.random.RandomState(0))
    model = ImplicitFactorizationModel(
        loss='bpr', n_iter=2, batch_size=512,
        random_state=np.random.RandomState(42))
    model.fit(train)
    return train, test, model


@pytest.fixture(scope='module')
def fitted_sequence():
    interactions = sequential_dataset(
        num_users=40, num_items=50, num_interactions=2000,
        concentration_parameter=0.01)
    from spotlight_tpu.data import user_based_train_test_split
    train, test = user_based_train_test_split(
        interactions, random_state=np.random.RandomState(0))
    train = train.to_sequence(max_sequence_length=8)
    test = test.to_sequence(max_sequence_length=8)
    model = ImplicitSequenceModel(
        loss='bpr', representation='lstm', n_iter=2,
        random_state=np.random.RandomState(42))
    model.fit(train)
    return train, test, model


def test_streaming_mrr_matches(fitted_factorization):
    train, test, model = fitted_factorization
    standard = mrr_score(model, test, streaming=False)
    streamed = mrr_score(model, test, streaming=True)
    np.testing.assert_allclose(streamed, standard, rtol=1e-4, atol=1e-6)


def test_streaming_mrr_with_train_mask_matches(fitted_factorization):
    train, test, model = fitted_factorization
    standard = mrr_score(model, test, train=train, streaming=False)
    streamed = mrr_score(model, test, train=train, streaming=True)
    np.testing.assert_allclose(streamed, standard, rtol=1e-4, atol=1e-6)


def test_streaming_sequence_mrr_matches(fitted_sequence):
    _, test, model = fitted_sequence
    standard = sequence_mrr_score(model, test, streaming=False)
    streamed = sequence_mrr_score(model, test, streaming=True)
    np.testing.assert_allclose(streamed, standard, rtol=1e-4, atol=1e-6)


def test_streaming_sequence_mrr_exclude_preceding_matches(fitted_sequence):
    _, test, model = fitted_sequence
    standard = sequence_mrr_score(model, test, exclude_preceding=True,
                                  streaming=False)
    streamed = sequence_mrr_score(model, test, exclude_preceding=True,
                                  streaming=True)
    np.testing.assert_allclose(streamed, standard, rtol=1e-4, atol=1e-6)


def test_streaming_precision_recall_matches(fitted_factorization):
    from spotlight_tpu.evaluation import precision_recall_score

    train, test, model = fitted_factorization
    ks = np.array([1, 5, 10])
    p_std, r_std = precision_recall_score(model, test, k=ks,
                                          streaming=False)
    p_str, r_str = precision_recall_score(model, test, k=ks,
                                          streaming=True)
    np.testing.assert_allclose(p_str, p_std, rtol=1e-6)
    np.testing.assert_allclose(r_str, r_std, rtol=1e-6)


def test_streaming_precision_recall_with_train_mask_matches(
        fitted_factorization):
    """Train-masked streaming top-k (over-fetch + compaction) reproduces
    the FLOAT_MAX-demotion semantics of the standard path."""
    from spotlight_tpu.evaluation import precision_recall_score

    train, test, model = fitted_factorization
    p_std, r_std = precision_recall_score(model, test, train=train, k=10,
                                          streaming=False)
    p_str, r_str = precision_recall_score(model, test, train=train, k=10,
                                          streaming=True)
    np.testing.assert_allclose(p_str, p_std, rtol=1e-6)
    np.testing.assert_allclose(r_str, r_std, rtol=1e-6)


def test_streaming_sequence_precision_recall_matches(fitted_sequence):
    from spotlight_tpu.evaluation import sequence_precision_recall_score

    _, test, model = fitted_sequence
    p_std, r_std = sequence_precision_recall_score(model, test, k=4,
                                                   streaming=False)
    p_str, r_str = sequence_precision_recall_score(model, test, k=4,
                                                   streaming=True)
    np.testing.assert_allclose(p_str, p_std, rtol=1e-6)
    np.testing.assert_allclose(r_str, r_std, rtol=1e-6)


def test_streaming_paths_do_not_fall_back(fitted_factorization):
    """The production shapes must stay on the kernel path: the fallback
    counter stays flat across a full streaming evaluation."""
    from spotlight_tpu import evaluation

    train, test, model = fitted_factorization
    before = dict(evaluation.FALLBACK_COUNTS)
    mrr_score(model, test, train=train, streaming=True)
    from spotlight_tpu.evaluation import precision_recall_score
    precision_recall_score(model, test, train=train, k=10, streaming=True)
    assert dict(evaluation.FALLBACK_COUNTS) == before


def test_streaming_fallback_warns(fitted_factorization, monkeypatch):
    """A streaming-path failure recomputes on the standard path AND emits
    a RuntimeWarning + counter increment (never silent; round-2 VERDICT
    item 7 / advisor finding)."""
    from spotlight_tpu import evaluation

    train, test, model = fitted_factorization

    def boom(*args, **kwargs):
        raise RuntimeError('injected Mosaic failure')

    monkeypatch.setattr(evaluation, '_streaming_ranks_device', boom)
    before = evaluation.FALLBACK_COUNTS['_streaming_ranks']
    with pytest.warns(RuntimeWarning, match='fell back'):
        result = mrr_score(model, test, train=train, streaming=True)
    assert evaluation.FALLBACK_COUNTS['_streaming_ranks'] > before
    standard = mrr_score(model, test, train=train, streaming=False)
    np.testing.assert_allclose(result, standard, rtol=1e-6)


def test_streaming_mrr_on_mesh_matches():
    """With mesh-sharded tables, the streaming path routes through the
    sharded rank-count collective and still matches the standard path."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')

    from spotlight_tpu.parallel import make_mesh

    interactions = factorization_dataset(
        num_users=120, num_items=90, num_interactions=4000)
    train, test = random_train_test_split(
        interactions, random_state=np.random.RandomState(0))
    model = ImplicitFactorizationModel(
        loss='bpr', n_iter=2, batch_size=512,
        mesh=make_mesh(data=2, model=4),
        random_state=np.random.RandomState(42))
    model.fit(train)

    standard = mrr_score(model, test, train=train, streaming=False)
    streamed = mrr_score(model, test, train=train, streaming=True)
    # The per-shard kernels reproduce the single-device kernel arithmetic
    # exactly (the D contraction is never split), so the mesh path gets
    # the same tight tolerance as the single-device streaming tests.
    np.testing.assert_allclose(streamed, standard, rtol=1e-4, atol=1e-6)

    # The mesh streaming path carries the same loud-fallback contract as
    # the single-device path: a per-shard kernel failure warns, counts,
    # and recomputes on the materialize path instead of raising.
    from spotlight_tpu import evaluation

    def boom(*args, **kwargs):
        raise RuntimeError('injected Mosaic failure')

    original = evaluation._streaming_ranks_sharded
    evaluation._streaming_ranks_sharded = boom
    try:
        before = evaluation.FALLBACK_COUNTS['_streaming_ranks_sharded']
        with pytest.warns(RuntimeWarning, match='fell back'):
            fell_back = mrr_score(model, test, train=train, streaming=True)
        assert (evaluation.FALLBACK_COUNTS['_streaming_ranks_sharded']
                > before)
    finally:
        evaluation._streaming_ranks_sharded = original
    np.testing.assert_allclose(fell_back, standard, rtol=1e-6)


@pytest.fixture(scope='module')
def fitted_mixture():
    interactions = sequential_dataset(
        num_users=40, num_items=50, num_interactions=2000,
        concentration_parameter=0.01)
    sequences = interactions.to_sequence(max_sequence_length=8)
    model = ImplicitSequenceModel(
        representation='mixture', n_iter=2,
        random_state=np.random.RandomState(42))
    model.fit(sequences)
    return sequences, model


def test_streaming_mixture_mrr_matches(fitted_mixture):
    """Mixture-of-tastes scoring streams through the generalized kernel
    (M taste/attention matmuls + in-tile softmax) and matches the
    materialize path."""
    sequences, model = fitted_mixture
    factors = model._rank_factors_sequences(sequences.sequences[:4, :-1])
    assert len(factors) == 4 and factors[3] == model._net.num_mixtures

    # The streaming path must actually engage (the except-based fallback
    # would otherwise compare materialize against materialize).
    from spotlight_tpu.evaluation import _streaming_ranks
    prefixes = sequences.sequences[:4, :-1]
    targets = sequences.sequences[:4, -1:].astype(np.int64)
    rr = _streaming_ranks(model, 'sequences', prefixes, targets,
                          np.ones_like(targets, dtype=bool),
                          interpret=True)
    assert rr is not None and rr.shape == (4,)

    standard = sequence_mrr_score(model, sequences, streaming=False)
    streamed = sequence_mrr_score(model, sequences, streaming=True)
    np.testing.assert_allclose(streamed, standard, rtol=1e-4, atol=1e-6)


def test_streaming_mixture_mrr_exclude_preceding_matches(fitted_mixture):
    sequences, model = fitted_mixture
    standard = sequence_mrr_score(model, sequences, exclude_preceding=True,
                                  streaming=False)
    streamed = sequence_mrr_score(model, sequences, exclude_preceding=True,
                                  streaming=True)
    np.testing.assert_allclose(streamed, standard, rtol=1e-4, atol=1e-6)


def test_streaming_mixture_precision_recall_matches(fitted_mixture):
    from spotlight_tpu.evaluation import (_streaming_topk_hits,
                                          sequence_precision_recall_score)

    sequences, model = fitted_mixture
    # The streaming top-k path must actually engage (a silent except-based
    # fallback would make this test compare materialize vs materialize).
    hits = _streaming_topk_hits(model, 'sequences',
                                sequences.sequences[:4, :-4], 4,
                                interpret=True)
    assert hits is not None and hits.shape == (4, 4)

    p_std, r_std = sequence_precision_recall_score(model, sequences, k=4,
                                                   streaming=False)
    p_str, r_str = sequence_precision_recall_score(model, sequences, k=4,
                                                   streaming=True)
    np.testing.assert_allclose(p_str, p_std, rtol=1e-6)
    np.testing.assert_allclose(r_str, r_std, rtol=1e-6)


def test_streaming_mixture_tie_handling(fitted_mixture):
    """Exactly duplicated item rows must tie bit-exactly inside the kernel
    (tile scores and the matched candidate scores come from the same
    Mosaic arithmetic) and produce average ranks, matching the standard
    path's rankdata semantics."""
    sequences, model = fitted_mixture

    weight = np.asarray(model._params['item_embeddings']['weight']).copy()
    weight[6] = weight[5]  # duplicate fused row: factors + bias
    params = dict(model._params)
    emb = dict(params['item_embeddings'])
    emb['weight'] = np.asarray(weight)
    params['item_embeddings'] = emb
    model._params = params  # new identity -> item-factor cache refreshes

    # Force item 5 to be the scored target of every row.
    doctored = sequences.sequences.copy()
    doctored[:, -1] = 5
    from spotlight_tpu.data.interactions import SequenceInteractions
    test = SequenceInteractions(doctored, num_items=sequences.num_items)

    standard = sequence_mrr_score(model, test, streaming=False)
    streamed = sequence_mrr_score(model, test, streaming=True)
    np.testing.assert_allclose(streamed, standard, rtol=1e-6, atol=1e-8)
    # The duplicated row forces a two-way tie: every rank is k + 0.5, so
    # no reciprocal rank can be 1/k for integer k.
    ranks = 1.0 / streamed
    assert np.allclose(ranks % 1.0, 0.5, atol=1e-4)


def test_streaming_sequence_pr_exclude_preceding_matches(fitted_sequence):
    from spotlight_tpu.evaluation import sequence_precision_recall_score

    _, test, model = fitted_sequence
    p_std, r_std = sequence_precision_recall_score(
        model, test, k=4, exclude_preceding=True, streaming=False)
    p_str, r_str = sequence_precision_recall_score(
        model, test, k=4, exclude_preceding=True, streaming=True)
    np.testing.assert_allclose(p_str, p_std, rtol=1e-6)
    np.testing.assert_allclose(r_str, r_std, rtol=1e-6)


def test_streaming_precision_recall_on_mesh_matches():
    """With mesh-sharded tables, P@k routes through the per-shard top-k
    tournament merge and matches the standard path exactly (top-k is not
    tie-sensitive the way average ranks are: candidate selection happens
    per shard on identical local matmuls)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')

    from spotlight_tpu.evaluation import precision_recall_score
    from spotlight_tpu.parallel import make_mesh

    interactions = factorization_dataset(
        num_users=120, num_items=90, num_interactions=4000)
    train, test = random_train_test_split(
        interactions, random_state=np.random.RandomState(0))
    model = ImplicitFactorizationModel(
        loss='bpr', n_iter=2, batch_size=512,
        mesh=make_mesh(data=2, model=4),
        random_state=np.random.RandomState(42))
    model.fit(train)

    p_std, r_std = precision_recall_score(model, test, train=train, k=10,
                                          streaming=False)
    p_str, r_str = precision_recall_score(model, test, train=train, k=10,
                                          streaming=True)
    np.testing.assert_allclose(p_str, p_std, rtol=1e-6)
    np.testing.assert_allclose(r_str, r_std, rtol=1e-6)


def test_streaming_sequence_mrr_on_mesh_matches():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')

    from spotlight_tpu.data import user_based_train_test_split
    from spotlight_tpu.parallel import make_mesh

    interactions = sequential_dataset(
        num_users=40, num_items=50, num_interactions=2000,
        concentration_parameter=0.01)
    train, test = user_based_train_test_split(
        interactions, random_state=np.random.RandomState(0))
    train = train.to_sequence(max_sequence_length=8)
    test = test.to_sequence(max_sequence_length=8)
    model = ImplicitSequenceModel(
        loss='bpr', representation='lstm', n_iter=2, batch_size=64,
        mesh=make_mesh(data=2, model=4),
        random_state=np.random.RandomState(42))
    model.fit(train)

    standard = sequence_mrr_score(model, test, streaming=False)
    streamed = sequence_mrr_score(model, test, streaming=True)
    np.testing.assert_allclose(streamed, standard, rtol=1e-4, atol=1e-6)


def test_rank_counts_wide_targets_exact():
    """Target widths beyond the kernel's 128-wide chunk stay on the kernel
    path (chunked) and remain bit-exact vs a host oracle."""
    import jax
    import jax.numpy as jnp
    from spotlight_tpu.ops.kernels.ranking import rank_counts

    rs = np.random.RandomState(0)
    B, D, N, T = 4, 16, 700, 300
    users = jnp.asarray(rs.randn(B, D).astype(np.float32))
    items = jnp.asarray(rs.randn(N, D).astype(np.float32))
    bias = jnp.asarray(rs.randn(N).astype(np.float32))
    tids = jnp.asarray(rs.randint(0, N, (B, T)).astype(np.int32))

    scores = np.asarray(users @ items.T + bias[None])
    tscores = jnp.asarray(
        np.take_along_axis(scores, np.asarray(tids), axis=1))

    greater, equal = rank_counts(users, items, bias, tscores, tids,
                                 tile_items=256, interpret=True)
    g_ref = np.zeros((B, T))
    e_ref = np.zeros((B, T))
    for b in range(B):
        for t in range(T):
            tid = int(tids[b, t])
            ts = scores[b, tid]
            others = np.arange(N) != tid
            g_ref[b, t] = (scores[b, others] > ts).sum()
            e_ref[b, t] = (scores[b, others] == ts).sum()
    assert np.array_equal(np.asarray(greater), g_ref)
    assert np.array_equal(np.asarray(equal), e_ref)


def test_streaming_topk_wide_fetch_exact():
    """Fetch widths beyond 128 run in resume-key rounds and reproduce
    lax.top_k (including k == catalog size)."""
    import jax
    import jax.numpy as jnp
    from spotlight_tpu.ops.kernels.topk import streaming_topk

    rs = np.random.RandomState(1)
    B, D, N = 4, 16, 700
    users = jnp.asarray(rs.randn(B, D).astype(np.float32))
    items = jnp.asarray(rs.randn(N, D).astype(np.float32))
    bias = jnp.asarray(rs.randn(N).astype(np.float32))
    full = jnp.asarray(np.asarray(users @ items.T + bias[None]))

    # 150 exercises the single-launch region beyond the 128 resume-round
    # width (SINGLE_LAUNCH_K); 300 and N run in resume rounds.
    for k in (150, 300, N):
        s, ids = streaming_topk(users, items, bias, k, tile_items=256,
                                interpret=True)
        ref_s, ref_i = jax.lax.top_k(full, k)
        assert np.array_equal(np.asarray(ids), np.asarray(ref_i))
        # Kernel matmul accumulation order differs from XLA's by ~1 ulp.
        np.testing.assert_allclose(np.asarray(s), np.asarray(ref_s),
                                   atol=1e-5)

    with pytest.raises(ValueError, match='exceeds the catalog'):
        streaming_topk(users, items, bias, N + 1, interpret=True)


def test_streaming_mrr_heavy_user_stays_streaming(fitted_factorization):
    """A user with >128 test items no longer drops the whole evaluation to
    the materialize-sort path: results must match the standard path."""
    train, test, model = fitted_factorization

    # Give user 0 a very wide test row (every item).
    num_items = train.num_items
    from spotlight_tpu.data import Interactions
    wide = Interactions(
        np.concatenate([np.zeros(num_items, dtype=np.int64),
                        test.user_ids]),
        np.concatenate([np.arange(num_items, dtype=np.int64),
                        test.item_ids]),
        num_users=train.num_users, num_items=num_items)
    assert num_items > 85  # the padded target width exceeds 128 with dups

    standard = mrr_score(model, wide, train=train, streaming=False)
    streamed = mrr_score(model, wide, train=train, streaming=True)
    np.testing.assert_allclose(streamed, standard, rtol=1e-4, atol=1e-6)


def test_padded_and_dedup_rows_vectorized():
    from spotlight_tpu.evaluation import _dedup_rows, _padded_rows
    import scipy.sparse as sp

    rs = np.random.RandomState(3)
    dense = (rs.rand(20, 37) < 0.15).astype(np.float64)
    csr = sp.csr_matrix(dense)
    users = np.where(dense.any(axis=1))[0]
    rows = _padded_rows(csr, users)
    for i, u in enumerate(users):
        expected = np.where(dense[u])[0]
        assert np.array_equal(rows[i, :len(expected)], expected)
        assert (rows[i, len(expected):] == -1).all()

    # Empty matrix: all-pad output, no indexing error.
    empty = sp.csr_matrix((5, 7))
    out = _padded_rows(empty, np.array([0, 3]))
    assert (out == -1).all()

    mat = rs.randint(0, 9, (11, 13)).astype(np.int64)
    dd = _dedup_rows(mat)
    for i in range(len(mat)):
        expected = np.unique(mat[i])
        assert np.array_equal(dd[i, :len(expected)], expected)
        assert (dd[i, len(expected):] == -1).all()


def test_streaming_mixture_mrr_on_mesh_matches():
    """Mixture scoring also streams when the item table is mesh-sharded:
    per-shard batch_scores counting + psum (parallel/evaluation.py)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')

    from spotlight_tpu.data import user_based_train_test_split
    from spotlight_tpu.evaluation import sequence_precision_recall_score
    from spotlight_tpu.parallel import make_mesh

    interactions = sequential_dataset(
        num_users=40, num_items=50, num_interactions=2000,
        concentration_parameter=0.01)
    train, test = user_based_train_test_split(
        interactions, random_state=np.random.RandomState(0))
    train = train.to_sequence(max_sequence_length=8)
    test = test.to_sequence(max_sequence_length=8)
    model = ImplicitSequenceModel(
        loss='bpr', representation='mixture', n_iter=2, batch_size=64,
        mesh=make_mesh(data=2, model=4),
        random_state=np.random.RandomState(42))
    model.fit(train)

    standard = sequence_mrr_score(model, test, streaming=False)
    streamed = sequence_mrr_score(model, test, streaming=True)
    np.testing.assert_allclose(streamed, standard, rtol=1e-4, atol=1e-6)

    p_std, r_std = sequence_precision_recall_score(model, test, k=4,
                                                   streaming=False)
    p_str, r_str = sequence_precision_recall_score(model, test, k=4,
                                                   streaming=True)
    np.testing.assert_allclose(p_str, p_std, rtol=1e-6)
    np.testing.assert_allclose(r_str, r_std, rtol=1e-6)


def test_rank_weights_matches_rank_counts_matched():
    """The lean production kernel (self-inclusive combined weights, no id
    exclusion) must agree exactly with the general (greater, equal)
    kernel whenever target scores are kernel-matched:
    ``weights == greater + 0.5 * (equal + 1)``."""
    import jax.numpy as jnp
    from spotlight_tpu.ops.kernels.ranking import (matched_target_scores,
                                                   rank_counts,
                                                   rank_weights)

    rs = np.random.RandomState(7)
    B, D, N, T = 8, 16, 700, 5
    users = jnp.asarray(rs.randn(B, D).astype(np.float32))
    items_np = rs.randn(N, D).astype(np.float32)
    items_np[9] = items_np[3]  # an exact duplicate row forces a tie
    items = jnp.asarray(items_np)
    bias_np = rs.randn(N).astype(np.float32)
    bias_np[9] = bias_np[3]
    bias = jnp.asarray(bias_np)
    tids = jnp.asarray(rs.randint(0, N, (B, T)).astype(np.int32))
    tids = tids.at[:, 0].set(3)  # every row targets the duplicated item

    ts = matched_target_scores(users, items, bias, tids)
    weights = rank_weights(users, items, bias, ts, tile_items=256,
                           interpret=True)
    greater, equal = rank_counts(users, items, bias, ts, tids,
                                 tile_items=256, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(weights),
        np.asarray(greater + 0.5 * (equal + 1.0)))
    # The duplicate row produced a real tie (0.5 steps beyond the self
    # tie), so the equality above exercised the tie bucket.
    assert np.any(np.asarray(equal)[:, 0] == 1.0)


def test_rank_weights_padding_rows_never_count():
    """Catalog sizes that are not tile multiples pad with -FLOAT_MAX-bias
    rows; those rows must contribute zero weight even for targets with
    very low scores."""
    import jax.numpy as jnp
    from spotlight_tpu.ops.kernels.ranking import (matched_target_scores,
                                                   rank_weights)

    rs = np.random.RandomState(11)
    B, D, N = 4, 8, 130           # pads 126 rows at tile 256
    users = jnp.asarray(rs.randn(B, D).astype(np.float32))
    items = jnp.asarray(rs.randn(N, D).astype(np.float32))
    bias = jnp.asarray(np.full(N, -1e30, np.float32))  # very low scores
    tids = jnp.zeros((B, 1), jnp.int32)

    ts = matched_target_scores(users, items, bias, tids)
    weights = rank_weights(users, items, bias, ts, tile_items=256,
                           interpret=True)
    scores = np.asarray(users @ items.T + bias[None])
    expected = ((scores > scores[:, :1]).sum(axis=1)
                + 0.5 * (scores == scores[:, :1]).sum(axis=1))
    np.testing.assert_array_equal(np.asarray(weights)[:, 0], expected)


def test_bf16_tables_stream_bf16_and_match_materialize():
    """bf16 catalog streaming (round-4 VERDICT item 2): with
    ``table_dtype=bfloat16`` the densified item matrix keeps bf16 (half
    the HBM bytes per catalog pass) and the in-tile upcast is value-exact,
    so streaming MRR must match the materialize path on the same rounded
    scores — including ties."""
    import jax.numpy as jnp

    from spotlight_tpu.data import random_train_test_split
    from spotlight_tpu.factorization import (BilinearNet,
                                             ImplicitFactorizationModel)
    from tests._fixtures import factorization_dataset

    interactions = factorization_dataset(
        num_users=120, num_items=90, num_interactions=5000)
    train, test = random_train_test_split(
        interactions, random_state=np.random.RandomState(0))
    net = BilinearNet(120, 90, 16, table_dtype=jnp.bfloat16)
    model = ImplicitFactorizationModel(
        loss='bpr', n_iter=3, batch_size=512, representation=net,
        random_state=np.random.RandomState(42))
    model.fit(train)

    factors = model._rank_factors_users(np.arange(8))
    assert factors[1].dtype == jnp.bfloat16  # streams bf16, not f32

    standard = mrr_score(model, test, train=train, streaming=False)
    streamed = mrr_score(model, test, train=train, streaming=True)
    np.testing.assert_allclose(streamed, standard, rtol=1e-5, atol=1e-7)

    from spotlight_tpu.evaluation import precision_recall_score
    p_std, r_std = precision_recall_score(model, test, train=train,
                                          streaming=False)
    p_str, r_str = precision_recall_score(model, test, train=train,
                                          streaming=True)
    np.testing.assert_array_equal(p_str, p_std)
    np.testing.assert_array_equal(r_str, r_std)


def test_rank_kernels_loop_only_real_targets():
    """The kernels' VPU comparison loop covers only the real targets; the
    8-sublane block padding contributes nothing (its rows stay at the
    step-0 zeros) and results are unchanged for any real width."""
    import jax.numpy as jnp

    from spotlight_tpu.ops.kernels.ranking import (matched_target_scores,
                                                   rank_weights)

    rs = np.random.RandomState(3)
    items = np.asarray(rs.randn(500, 16), np.float32)
    bias = np.asarray(rs.randn(500), np.float32)
    users = np.asarray(rs.randn(16, 16), np.float32)
    # Kernel-matched arithmetic for the expected scores (an (items, users)
    # dot in the kernel's own operand order): strict >/== comparisons
    # against target scores must see bit-identical values.
    scores = np.asarray(
        jnp.dot(jnp.asarray(items), jnp.asarray(users).T)
        + jnp.asarray(bias)[:, None]).T
    for t_width in (1, 3, 8, 11):
        targets = rs.randint(0, 500, (16, t_width))
        ts = matched_target_scores(jnp.asarray(users), jnp.asarray(items),
                                   jnp.asarray(bias), jnp.asarray(targets))
        weights = rank_weights(jnp.asarray(users), jnp.asarray(items),
                               jnp.asarray(bias), ts, interpret=True)
        ts_np = np.asarray(ts)
        expected = ((scores[:, None, :] > ts_np[:, :, None]).sum(axis=2)
                    + 0.5 * (scores[:, None, :]
                             == ts_np[:, :, None]).sum(axis=2))
        np.testing.assert_array_equal(np.asarray(weights), expected)


def test_resolve_batch_size_vmem_derived(fitted_factorization,
                                         fitted_mixture):
    """The auto streaming batch width comes from the scoped-VMEM model
    (round-4 VERDICT item 4): 2048 for dot-product representations, 1024
    for mixture-of-tastes (whose kernels hold 2M live component
    temporaries), 256 on the materialize path."""
    from spotlight_tpu.evaluation import _resolve_batch_size

    _, _, model = fitted_factorization
    _, mixture_model = fitted_mixture
    assert _resolve_batch_size(None, True, model, 'users') == 2048
    # Mixture: the rank kernel (128-row floor tile) allows 2048
    # (measured 1.39x the former 1024); top-k's 256-row floor caps 1024.
    assert _resolve_batch_size(None, True, mixture_model, 'sequences',
                               kernel='rank') == 2048
    assert _resolve_batch_size(None, True, mixture_model, 'sequences',
                               kernel='topk') == 1024
    assert _resolve_batch_size(None, False, model, 'users') == 256
    # An explicit caller batch size is always respected.
    assert _resolve_batch_size(640, True, model, 'users') == 640


def test_streaming_batch_caps_chunk_oversized_batches(
        fitted_factorization, monkeypatch):
    """A user batch beyond the VMEM cap runs in cap-sized chunks (not the
    materialize fallback), with identical results."""
    import warnings

    import spotlight_tpu.evaluation as evaluation

    train, test, model = fitted_factorization
    standard = mrr_score(model, test, train=train, streaming=False)
    from spotlight_tpu.evaluation import precision_recall_score
    p_std, r_std = precision_recall_score(model, test, train=train,
                                          streaming=False)

    # Force tiny caps AND an explicit larger batch so each metric batch
    # genuinely splits into multiple chunks (batch 64 / cap 16 = 4
    # chunks; auto batch would also shrink to the patched cap and leave
    # the multi-part concatenate untested).
    monkeypatch.setattr(evaluation, '_streaming_batch_cap',
                        lambda mixture, kind: 16)
    with warnings.catch_warnings():
        warnings.simplefilter('error')  # any fallback warning fails
        streamed = mrr_score(model, test, train=train, streaming=True,
                             batch_size=64)
        p_str, r_str = precision_recall_score(model, test, train=train,
                                              streaming=True,
                                              batch_size=64)
    np.testing.assert_allclose(streamed, standard, rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(p_str, p_std)
    np.testing.assert_array_equal(r_str, r_std)


def test_streaming_topk_tie_heavy_exact():
    """Exact lax.top_k parity under heavy score ties: a small catalog of
    duplicated rows (every score appears ~N/8 times) exercises the
    extraction tie-break (min id among maxima) and the sorted-insertion
    tie count ((score ==, id <) buffer entries) across tile boundaries
    and resume rounds."""
    import jax
    import jax.numpy as jnp
    from spotlight_tpu.ops.kernels.topk import streaming_topk

    rs = np.random.RandomState(7)
    B, D = 8, 16
    base_rows = rs.randn(8, D).astype(np.float32)
    items = jnp.asarray(np.tile(base_rows, (80, 1)))          # N=640
    bias = jnp.asarray(np.zeros(640, np.float32))
    users = jnp.asarray(rs.randn(B, D).astype(np.float32))
    full = jnp.dot(users, items.T, preferred_element_type=jnp.float32)

    for k in (5, 24, 150, 300):
        s, ids = streaming_topk(users, items, bias, k, tile_items=256,
                                interpret=True)
        ref_s, ref_i = jax.lax.top_k(full, k)
        # Ids must be exact (ties resolved identically: duplicated rows
        # score bit-identically *within* each path).  Scores differ from
        # the one-shot XLA matmul by ~1 ulp of accumulation order.
        assert np.array_equal(np.asarray(ids), np.asarray(ref_i)), k
        np.testing.assert_allclose(np.asarray(s), np.asarray(ref_s),
                                   atol=1e-5)


def test_streaming_batch_caps_chunk_on_mesh(monkeypatch):
    """The VMEM cap chunks oversized batches on the mesh path too (the
    sharded branches previously bypassed it)."""
    import warnings

    import jax

    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')

    import spotlight_tpu.evaluation as evaluation
    from spotlight_tpu.evaluation import precision_recall_score
    from spotlight_tpu.parallel import make_mesh

    interactions = factorization_dataset(
        num_users=120, num_items=90, num_interactions=4000)
    train, test = random_train_test_split(
        interactions, random_state=np.random.RandomState(0))
    model = ImplicitFactorizationModel(
        loss='bpr', n_iter=2, batch_size=512,
        mesh=make_mesh(data=2, model=4),
        random_state=np.random.RandomState(42))
    model.fit(train)

    standard = mrr_score(model, test, train=train, streaming=False)
    p_std, r_std = precision_recall_score(model, test, train=train, k=10,
                                          streaming=False)

    monkeypatch.setattr(evaluation, '_streaming_batch_cap',
                        lambda mixture, kind: 16)
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        streamed = mrr_score(model, test, train=train, streaming=True,
                             batch_size=64)
        p_str, r_str = precision_recall_score(model, test, train=train,
                                              k=10, streaming=True,
                                              batch_size=64)
    np.testing.assert_allclose(streamed, standard, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(p_str, p_std, rtol=1e-6)
    np.testing.assert_allclose(r_str, r_std, rtol=1e-6)


def test_trim_batch_rows_unit():
    from spotlight_tpu.evaluation import _trim_batch_rows

    rows = np.full((4, 100), -1, dtype=np.int64)
    rows[0, :3] = [5, 6, 7]
    rows[2, :11] = np.arange(11)
    out = _trim_batch_rows(rows)
    assert out.shape == (4, 16)          # 11 -> next pow2, min 8
    np.testing.assert_array_equal(out, rows[:, :16])
    assert _trim_batch_rows(None) is None
    small = rows[:, :8]
    assert _trim_batch_rows(small) is small


def test_heavy_user_widens_only_its_own_batch(fitted_factorization):
    """A single heavy-train user inflates the over-fetch/loop width of
    its own batch only; results are unchanged across batch splits."""
    train, test, model = fitted_factorization
    num_items = train.num_items
    from spotlight_tpu.data import Interactions
    heavy = Interactions(
        np.concatenate([np.zeros(num_items // 2, dtype=np.int64),
                        train.user_ids]),
        np.concatenate([np.arange(num_items // 2, dtype=np.int64),
                        train.item_ids]),
        num_users=train.num_users, num_items=num_items)

    standard = mrr_score(model, test, train=heavy, streaming=False)
    # Small batches: the heavy user (id 0) lands in batch 0; later
    # batches run at their own narrow width.
    streamed = mrr_score(model, test, train=heavy, streaming=True,
                         batch_size=16)
    np.testing.assert_allclose(streamed, standard, rtol=1e-4, atol=1e-6)

    from spotlight_tpu.evaluation import precision_recall_score
    p_std, r_std = precision_recall_score(model, test, train=heavy, k=5,
                                          streaming=False)
    p_str, r_str = precision_recall_score(model, test, train=heavy, k=5,
                                          streaming=True, batch_size=16)
    np.testing.assert_allclose(p_str, p_std, rtol=1e-6)
    np.testing.assert_allclose(r_str, r_std, rtol=1e-6)


def test_auto_tiles_are_sublane_multiples():
    """Ragged batch widths must still produce Mosaic-legal tiles (block
    rows divisible by 8): a 1568-user final batch of a 20K eval once
    produced a 668-row tile and tripped the loud fallback on TPU."""
    from spotlight_tpu.evaluation import _auto_tile, _mixture_topk_tile
    from spotlight_tpu.ops.kernels.ranking import _auto_tile_items

    for batch in (7, 130, 943, 1568, 2048, 3000):
        for mixture in (None, 2, 4):
            assert _auto_tile(batch, mixture) % 8 == 0, (batch, mixture)
            if mixture:
                assert _mixture_topk_tile(batch, mixture) % 8 == 0
        assert _auto_tile_items(batch) % 8 == 0, batch
        assert _auto_tile_items(batch, budget=1 << 18) % 8 == 0, batch


def test_ragged_final_batch_pads_to_compiled_width(fitted_factorization,
                                                   fitted_sequence):
    """Multi-batch evaluations pad the ragged final batch back to the
    compiled batch width (executable reuse, tuned tile shapes); results
    match the materialize path exactly."""
    from spotlight_tpu.evaluation import precision_recall_score

    train, test, model = fitted_factorization
    # batch_size=32 over ~100+ users: several full batches + a ragged one.
    standard = mrr_score(model, test, train=train, streaming=False)
    streamed = mrr_score(model, test, train=train, streaming=True,
                         batch_size=32)
    np.testing.assert_allclose(streamed, standard, rtol=1e-4, atol=1e-6)

    p_std, r_std = precision_recall_score(model, test, train=train, k=5,
                                          streaming=False)
    p_str, r_str = precision_recall_score(model, test, train=train, k=5,
                                          streaming=True, batch_size=32)
    np.testing.assert_allclose(p_str, p_std, rtol=1e-6)
    np.testing.assert_allclose(r_str, r_std, rtol=1e-6)

    _, seq_test, seq_model = fitted_sequence
    s_std = sequence_mrr_score(seq_model, seq_test, streaming=False)
    s_str = sequence_mrr_score(seq_model, seq_test, streaming=True,
                               batch_size=32)
    np.testing.assert_allclose(s_str, s_std, rtol=1e-4, atol=1e-6)

    from spotlight_tpu.evaluation import sequence_precision_recall_score
    sp_std, sr_std = sequence_precision_recall_score(
        seq_model, seq_test, k=4, streaming=False)
    sp_str, sr_str = sequence_precision_recall_score(
        seq_model, seq_test, k=4, streaming=True, batch_size=32)
    np.testing.assert_allclose(sp_str, sp_std, rtol=1e-6)
    np.testing.assert_allclose(sr_str, sr_std, rtol=1e-6)
