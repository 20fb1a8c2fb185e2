"""Reproducible benchmark suite: every headline number in one run.

Run on the default (TPU) platform; prints one JSON line per measurement
and (with ``--output FILE``) writes the whole suite as one JSON artifact
— committed per round as ``bench_suite_r{N}.json`` so regressions in any
headline number show up in review, not just the driver's single-line
``bench.py`` metric (round-3 VERDICT item 6).

    python scripts/bench_suite.py [--quick] [--output FILE]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

QUICK = '--quick' in sys.argv

RECORDS = []


def emit(name, value, unit, **extra):
    record = dict(metric=name, value=round(value, 2), unit=unit, **extra)
    RECORDS.append(record)
    print(json.dumps(record), flush=True)


def _readback(x):
    """Force a data-dependent device-to-host sync (block_until_ready has
    been observed returning early through the dev tunnel)."""
    return float(np.asarray(x).ravel()[0])


def _timed_fit_rate(model, data, examples_per_fit, epochs):
    """examples/s of a timed ``fit`` — best of 2 repetitions, like the
    reference's own benchmark harness (min-of-2 elapsed,
    `/root/reference/examples/bloom_embeddings/performance.py:24-38`):
    the dev tunnel shows transient 2x throughput dips, and the faster
    repetition is the one that reflects steady-state device capability.
    The model must already be fitted once (warm-up + compile)."""
    model._n_iter = epochs
    reps = 1 if QUICK else 2
    best = float('inf')
    for _ in range(reps):
        start = time.perf_counter()
        model.fit(data)
        best = min(best, time.perf_counter() - start)
    return epochs * examples_per_fit / best


def bench_implicit_mf():
    from spotlight_tpu.data import Interactions
    from spotlight_tpu.factorization import ImplicitFactorizationModel

    rs = np.random.RandomState(42)
    n = 200_000 if QUICK else 1_000_000
    interactions = Interactions(
        rs.randint(0, 100_000, n).astype(np.int64),
        rs.randint(0, 20_000, n).astype(np.int64),
        num_users=100_000, num_items=20_000)

    for loss in ('bpr', 'adaptive_hinge'):
        model = ImplicitFactorizationModel(
            loss=loss, embedding_dim=64, n_iter=1, batch_size=8192,
            random_state=np.random.RandomState(42))
        model.fit(interactions)          # warm-up + compile
        # 10 epochs amortize the one-time per-fit host-to-device copy the
        # way a real n_iter=10 fit does (same methodology as bench.py).
        rate = _timed_fit_rate(model, interactions, n,
                               epochs=1 if QUICK else 10)
        emit('implicit_mf_train_{}'.format(loss), rate, 'examples/s/chip')
    return model, interactions


def bench_explicit_mf():
    """Training + evaluation throughput for the third estimator family
    (round-4 VERDICT item 7: the suite had no explicit-factorization
    record).  Matches `/root/reference/spotlight/factorization/
    explicit.py:173` (regression loss, Adam)."""
    from spotlight_tpu.data import Interactions
    from spotlight_tpu.evaluation import rmse_score
    from spotlight_tpu.factorization import ExplicitFactorizationModel

    rs = np.random.RandomState(42)
    n = 200_000 if QUICK else 1_000_000
    interactions = Interactions(
        rs.randint(0, 100_000, n).astype(np.int64),
        rs.randint(0, 20_000, n).astype(np.int64),
        ratings=rs.uniform(1.0, 5.0, n).astype(np.float32),
        num_users=100_000, num_items=20_000)

    model = ExplicitFactorizationModel(
        loss='regression', embedding_dim=64, n_iter=1, batch_size=8192,
        random_state=np.random.RandomState(42))
    model.fit(interactions)              # warm-up + compile
    rate = _timed_fit_rate(model, interactions, n,
                           epochs=1 if QUICK else 10)
    emit('explicit_mf_train_regression', rate, 'examples/s/chip')

    rmse_score(model, interactions)      # warm-up + compile
    start = time.perf_counter()
    value = rmse_score(model, interactions)
    float(value)
    elapsed = time.perf_counter() - start
    emit('explicit_rmse_eval', n / elapsed / 1e6, 'M predictions/s',
         rmse=round(float(value), 3))
    del model


def bench_lazy_knobs():
    """The composed perf knobs at a large-table config (the lazy engine's
    home regime): dense vs sparse=True vs each stacked knob.  Pinned by
    round-3 VERDICT item 3: the knobs must stack, and the combination
    must beat each knob alone at scale."""
    import jax.numpy as jnp

    from spotlight_tpu.data import Interactions
    from spotlight_tpu.factorization import (BilinearNet,
                                             ImplicitFactorizationModel)

    rs = np.random.RandomState(42)
    num_users = 200_000 if QUICK else 2_000_000
    num_items = 100_000 if QUICK else 500_000
    n = 200_000 if QUICK else 1_000_000
    interactions = Interactions(
        rs.randint(0, num_users, n).astype(np.int64),
        rs.randint(0, num_items, n).astype(np.int64),
        num_users=num_users, num_items=num_items)

    configs = [
        ('dense', dict()),
        ('lazy', dict(sparse=True)),
        ('lazy_bf16', dict(sparse=True, table_dtype=jnp.bfloat16)),
        ('lazy_inbatch', dict(sparse=True,
                              negative_sampling='in_batch')),
        ('lazy_bf16_inbatch', dict(sparse=True,
                                   table_dtype=jnp.bfloat16,
                                   negative_sampling='in_batch')),
    ]
    for name, cfg in configs:
        kwargs = dict(cfg)
        table_dtype = kwargs.pop('table_dtype', None)
        if table_dtype is not None:
            kwargs['representation'] = BilinearNet(
                num_users, num_items, 64, table_dtype=table_dtype)
        model = ImplicitFactorizationModel(
            loss='bpr', embedding_dim=64, n_iter=1, batch_size=8192,
            random_state=np.random.RandomState(42), **kwargs)
        model.fit(interactions)          # warm-up + compile
        rate = _timed_fit_rate(model, interactions, n,
                               epochs=1 if QUICK else 4)
        emit('lazy_knobs_{}'.format(name), rate, 'examples/s/chip',
             config='{}x{} users x items, D=64'.format(num_users,
                                                       num_items))
        del model


def bench_sequence():
    from spotlight_tpu.data.interactions import SequenceInteractions
    from spotlight_tpu.evaluation import sequence_mrr_score
    from spotlight_tpu.sequence import ImplicitSequenceModel

    rs = np.random.RandomState(42)
    nseq = 5_000 if QUICK else 20_000
    sequences = rs.randint(1, 20_000, size=(nseq, 50)).astype(np.int32)
    data = SequenceInteractions(sequences, num_items=20_000)

    # All four representations (the reference-CPU baselines for the
    # head-to-head table live in scripts/reference_seq_baseline.py).
    # 'lstm' must stay in reps: the eval section below reuses its model.
    reps = ('lstm',) if QUICK else ('pooling', 'lstm', 'cnn', 'mixture')
    model = None
    for rep in reps:
        rep_model = ImplicitSequenceModel(
            loss='bpr', representation=rep, embedding_dim=64,
            batch_size=256, n_iter=1,
            random_state=np.random.RandomState(0))
        rep_model.fit(data)
        # 10 epochs amortize the one-time per-fit host-to-device sequence
        # copy (~4 MB through the dev tunnel), same methodology as
        # bench.py.
        rate = _timed_fit_rate(rep_model, data, nseq,
                               epochs=1 if QUICK else 10)
        emit('{}_sequence_train'.format(rep), rate, 'sequences/s/chip')
        if rep == 'lstm':
            model = rep_model
        else:
            del rep_model

    if model is None:
        return
    eval_rows = 512 if QUICK else 2048
    test = SequenceInteractions(sequences[:eval_rows], num_items=20_000)
    sequence_mrr_score(model, test)      # warm-up + compile
    start = time.perf_counter()
    out = sequence_mrr_score(model, test)
    _readback(out)
    elapsed = time.perf_counter() - start
    emit('lstm_catalog_eval', eval_rows * 20_000 / elapsed / 1e9,
         'G item-scores/s', users_per_s=round(eval_rows / elapsed, 1))

    # Mixture-of-tastes eval rides the pluggable-score streaming kernel.
    mix = ImplicitSequenceModel(
        loss='bpr', representation='mixture', embedding_dim=64,
        batch_size=256, n_iter=1, random_state=np.random.RandomState(0))
    mix.fit(SequenceInteractions(sequences[:2048], num_items=20_000))
    sequence_mrr_score(mix, test)        # warm-up + compile
    start = time.perf_counter()
    out = sequence_mrr_score(mix, test)
    _readback(out)
    elapsed = time.perf_counter() - start
    emit('mixture_catalog_eval', eval_rows / elapsed, 'users/s',
         config='2048 users x 20K items, M=4')


def bench_sequence_large_catalog():
    """Sequence eval at the 200K-item scale the factorization eval is
    proven at (round-4 VERDICT item 3): LSTM and mixture prefix encoding
    must pipeline with catalog streaming, not serialize against it."""
    from spotlight_tpu.data.interactions import SequenceInteractions
    from spotlight_tpu.evaluation import sequence_mrr_score
    from spotlight_tpu.sequence import ImplicitSequenceModel

    rs = np.random.RandomState(42)
    num_items = 200_000
    nseq = 1024 if QUICK else 4096
    eval_rows = 512 if QUICK else 2048
    sequences = rs.randint(1, num_items, (nseq, 50)).astype(np.int32)
    data = SequenceInteractions(sequences, num_items=num_items)
    test = SequenceInteractions(sequences[:eval_rows],
                                num_items=num_items)

    for rep in ('lstm', 'mixture'):
        model = ImplicitSequenceModel(
            loss='bpr', representation=rep, embedding_dim=64,
            batch_size=256, n_iter=1,
            random_state=np.random.RandomState(0))
        model.fit(data)
        sequence_mrr_score(model, test)  # warm-up + compile
        start = time.perf_counter()
        out = sequence_mrr_score(model, test)
        _readback(out)
        elapsed = time.perf_counter() - start
        emit('{}_catalog_eval_200k'.format(rep),
             eval_rows * num_items / elapsed / 1e9, 'G item-scores/s',
             users_per_s=round(eval_rows / elapsed, 1),
             config='{} seqs x 200K items, prefix len 49'.format(
                 eval_rows))
        del model


def bench_large_catalog_eval():
    """End-to-end streaming MRR over a 200K-item catalog (the round-3
    VERDICT item-8 'memory cliff' check: the score matrix for 2048 users
    x 200K items would be 1.6 GB materialized; the streaming path never
    builds it)."""
    from spotlight_tpu.data import Interactions
    from spotlight_tpu.evaluation import mrr_score
    from spotlight_tpu.factorization import ImplicitFactorizationModel

    rs = np.random.RandomState(7)
    num_users, num_items = 50_000, 200_000
    n = 100_000 if QUICK else 500_000
    train = Interactions(
        rs.randint(0, num_users, n).astype(np.int64),
        rs.randint(0, num_items, n).astype(np.int64),
        num_users=num_users, num_items=num_items)
    model = ImplicitFactorizationModel(
        loss='bpr', embedding_dim=64, n_iter=1, batch_size=8192,
        random_state=np.random.RandomState(42))
    model.fit(train)

    eval_users = 512 if QUICK else 2048
    test = Interactions(
        np.repeat(np.arange(eval_users, dtype=np.int64), 4),
        rs.randint(0, num_items, 4 * eval_users).astype(np.int64),
        num_users=num_users, num_items=num_items)
    mrr_score(model, test)               # warm-up + compile
    start = time.perf_counter()
    out = mrr_score(model, test)
    _readback(out)
    elapsed = time.perf_counter() - start
    emit('large_catalog_eval', eval_users * num_items / elapsed / 1e9,
         'G item-scores/s', users_per_s=round(eval_users / elapsed, 1),
         config='{} users x 200K items, streaming MRR'.format(eval_users))

    # Masked precision@10 end-to-end with a heavy-train-user batch: user
    # 0 carries 120 extra train items, so every batch over-fetches
    # 10 + ~124 candidates — the resume-round worst case the round-4
    # VERDICT flagged (item 1); the dynamic-extraction top-k kernel's
    # cost scales with actual top-k updates, not fetch width.
    from spotlight_tpu.evaluation import precision_recall_score

    heavy = Interactions(
        np.concatenate([np.zeros(120, dtype=np.int64), train.user_ids]),
        np.concatenate([rs.randint(0, num_items, 120).astype(np.int64),
                        train.item_ids]),
        num_users=num_users, num_items=num_items)
    precision_recall_score(model, test, train=heavy, k=10)  # warm-up
    start = time.perf_counter()
    p, _ = precision_recall_score(model, test, train=heavy, k=10)
    _readback(p)
    elapsed = time.perf_counter() - start
    emit('masked_precision_at_10', eval_users / elapsed, 'users/s',
         config='{} users x 200K items, train mask incl. 120-item '
                'heavy user'.format(eval_users))


def bench_at_scale_eval():
    """Streaming MRR at realistic eval size: 20K users x 200K items —
    10 batches at the VMEM-derived 2048 default, where per-batch
    dispatches pipeline and the per-evaluation fixed costs amortize
    (this shape also regression-guards the ragged-final-batch fix: the
    1568-user leftover once produced a non-sublane-divisible tile)."""
    from spotlight_tpu.data import Interactions
    from spotlight_tpu.evaluation import FALLBACK_COUNTS, mrr_score
    from spotlight_tpu.factorization import ImplicitFactorizationModel

    rs = np.random.RandomState(7)
    num_users, num_items = 50_000, 200_000
    n = 100_000 if QUICK else 500_000
    train = Interactions(
        rs.randint(0, num_users, n).astype(np.int64),
        rs.randint(0, num_items, n).astype(np.int64),
        num_users=num_users, num_items=num_items)
    model = ImplicitFactorizationModel(
        loss='bpr', embedding_dim=64, n_iter=1, batch_size=8192,
        random_state=np.random.RandomState(42))
    model.fit(train)

    eval_users = 5_000 if QUICK else 20_000
    test = Interactions(
        np.repeat(np.arange(eval_users, dtype=np.int64), 4),
        rs.randint(0, num_items, 4 * eval_users).astype(np.int64),
        num_users=num_users, num_items=num_items)
    before = sum(FALLBACK_COUNTS.values())
    mrr_score(model, test)               # warm-up + compile
    start = time.perf_counter()
    out = mrr_score(model, test)
    _readback(out)
    elapsed = time.perf_counter() - start
    assert sum(FALLBACK_COUNTS.values()) == before, dict(FALLBACK_COUNTS)
    emit('mrr_at_scale', eval_users * num_items / elapsed / 1e9,
         'G item-ranks/s', users_per_s=round(eval_users / elapsed),
         config='{} users x 200K items, streaming MRR, pure '
                'defaults'.format(eval_users))
    del model


def bench_rank_kernel():
    import jax
    import jax.numpy as jnp

    from spotlight_tpu.ops.kernels.ranking import rank_counts

    rs = np.random.RandomState(0)
    B, D, N, T = 256, 64, 100_000, 16
    users = jnp.asarray(rs.randn(B, D), dtype=jnp.float32)
    items = jnp.asarray(rs.randn(N, D), dtype=jnp.float32)
    bias = jnp.asarray(rs.randn(N), dtype=jnp.float32)
    tids = jnp.asarray(rs.randint(0, N, (B, T)), dtype=jnp.int32)

    @jax.jit
    def kernel_path(users, items, bias, tids):
        ts = jnp.einsum('bd,btd->bt', users, items[tids]) + bias[tids]
        return rank_counts(users, items, bias, ts, tids, tile_items=2048)

    _readback(kernel_path(users, items, bias, tids)[0])
    reps = 5 if QUICK else 30
    start = time.perf_counter()
    for _ in range(reps):
        out = kernel_path(users, items, bias, tids)
    _readback(out[0])
    per_call = (time.perf_counter() - start) / reps
    emit('streaming_rank_kernel', per_call * 1e3, 'ms/call',
         config='256 users x 100K items x 16 targets')

    # Production lean rank kernel (rank_weights, round 4) at the same
    # continuity shape and at the wide-batch production shape.
    from spotlight_tpu.ops.kernels.ranking import (matched_target_scores,
                                                   rank_weights)

    @jax.jit
    def weights_path(users, items, bias, tids):
        ts = matched_target_scores(users, items, bias, tids)
        return rank_weights(users, items, bias, ts)

    _readback(weights_path(users, items, bias, tids))
    start = time.perf_counter()
    for _ in range(reps):
        out = weights_path(users, items, bias, tids)
    _readback(out)
    per_call = (time.perf_counter() - start) / reps
    emit('streaming_rank_weights', per_call * 1e3, 'ms/call',
         config='256 users x 100K items x 16 targets (lean kernel)')

    B_wide, N_wide, T_wide = 1024, 200_000, 4
    users_w = jnp.asarray(rs.randn(B_wide, D), dtype=jnp.float32)
    items_w = jnp.asarray(rs.randn(N_wide, D), dtype=jnp.float32)
    bias_w = jnp.asarray(rs.randn(N_wide), dtype=jnp.float32)
    tids_w = jnp.asarray(rs.randint(0, N_wide, (B_wide, T_wide)),
                         dtype=jnp.int32)
    _readback(weights_path(users_w, items_w, bias_w, tids_w))
    start = time.perf_counter()
    for _ in range(reps):
        out = weights_path(users_w, items_w, bias_w, tids_w)
    _readback(out)
    per_call = (time.perf_counter() - start) / reps
    emit('streaming_rank_weights_wide', per_call * 1e3, 'ms/call',
         gscores_per_s=round(B_wide * N_wide / per_call / 1e9, 2),
         config='1024 users x 200K items x 4 targets (eval default '
                'batch)')

    # Per-shard blocks (the mesh eval path feeds (N/S, D) slices with
    # shifted target ids to the same kernel): 4 sequential quarter-blocks
    # must not regress vs one full pass (round-3 VERDICT item 1's
    # single-chip no-regression check).
    shards = 4
    local = N // shards

    @jax.jit
    def per_shard_path(users, items, bias, tids):
        ts = jnp.einsum('bd,btd->bt', users, items[tids]) + bias[tids]
        greater = jnp.zeros((B, T), jnp.float32)
        equal = jnp.zeros((B, T), jnp.float32)
        for s in range(shards):
            block = jax.lax.slice_in_dim(items, s * local, (s + 1) * local)
            bias_block = jax.lax.slice_in_dim(bias, s * local,
                                              (s + 1) * local)
            g, e = rank_counts(users, block, bias_block, ts,
                               tids - s * local, tile_items=2048)
            greater = greater + g
            equal = equal + e
        return greater, equal

    _readback(per_shard_path(users, items, bias, tids)[0])
    start = time.perf_counter()
    for _ in range(reps):
        out = per_shard_path(users, items, bias, tids)
    _readback(out[0])
    per_call = (time.perf_counter() - start) / reps
    emit('streaming_rank_kernel_4blocks', per_call * 1e3, 'ms/call',
         config='same work as streaming_rank_kernel, 4 sequential '
                'quarter-catalog blocks (per-shard shape)')


def bench_topk_kernel():
    import jax
    import jax.numpy as jnp

    from spotlight_tpu.ops.kernels.topk import streaming_topk

    rs = np.random.RandomState(0)
    B, D, N = 256, 64, 100_000
    users = jnp.asarray(rs.randn(B, D), dtype=jnp.float32)
    items = jnp.asarray(rs.randn(N, D), dtype=jnp.float32)
    bias = jnp.asarray(rs.randn(N), dtype=jnp.float32)

    for k in (10, 128):
        fn = jax.jit(lambda u, i, b, k=k: streaming_topk(u, i, b, k,
                                                         tile_items=2048))
        _readback(fn(users, items, bias)[1])
        reps = 5 if QUICK else 30
        start = time.perf_counter()
        for _ in range(reps):
            out = fn(users, items, bias)
        _readback(out[1])
        per_call = (time.perf_counter() - start) / reps
        emit('streaming_topk_kernel_k{}'.format(k), per_call * 1e3,
             'ms/call', config='256 users x 100K items')

    # The rank-kernel-comparison shape (round-4 VERDICT item 1: top-k
    # within ~1.5x of rank_weights at identical streaming work).
    B_wide, N_wide = 1024, 200_000
    users_w = jnp.asarray(rs.randn(B_wide, D), dtype=jnp.float32)
    items_w = jnp.asarray(rs.randn(N_wide, D), dtype=jnp.float32)
    bias_w = jnp.asarray(rs.randn(N_wide), dtype=jnp.float32)
    for k in (10, 128):
        fn = jax.jit(lambda u, i, b, k=k: streaming_topk(u, i, b, k))
        _readback(fn(users_w, items_w, bias_w)[1])
        reps = 5 if QUICK else 30
        start = time.perf_counter()
        for _ in range(reps):
            out = fn(users_w, items_w, bias_w)
        _readback(out[1])
        per_call = (time.perf_counter() - start) / reps
        emit('streaming_topk_kernel_wide_k{}'.format(k), per_call * 1e3,
             'ms/call', config='1024 users x 200K items (rank_weights '
                               'comparison shape)')


def _output_path():
    """Validate ``--output FILE`` up front so a forgotten value fails
    before the (long) suite runs, not after."""
    if '--output' not in sys.argv:
        return None
    index = sys.argv.index('--output')
    if index + 1 >= len(sys.argv) or sys.argv[index + 1].startswith('--'):
        sys.exit('--output requires a file path argument')
    return sys.argv[index + 1]


def main():
    import jax

    output = _output_path()

    bench_implicit_mf()
    bench_explicit_mf()
    bench_lazy_knobs()
    bench_sequence()
    bench_sequence_large_catalog()
    bench_large_catalog_eval()
    bench_at_scale_eval()
    bench_rank_kernel()
    bench_topk_kernel()

    if output is not None:
        path = output
        artifact = {
            'backend': jax.default_backend(),
            'device_count': jax.device_count(),
            'quick': QUICK,
            'records': RECORDS,
        }
        with open(path, 'w') as handle:
            json.dump(artifact, handle, indent=1)
        print('wrote', path, flush=True)


if __name__ == '__main__':
    main()
