"""Reproducible benchmark suite: every headline number in one run.

Run on the default (TPU) platform; prints one JSON line per measurement.
``bench.py`` remains the driver-facing single-line benchmark; this suite
regenerates the full docs/performance.md table.

    python scripts/bench_suite.py [--quick]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

QUICK = '--quick' in sys.argv


def emit(name, value, unit, **extra):
    print(json.dumps(dict(metric=name, value=round(value, 2), unit=unit,
                          **extra)), flush=True)


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
        epochs = 1 if QUICK else 3
        model._n_iter = epochs
        start = time.perf_counter()
        model.fit(interactions)
        elapsed = time.perf_counter() - start
        emit('implicit_mf_train_{}'.format(loss),
             epochs * n / elapsed, 'examples/s/chip')
    return model, interactions


def bench_sequence():
    from spotlight_tpu.data.interactions import SequenceInteractions
    from spotlight_tpu.evaluation import sequence_mrr_score
    from spotlight_tpu.sequence import ImplicitSequenceModel

    rs = np.random.RandomState(42)
    nseq = 5_000 if QUICK else 20_000
    sequences = rs.randint(1, 20_000, size=(nseq, 50)).astype(np.int32)
    data = SequenceInteractions(sequences, num_items=20_000)

    model = ImplicitSequenceModel(
        loss='bpr', representation='lstm', embedding_dim=64,
        batch_size=256, n_iter=1, random_state=np.random.RandomState(0))
    model.fit(data)
    epochs = 1 if QUICK else 3
    model._n_iter = epochs
    start = time.perf_counter()
    model.fit(data)
    elapsed = time.perf_counter() - start
    emit('lstm_sequence_train', epochs * nseq / elapsed, 'sequences/s/chip')

    eval_rows = 512 if QUICK else 2048
    test = SequenceInteractions(sequences[:eval_rows], num_items=20_000)
    sequence_mrr_score(model, test)      # warm-up + compile
    start = time.perf_counter()
    sequence_mrr_score(model, test)
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
    sequence_mrr_score(mix, test)
    elapsed = time.perf_counter() - start
    emit('mixture_catalog_eval', eval_rows / elapsed, 'users/s',
         config='2048 users x 20K items, M=4')


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

    jax.block_until_ready(kernel_path(users, items, bias, tids))
    reps = 5 if QUICK else 20
    start = time.perf_counter()
    for _ in range(reps):
        out = kernel_path(users, items, bias, tids)
    jax.block_until_ready(out)
    per_call = (time.perf_counter() - start) / reps
    emit('streaming_rank_kernel', per_call * 1e3, 'ms/call',
         config='256 users x 100K items x 16 targets')


def main():
    bench_implicit_mf()
    bench_sequence()
    bench_rank_kernel()


if __name__ == '__main__':
    main()
