"""Staged cost probe for the end-to-end streaming-eval gap (round-4
VERDICT items 1/2).

Round 3 measured `large_catalog_eval` (2048 users x 200K items, T=4) at
2.16 G item-scores/s while quoting the rank kernel at ~11.3 G — both
numbers under-read: they were timed with few serially-dispatched
repetitions, and each dispatch through the dev tunnel blocks ~5 ms.
This probe times every stage with 30 *pipelined* repetitions (async
dispatches chain on device; one data-dependent readback at the end), at
exactly the eval shapes:

    python scripts/eval_gap_probe.py [--quick]

Round-4 headline results (recorded in docs/performance.md "Roofline"):
the lean rank_weights kernel streams 200K items x 1024 users in 2.4 ms
(84 G scores/s, MXU+VPU compute-bound), and end-to-end ``mrr_score`` at
the new 1024-user default batch runs 34.9K users/s — 3.2x the round-3
artifact on the same shape.

Timing forces a data-dependent readback (`float(...)`) —
`block_until_ready` is unreliable through the dev tunnel (CLAUDE.md).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

QUICK = '--quick' in sys.argv
REPS = 5 if QUICK else 30


def emit(name, ms, **extra):
    print(json.dumps(dict(stage=name, ms=round(ms, 3), **extra)),
          flush=True)


def timed(fn, readback, reps=REPS):
    out = fn()  # warm-up / compile
    readback(out)
    start = time.perf_counter()
    for _ in range(reps):
        out = fn()
    readback(out)
    return (time.perf_counter() - start) / reps * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from spotlight_tpu.ops.kernels.ranking import (matched_target_scores,
                                                   rank_counts,
                                                   rank_weights)
    from spotlight_tpu.ops.kernels.topk import streaming_topk

    N, D, T = 200_000, 64, 4
    rs = np.random.RandomState(0)
    items = jnp.asarray(rs.randn(N, D), dtype=jnp.float32)
    items16 = items.astype(jnp.bfloat16)
    bias = jnp.asarray(rs.randn(N), dtype=jnp.float32)

    hbm_bytes = N * D * 4
    print(json.dumps(dict(
        stage='roofline', catalog_mb=round(hbm_bytes / 1e6, 1),
        note='one catalog stream; v5e HBM ~800 GB/s -> '
             '{:.3f} ms floor per stream'.format(hbm_bytes / 800e9 * 1e3))),
        flush=True)

    def rb_scalar(out):
        return float(np.asarray(out)[0, 0] if np.asarray(out).ndim > 1
                     else np.asarray(out)[0])

    for B in (256, 1024, 2048):
        users = jnp.asarray(rs.randn(B, D), dtype=jnp.float32)
        tids = jnp.asarray(rs.randint(0, N, (B, T)), dtype=jnp.int32)

        mts = jax.jit(lambda u, t: matched_target_scores(u, items, bias, t))
        ms = timed(lambda: mts(users, tids), rb_scalar)
        emit('matched_target_scores', ms, B=B)
        ts = mts(users, tids)

        # Production rank kernel, auto-tiled f32 and bf16 streaming.
        fw = jax.jit(lambda u, s: rank_weights(u, items, bias, s))
        ms = timed(lambda: fw(users, ts), rb_scalar)
        emit('rank_weights', ms, B=B,
             gscores_per_s=round(B * N / ms / 1e6, 2),
             hbm_gb_s=round(hbm_bytes / ms / 1e6, 1))

        mts16 = jax.jit(lambda u, t: matched_target_scores(
            u, items16, bias, t))
        ts16 = mts16(users, tids)
        fw16 = jax.jit(lambda u, s: rank_weights(u, items16, bias, s))
        ms = timed(lambda: fw16(users, ts16), rb_scalar)
        emit('rank_weights_bf16', ms, B=B,
             gscores_per_s=round(B * N / ms / 1e6, 2))

        # Legacy (1-ulp-robust) counts kernel, auto-tiled.
        fc = jax.jit(lambda u, s, t: rank_counts(u, items, bias, s, t))
        ms = timed(lambda: fc(users, ts, tids),
                   lambda out: float(np.asarray(out[0])[0, 0]))
        emit('rank_counts', ms, B=B,
             gscores_per_s=round(B * N / ms / 1e6, 2))

        # Streaming top-k at the precision@10 shape.
        ftk = jax.jit(lambda u: streaming_topk(u, items, bias, 10))
        ms = timed(lambda: ftk(users),
                   lambda out: float(np.asarray(out[0])[0, 0]))
        emit('streaming_topk_k10', ms, B=B,
             gscores_per_s=round(B * N / ms / 1e6, 2))

    # End-to-end mrr_score through the estimator (the committed
    # large_catalog_eval methodology, minus model training).
    from spotlight_tpu.data import Interactions
    from spotlight_tpu.evaluation import mrr_score
    from spotlight_tpu.factorization import ImplicitFactorizationModel

    num_users = 50_000
    train = Interactions(
        rs.randint(0, num_users, 100_000).astype(np.int64),
        rs.randint(0, N, 100_000).astype(np.int64),
        num_users=num_users, num_items=N)
    model = ImplicitFactorizationModel(
        loss='bpr', embedding_dim=64, n_iter=1, batch_size=8192,
        random_state=np.random.RandomState(42))
    model.fit(train)

    eval_users = 2048
    test = Interactions(
        np.repeat(np.arange(eval_users, dtype=np.int64), T),
        rs.randint(0, N, T * eval_users).astype(np.int64),
        num_users=num_users, num_items=N)

    for batch in (256, 1024, 2048):
        mrr_score(model, test, batch_size=batch)     # warm-up + compile
        best = None
        for _ in range(3):
            start = time.perf_counter()
            out = mrr_score(model, test, batch_size=batch)
            float(np.asarray(out)[0])
            best = min(best or 1e9, time.perf_counter() - start)
        emit('mrr_score_end_to_end', best * 1e3, B=batch,
             users_per_s=round(eval_users / best, 1),
             gscores_per_s=round(eval_users * N / best / 1e9, 2))

    mrr_score(model, test, train=train, batch_size=1024)
    start = time.perf_counter()
    out = mrr_score(model, test, train=train, batch_size=1024)
    float(np.asarray(out)[0])
    elapsed = time.perf_counter() - start
    emit('mrr_score_end_to_end_trainmask', elapsed * 1e3, B=1024,
         users_per_s=round(eval_users / elapsed, 1))


if __name__ == '__main__':
    main()
