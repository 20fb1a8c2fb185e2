"""Staged cost probe for the end-to-end streaming-eval gap (round-4
VERDICT item 1).

Round 3 measured `large_catalog_eval` (2048 users x 200K items, T=4) at
2.16 G item-scores/s while the rank kernel alone ran ~11.3 G — a ~5x
end-to-end dilution.  This probe times every stage at exactly the eval
shapes so the gap is itemized, then times the round-4 production
configuration (lean rank_weights kernel, 1024-user batches, auto tile):

    python scripts/eval_gap_probe.py [--quick]

Prints one JSON line per stage.  Timing forces a data-dependent readback
(`float(...)`) — `block_until_ready` is unreliable through the dev
tunnel (CLAUDE.md).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

QUICK = '--quick' in sys.argv
REPS = 3 if QUICK else 10


def emit(name, ms, **extra):
    print(json.dumps(dict(stage=name, ms=round(ms, 3), **extra)),
          flush=True)


def timed(fn, readback, reps=REPS):
    fn()  # warm-up / compile
    readback()
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

    N, D, T = 200_000, 64, 4
    rs = np.random.RandomState(0)
    items = jnp.asarray(rs.randn(N, D), dtype=jnp.float32)
    bias = jnp.asarray(rs.randn(N), dtype=jnp.float32)

    hbm_bytes = N * D * 4
    print(json.dumps(dict(
        stage='roofline', catalog_mb=round(hbm_bytes / 1e6, 1),
        note='one catalog stream; v5e HBM ~800 GB/s -> '
             '{:.3f} ms floor per stream'.format(hbm_bytes / 800e9 * 1e3))),
        flush=True)

    for B in (256, 1024, 2048):
        users = jnp.asarray(rs.randn(B, D), dtype=jnp.float32)
        tids = jnp.asarray(rs.randint(0, N, (B, T)), dtype=jnp.int32)

        # Stage: matched target scores alone.
        mts = jax.jit(lambda u, t: matched_target_scores(u, items, bias, t))
        ms = timed(lambda: mts(users, tids),
                   lambda *a: float(np.asarray(a[0])[0, 0]) if a else None)
        emit('matched_target_scores', ms, B=B)

        ts = mts(users, tids)

        # Stage: legacy rank_counts kernel (round-3 production), both the
        # old default tile (512) and the bench tile (2048).
        for tile in (512, 2048):
            fn = jax.jit(lambda u, s, t, tile=tile: rank_counts(
                u, items, bias, s, t, tile_items=tile))
            ms = timed(lambda: fn(users, ts, tids),
                       lambda *a: float(np.asarray(a[0][0])[0, 0])
                       if a else None)
            emit('rank_counts', ms, B=B, tile=tile,
                 gscores_per_s=round(B * N / ms / 1e6, 2))

        # Stage: lean rank_weights kernel at several tiles.
        for tile in (512, 1024, 2048, 4096):
            fn = jax.jit(lambda u, s, tile=tile: rank_weights(
                u, items, bias, s, tile_items=tile))
            ms = timed(lambda: fn(users, ts),
                       lambda *a: float(np.asarray(a[0])[0, 0])
                       if a else None)
            emit('rank_weights', ms, B=B, tile=tile,
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
        start = time.perf_counter()
        out = mrr_score(model, test, batch_size=batch)
        float(np.asarray(out)[0])
        elapsed = time.perf_counter() - start
        emit('mrr_score_end_to_end', elapsed * 1e3, B=batch,
             users_per_s=round(eval_users / elapsed, 1),
             gscores_per_s=round(eval_users * N / elapsed / 1e9, 2))


if __name__ == '__main__':
    main()
