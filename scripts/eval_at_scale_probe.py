"""Round-5 probe: end-to-end streaming MRR at realistic eval size.

20K test users x 200K items (10 batches at the VMEM-derived 2048
default) — the shape where per-batch dispatches pipeline and the
per-evaluation fixed costs amortize.  Updates the docs/performance.md
"End-to-end mrr_score at scale" row (round 1: 3.4 s; round 2: 2.48 s /
1.61 G item-ranks/s).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, '.')


def main():
    import jax
    import jax.numpy as jnp

    from spotlight_tpu.data import Interactions
    from spotlight_tpu.evaluation import FALLBACK_COUNTS, mrr_score
    from spotlight_tpu.factorization import ImplicitFactorizationModel
    from spotlight_tpu.ops.kernels.ranking import (matched_target_scores,
                                                   rank_weights)

    # Health gate: the rank kernel at its committed shape (see
    # eval_round5_probe.sentinel for why not a plain matmul).
    rs = np.random.RandomState(3)
    users = jnp.asarray(rs.randn(1024, 64), jnp.float32)
    items = jnp.asarray(rs.randn(200_000, 64), jnp.float32)
    bias = jnp.asarray(rs.randn(200_000), jnp.float32)
    tids = jnp.asarray(rs.randint(0, 200_000, (1024, 4)), jnp.int32)

    @jax.jit
    def wp(u, it, bi, ti):
        return rank_weights(u, it, bi,
                            matched_target_scores(u, it, bi, ti))

    float(np.asarray(wp(users, items, bias, tids)).ravel()[0])
    start = time.perf_counter()
    for _ in range(30):
        out = wp(users, items, bias, tids)
    float(np.asarray(out).ravel()[0])
    ms = (time.perf_counter() - start) / 30 * 1e3
    print('sentinel rank_weights {:.2f} ms (healthy: 2.4-2.9)'.format(ms),
          flush=True)
    assert ms < 6.0, 'kernel path looks sick; rerun'
    del users, items, bias, tids

    rs = np.random.RandomState(7)
    num_users, num_items = 50_000, 200_000
    n = 500_000
    train = Interactions(
        rs.randint(0, num_users, n).astype(np.int64),
        rs.randint(0, num_items, n).astype(np.int64),
        num_users=num_users, num_items=num_items)
    model = ImplicitFactorizationModel(
        loss='bpr', embedding_dim=64, n_iter=1, batch_size=8192,
        random_state=np.random.RandomState(42))
    model.fit(train)

    eval_users = 20_000
    test = Interactions(
        np.repeat(np.arange(eval_users, dtype=np.int64), 4),
        rs.randint(0, num_items, 4 * eval_users).astype(np.int64),
        num_users=num_users, num_items=num_items)

    for masked in (False, True):
        kwargs = dict(train=train) if masked else {}
        before = sum(FALLBACK_COUNTS.values())
        mrr_score(model, test, **kwargs)      # warm-up + compile
        best = float('inf')
        for _ in range(3):
            start = time.perf_counter()
            out = mrr_score(model, test, **kwargs)
            float(np.asarray(out).ravel()[0])
            best = min(best, time.perf_counter() - start)
        assert sum(FALLBACK_COUNTS.values()) == before
        print(json.dumps(dict(
            metric='mrr_at_scale{}'.format('_masked' if masked else ''),
            seconds=round(best, 3),
            users_per_s=round(eval_users / best),
            g_item_ranks_per_s=round(
                eval_users * num_items / best / 1e9, 2),
            config='20K users x 200K items, 10 batches at the 2048 '
                   'default{}'.format(', train-masked' if masked
                                      else ''))), flush=True)


if __name__ == '__main__':
    main()
