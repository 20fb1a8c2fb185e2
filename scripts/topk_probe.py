"""Round-5 probe: new dynamic-extraction streaming top-k vs rank_weights.

Measures the VERDICT item-1 'done' condition: streaming_topk k=10 within
~1.5x of rank_weights ms at B=1024, N=200K; k=128 improvement vs the
round-4 12.33 ms record.  Pipelined reps, one readback (CLAUDE.md timing
rules), matmul sanity sentinel first.
"""

import sys
import time

import numpy as np

sys.path.insert(0, '.')


def main():
    import jax
    import jax.numpy as jnp

    from spotlight_tpu.ops.kernels.ranking import (matched_target_scores,
                                                   rank_weights)
    from spotlight_tpu.ops.kernels.topk import streaming_topk

    rs = np.random.RandomState(0)

    # Sanity sentinel: healthy chip does 4096^3 f32 at ~3.8 ms.  Jitted
    # chain (one dispatch): the eager chained-dot form has a separate
    # slow mode (~200 ms per 64 MB-result dispatch) that does NOT affect
    # jitted kernels.
    xl = jnp.asarray(rs.randn(4096, 4096), jnp.float32)

    @jax.jit
    def chain(x):
        return jax.lax.fori_loop(
            0, 10, lambda i, y: jnp.dot(y, x) * 1e-3, x)

    float(np.asarray(chain(xl))[0, 0])
    start = time.perf_counter()
    r = chain(xl)
    float(np.asarray(r)[0, 0])
    ms = (time.perf_counter() - start) / 10 * 1e3
    print('sentinel matmul ms {:.2f} ({:.1f} TFLOP/s)'.format(
        ms, 2 * 4096 ** 3 / ms / 1e9), flush=True)
    del xl, r

    for (B, N, ks) in [(1024, 200_000, (10, 128)),
                       (256, 100_000, (10, 128))]:
        D = 64
        users = jnp.asarray(rs.randn(B, D), jnp.float32)
        items = jnp.asarray(rs.randn(N, D), jnp.float32)
        bias = jnp.asarray(rs.randn(N), jnp.float32)
        tids = jnp.asarray(rs.randint(0, N, (B, 4)), jnp.int32)

        # Correctness vs lax.top_k on the materialized matrix.
        scores_full = np.asarray(
            jnp.dot(users, items.T,
                    preferred_element_type=jnp.float32) + bias)
        for k in ks:
            s, ids = streaming_topk(users, items, bias, k)
            s, ids = np.asarray(s), np.asarray(ids)
            ref_s, ref_i = jax.lax.top_k(jnp.asarray(scores_full), k)
            ok_i = np.array_equal(ids, np.asarray(ref_i))
            # Scores may differ from the one-shot XLA matmul by ~1 ulp
            # of accumulation order (see the tie-heavy exactness test).
            ok_s = np.allclose(s, np.asarray(ref_s), atol=1e-5)
            print('B={} N={} k={}: ids_exact={} scores_close={}'.format(
                B, N, k, ok_i, ok_s), flush=True)
            assert ok_i and ok_s

        # rank_weights baseline at the same streaming work.
        @jax.jit
        def weights_path(u, it, bi, ti):
            ts = matched_target_scores(u, it, bi, ti)
            return rank_weights(u, it, bi, ts)

        reps = 30
        float(np.asarray(weights_path(users, items, bias, tids)).ravel()[0])
        start = time.perf_counter()
        for _ in range(reps):
            out = weights_path(users, items, bias, tids)
        float(np.asarray(out).ravel()[0])
        rw_ms = (time.perf_counter() - start) / reps * 1e3
        print('B={} N={}: rank_weights {:.3f} ms'.format(B, N, rw_ms),
              flush=True)

        for k in ks:
            fn = jax.jit(lambda u, it, bi, k=k: streaming_topk(u, it, bi, k))
            float(np.asarray(fn(users, items, bias)[1]).ravel()[0])
            start = time.perf_counter()
            for _ in range(reps):
                out = fn(users, items, bias)
            float(np.asarray(out[1]).ravel()[0])
            tk_ms = (time.perf_counter() - start) / reps * 1e3
            print('B={} N={} k={}: streaming_topk {:.3f} ms '
                  '({:.2f}x rank_weights)'.format(B, N, k, tk_ms,
                                                  tk_ms / rw_ms),
                  flush=True)


if __name__ == '__main__':
    main()
