"""Head-to-head bloom-lookup formulations on real TPU.

Compares, at training-relevant shapes:

- XLA gather+sum (``table[rows].sum(-2)``) — the round-1 default,
- the multi-hot MXU kernel (`ops/kernels/multihot.py`),
- the double-buffered row-DMA kernel (`ops/kernels/bloom.py`,
  dim % 128 only),

forward-only and forward+backward (the backward is where the scatter-add
vs transposed-matmul difference shows).  Timings force a D2H sync
(``float``) because ``block_until_ready`` is unreliable through the dev
tunnel.

    python scripts/bloom_kernel_bench.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from spotlight_tpu.ops.kernels import bloom, multihot  # noqa: E402

B, K = 8192, 4


def timed(label, fn, *args, reps=20):
    out = fn(*args)
    float(jnp.asarray(out).ravel()[0])
    start = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.asarray(out).ravel()[0])
    ms = (time.perf_counter() - start) / reps * 1e3
    print('  {:34s} {:8.3f} ms'.format(label, ms), flush=True)
    return ms


def bench(num_rows, dim):
    print('C={} D={} (B={}, k={})'.format(num_rows, dim, B, K), flush=True)
    rs = np.random.RandomState(0)
    table = jnp.asarray(rs.randn(num_rows, dim), jnp.float32)
    rows = jnp.asarray(rs.randint(0, num_rows, (B, K)), jnp.int32)

    @jax.jit
    def xla_fwd(table, rows):
        return table[rows].sum(axis=-2)

    @jax.jit
    def mxu_fwd(table, rows):
        return multihot.multihot_gather_sum(table, rows)

    @jax.jit
    def xla_both(table, rows):
        def f(t):
            return (t[rows].sum(axis=-2) ** 2).sum()
        return jax.grad(f)(table)

    @jax.jit
    def mxu_both(table, rows):
        def f(t):
            return (multihot.multihot_gather_sum(t, rows) ** 2).sum()
        return jax.grad(f)(table)

    timed('xla gather+sum fwd', xla_fwd, table, rows)
    timed('mxu multihot fwd', mxu_fwd, table, rows)
    timed('xla fwd+bwd (scatter-add)', xla_both, table, rows)
    timed('mxu fwd+bwd (transposed matmul)', mxu_both, table, rows)

    if bloom.supported(dim):
        @jax.jit
        def dma_fwd(table, rows):
            return bloom.bloom_gather_sum(table, rows)
        timed('row-DMA kernel fwd', dma_fwd, table, rows)


def main():
    print('backend:', jax.default_backend(), flush=True)
    for num_rows in (4096, 16384, 65536, 262144):
        for dim in (64, 128):
            bench(num_rows, dim)


if __name__ == '__main__':
    main()
