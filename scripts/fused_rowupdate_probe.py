"""Round-4 VERDICT item 4: probe a Pallas fused row-update kernel for the
training step's optimizer hot spot.

The dense production step's dominant cost is the backward scatter-add
(~0.4 ms) plus the dense Adam moment sweep (~0.35 ms) of a ~1.77 ms step
(docs/performance.md "In-scan attribution"; the reference's analogue is
the dense ``optimizer.step()``,
`/root/reference/spotlight/factorization/implicit.py:243`).  XLA-level
alternatives (sorted ids, unroll, hand Adam, id dedup) are measured dead
ends.  This probe builds the remaining untried formulation: ONE Pallas
kernel that walks the touched rows, and per row DMAs the param/mu/nu rows
in from HBM, applies the Adam update, and DMAs them back — no dense
gradient buffer, no table-sized sweep.

Mechanics: ``PrefetchScalarGridSpec`` with the row ids as the scalar
prefetch operand and data-dependent ``BlockSpec`` index maps
(``lambda i, ids: (ids[i], 0)``), so Mosaic's pipeline machinery issues
the row DMAs (the same substrate as the bloom gather kernel,
`ops/kernels/bloom.py`).  Tables alias in place via
``input_output_aliases``.  Duplicate ids are pre-summed outside (sort +
segment-sum, exactly what the lazy engine does) because parallel grid
windows touching one row would race.

Baselines at identical shapes:

- ``dense``: scatter-add occurrences into a dense table-sized gradient +
  full-table fused Adam sweep (what the production engine's autodiff+optax
  path lowers to);
- ``xla_lazy``: `ops.lazy_adam.sparse_adam_rows` (sort + segment-sum +
  row-indexed gathers/scatters through the hardware gather engine).

Run: ``python scripts/fused_rowupdate_probe.py [--interpret] [--quick]``
Prints one JSON line per variant.  A negative result is a result: the
round-1/2 probes measured per-row kernel DMA at ~90 ns/row vs the
hardware gather/scatter engines' ~47 ns/row, and this kernel needs 6
row-DMAs per touched row.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = '--interpret' in sys.argv
QUICK = '--quick' in sys.argv
REPS = 3 if QUICK else 20

B1, B2, EPS, LR = 0.9, 0.999, 1e-8, 1e-2


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timed(fn, readback, reps=REPS):
    out = fn()
    readback(out)
    start = time.perf_counter()
    for _ in range(reps):
        out = fn()
    readback(out)
    return (time.perf_counter() - start) / reps * 1e3


# --- Pallas fused row-update kernel -----------------------------------------

def _row_update_kernel(ids_ref, param_ref, mu_ref, nu_ref, grad_ref,
                       param_out, mu_out, nu_out, *, t):
    del ids_ref  # consumed by the index maps
    g = grad_ref[:]
    m = B1 * mu_ref[:] + (1 - B1) * g
    v = B2 * nu_ref[:] + (1 - B2) * g * g
    m_hat = m / (1 - B1 ** t)
    v_hat = v / (1 - B2 ** t)
    param_out[:] = param_ref[:] - LR * m_hat / (jnp.sqrt(v_hat) + EPS)
    mu_out[:] = m
    nu_out[:] = v


@functools.partial(jax.jit, static_argnames=('t', 'interpret'),
                   donate_argnums=(1, 2, 3))
def fused_row_update(ids, param, mu, nu, grads, t=5, interpret=False):
    """In-place Adam on the (unique) rows named by ``ids``.

    ids : (n,) int32, unique, in-bounds (pad with a scratch row id)
    param/mu/nu : (R, W) float32, W % 128 == 0 (HBM row-DMA alignment)
    grads : (n, W) float32 pre-summed row gradients

    Tables are viewed as (R, 1, W) so the per-row block is (1, 1, W):
    Mosaic requires the last two block dims to be (8k, 128k) or equal to
    the full array dims, and a row of a 2-D table fails that on real
    hardware (a (1, W) block).
    """
    n = ids.shape[0]
    num_rows, width = param.shape
    param3 = param.reshape(num_rows, 1, width)
    mu3 = mu.reshape(num_rows, 1, width)
    nu3 = nu.reshape(num_rows, 1, width)
    grads3 = grads.reshape(n, 1, width)

    def row_at_id(i, ids_ref):
        return (ids_ref[i], 0, 0)

    def row_at_i(i, ids_ref):
        del ids_ref
        return (i, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 1, width), row_at_id),   # param row
            pl.BlockSpec((1, 1, width), row_at_id),   # mu row
            pl.BlockSpec((1, 1, width), row_at_id),   # nu row
            pl.BlockSpec((1, 1, width), row_at_i),    # grad row
        ],
        out_specs=[
            pl.BlockSpec((1, 1, width), row_at_id),
            pl.BlockSpec((1, 1, width), row_at_id),
            pl.BlockSpec((1, 1, width), row_at_id),
        ],
    )
    kernel = functools.partial(_row_update_kernel, t=t)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((num_rows, 1, width),
                                        jnp.float32)] * 3,
        # Args are (ids, param, mu, nu, grads): tables alias outputs 0-2.
        input_output_aliases={1: 0, 2: 1, 3: 2},
        interpret=interpret,
    )(ids, param3, mu3, nu3, grads3)
    return tuple(o.reshape(num_rows, width) for o in out)


# --- Baselines ---------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=('t',), donate_argnums=(1, 2, 3))
def dense_update(occ_ids, param, mu, nu, occ_grads, t=5):
    """The production dense path at these shapes: scatter-add occurrences
    into a dense gradient, then the full-table fused Adam sweep."""
    grad = jnp.zeros_like(param).at[occ_ids].add(occ_grads)
    m = B1 * mu + (1 - B1) * grad
    v = B2 * nu + (1 - B2) * grad * grad
    m_hat = m / (1 - B1 ** t)
    v_hat = v / (1 - B2 ** t)
    param = param - LR * m_hat / (jnp.sqrt(v_hat) + EPS)
    return param, m, v


@functools.partial(jax.jit, static_argnames=('t',), donate_argnums=(1, 2, 3))
def xla_lazy_update(occ_ids, param, mu, nu, occ_grads, t=5):
    from spotlight_tpu.ops.lazy_adam import sparse_adam_rows
    return sparse_adam_rows(occ_ids, param, mu, nu, occ_grads,
                            jnp.int32(t), LR)


@jax.jit
def dedup_sum(occ_ids, occ_grads, n_out):
    """Sort + segment-sum occurrence rows (the lazy engine's dedup), and
    pad unique ids to a static width with the scratch row id."""
    num = occ_ids.shape[0]
    order = jnp.argsort(occ_ids)
    s_ids = occ_ids[order]
    head = jnp.concatenate([jnp.ones((1,), bool), s_ids[1:] != s_ids[:-1]])
    seg = jnp.cumsum(head) - 1
    uids = jax.ops.segment_max(s_ids, seg, num_segments=num)
    summed = jax.ops.segment_sum(occ_grads[order], seg, num_segments=num)
    valid = jnp.arange(num) < head.sum()
    uids = jnp.where(valid, uids, n_out)  # scratch row
    summed = jnp.where(valid[:, None], summed, 0.0)
    return uids.astype(jnp.int32), summed


def main():
    backend = jax.default_backend()
    interpret = INTERPRET or backend == 'cpu'
    rs = np.random.RandomState(0)

    shapes = [(100_000, 128, 24_576)]
    if not QUICK:
        shapes.append((2_000_000, 128, 24_576))

    for R, W, n_occ in shapes:
        # +8 scratch rows absorb the dedup padding's no-op updates.
        R_pad = R + 8
        if interpret and R > 200_000:
            continue
        param = jnp.asarray(rs.randn(R_pad, W), jnp.float32)
        mu = jnp.zeros((R_pad, W), jnp.float32)
        nu = jnp.zeros((R_pad, W), jnp.float32)
        occ_ids = jnp.asarray(rs.randint(0, R, n_occ), jnp.int32)
        occ_grads = jnp.asarray(rs.randn(n_occ, W) * 1e-2, jnp.float32)

        # Correctness first (interpret mode or small chip run).
        uids, summed = dedup_sum(occ_ids, occ_grads, R_pad - 1)
        p1, m1, v1 = fused_row_update(uids, param.copy(), mu.copy(),
                                      nu.copy(), summed, interpret=interpret)
        p2, m2, v2 = xla_lazy_update(occ_ids, param.copy(), mu.copy(),
                                     nu.copy(), occ_grads)
        err = float(jnp.max(jnp.abs(p1[:R] - p2[:R])))
        emit(variant='parity', R=R, max_abs_err=err)

        if interpret:
            continue

        def run_dense():
            return dense_update(occ_ids, param.copy(), mu.copy(), nu.copy(),
                                occ_grads)

        def run_xla_lazy():
            return xla_lazy_update(occ_ids, param.copy(), mu.copy(),
                                   nu.copy(), occ_grads)

        def run_fused():
            u, s = dedup_sum(occ_ids, occ_grads, R_pad - 1)
            return fused_row_update(u, param.copy(), mu.copy(), nu.copy(), s)

        def run_fused_nodedup():
            # Kernel cost alone (ids pre-deduped outside the timed loop).
            return fused_row_update(uids, param.copy(), mu.copy(),
                                    nu.copy(), summed)

        for name, fn in [('dense', run_dense), ('xla_lazy', run_xla_lazy),
                         ('pallas_fused', run_fused),
                         ('pallas_kernel_only', run_fused_nodedup)]:
            ms = timed(fn, lambda out: float(jnp.asarray(out[0][0, 0])))
            emit(variant=name, R=R, W=W, n_occ=n_occ, ms=round(ms, 3),
                 ns_per_occ_row=round(ms * 1e6 / n_occ, 1))


if __name__ == '__main__':
    main()
