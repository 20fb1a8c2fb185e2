"""Pallas TPU kernel: bloom gather+sum as a multi-hot MXU matmul.

The bloom lookup ``sum_k table[h_k(id)]`` (reference:
`/root/reference/spotlight/layers.py:238-241`) is algebraically a matmul:

    out[b] = multihot[b] @ table,       multihot[b, c] = |{j : h_j(b) == c}|

and its gradient is the transposed matmul ``dtable = multihot.T @ dout`` —
exactly the scatter-add XLA derives, but on the MXU.

Why this beats the gather engine: a random HBM row fetch costs ~50-130 ns
*regardless of row width*, so the XLA formulation pays ``B * k`` latencies
per lookup.  Bloom tables are small by construction (that is their whole
point), so ``B x C x D`` MXU flops through a VMEM-resident one-hot tile —
which never exists in HBM; the XLA multi-hot formulation loses exactly
because it materializes the (B, C) matrix — undercut the latency bill by
an order of magnitude at production sizes (see docs/performance.md).

Duplicate hashes (h_i(id) == h_j(id)) produce a count of 2 in the
multi-hot, matching the double contribution of the gather formulation.
With ``mask_row_zero`` (the padding convention: PAD hashes to row 0 under
every seed, and any id colliding into row 0 contributes nothing), column 0
of the multi-hot is zeroed — the exact equivalent of the lookup-time
``where(rows == 0, 0, ...)`` mask, in both forward and backward.

The matmuls split the f32 table into a bf16 (hi, lo) pair and run two
bf16 MXU passes accumulating in f32: one-hot entries are small exact
integers, so each partial product is exact and the result carries ~16
mantissa bits of the table value — measured max relative error ~1e-6 vs
the f32 gather, far below the bf16 single-pass default XLA picks for f32
dots (~1e-2 at these scales).  bfloat16 tables run a single pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BATCH_TILE = 512
DEFAULT_TABLE_TILE = 2048

# Above this many compressed rows the MXU flop bill overtakes the gather
# engine's per-row latency (crossover measured in
# scripts/bloom_kernel_bench.py; see docs/performance.md).
MAX_MXU_ROWS = 65536


def _round_up(x, m):
    return -(-x // m) * m


def _multihot_tile(rows_blk, base, batch_tile, table_tile, num_hashes,
                   mask_row_zero, dtype):
    """(batch_tile, table_tile) multi-hot counts for this table block.

    rows_blk : (num_hashes, batch_tile) int32 hashed rows (global indices)
    base     : first table row of this block
    """
    iota = jax.lax.broadcasted_iota(
        jnp.int32, (batch_tile, table_tile), 1) + base
    oh = jnp.zeros((batch_tile, table_tile), dtype)
    for j in range(num_hashes):
        hit = rows_blk[j][:, None] == iota
        if mask_row_zero:
            hit &= iota != 0
        oh += hit.astype(dtype)
    return oh


def _fwd_kernel(rows_ref, table_ref, out_ref, *, batch_tile, table_tile,
                num_hashes, mask_row_zero):
    j = pl.program_id(1)
    base = j * table_tile

    oh = _multihot_tile(rows_ref[...], base, batch_tile, table_tile,
                        num_hashes, mask_row_zero, jnp.bfloat16)
    table = table_ref[...]
    if table.dtype == jnp.bfloat16:
        partial = jnp.dot(oh, table, preferred_element_type=jnp.float32)
    else:
        # Split the f32 table into bf16 (hi, lo) *inside* the kernel: at
        # the jnp level XLA's --xla_allow_excess_precision folds
        # ``x - f32(bf16(x))`` to zero, silently dropping the second pass
        # (observed: error jumps from ~4e-6 to ~2e-3); Mosaic performs no
        # such algebraic rewrite.
        hi = table.astype(jnp.bfloat16)
        lo = (table - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        partial = jnp.dot(oh, hi, preferred_element_type=jnp.float32)
        partial += jnp.dot(oh, lo, preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += partial


def _bwd_kernel(rows_ref, grad_ref, dtable_ref, *, batch_tile, table_tile,
                num_hashes, mask_row_zero):
    """dtable[c] = sum_b multihot[b, c] * grad[b] — transposed MXU matmul,
    accumulated over batch tiles (grid: (table_tiles, batch_tiles))."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    base = i * table_tile

    oh = _multihot_tile(rows_ref[...], base, batch_tile, table_tile,
                        num_hashes, mask_row_zero, jnp.float32)
    partial = jax.lax.dot_general(
        oh, grad_ref[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        dtable_ref[...] = jnp.zeros_like(dtable_ref)

    dtable_ref[...] += partial.astype(dtable_ref.dtype)


def _pad_rows(rows, batch_tile):
    """(B, k) -> (k, B_padded) transposed layout; padding ids hash to
    row -1 which matches no table row (and is distinct from the masked
    row 0)."""
    batch, num_hashes = rows.shape
    padded = _round_up(batch, batch_tile)
    rows_t = jnp.full((num_hashes, padded), -1, jnp.int32)
    return rows_t.at[:, :batch].set(rows.T.astype(jnp.int32)), padded


def _forward(table, rows, batch_tile, table_tile, mask_row_zero, interpret):
    batch, num_hashes = rows.shape
    num_rows, dim = table.shape

    rows_t, padded_batch = _pad_rows(rows, batch_tile)
    padded_rows = _round_up(num_rows, table_tile)
    if padded_rows != num_rows:
        table = jnp.concatenate(
            [table, jnp.zeros((padded_rows - num_rows, dim), table.dtype)])

    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, batch_tile=batch_tile, table_tile=table_tile,
            num_hashes=num_hashes, mask_row_zero=mask_row_zero),
        grid=(padded_batch // batch_tile, padded_rows // table_tile),
        in_specs=[
            pl.BlockSpec((num_hashes, batch_tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((table_tile, dim), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((batch_tile, dim), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded_batch, dim), jnp.float32),
        interpret=interpret,
    )(rows_t, table)
    return out[:batch].astype(table.dtype)


def _backward(grad, rows, num_rows, dim, dtype, batch_tile, table_tile,
              mask_row_zero, interpret):
    batch = rows.shape[0]
    num_hashes = rows.shape[1]

    rows_t, padded_batch = _pad_rows(rows, batch_tile)
    padded_rows = _round_up(num_rows, table_tile)
    if padded_batch != batch:
        grad = jnp.concatenate([
            grad, jnp.zeros((padded_batch - batch, dim), grad.dtype)])

    dtable = pl.pallas_call(
        functools.partial(
            _bwd_kernel, batch_tile=batch_tile, table_tile=table_tile,
            num_hashes=num_hashes, mask_row_zero=mask_row_zero),
        grid=(padded_rows // table_tile, padded_batch // batch_tile),
        in_specs=[
            pl.BlockSpec((num_hashes, batch_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, dim), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((table_tile, dim), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded_rows, dim), jnp.float32),
        interpret=interpret,
    )(rows_t, grad.astype(jnp.float32))
    return dtable[:num_rows].astype(dtype)


def supported(num_rows, platform=None):
    """The MXU formulation pays ``B * C * D`` flops to dodge ``B * k`` HBM
    row latencies; it wins while the compressed table is small (the bloom
    regime) and loses to the gather engine on huge tables."""
    if platform is None:
        platform = jax.default_backend()
    return platform == 'tpu' and num_rows <= MAX_MXU_ROWS


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def multihot_gather_sum(table, rows, mask_row_zero=False,
                        batch_tile=DEFAULT_BATCH_TILE,
                        table_tile=DEFAULT_TABLE_TILE,
                        interpret=False):
    """Fused ``table[rows].sum(-2)`` on the MXU.

    Parameters
    ----------
    table : (C, D) f32 or bf16 compressed embedding table
    rows : (B, k) int32 hashed row indices per id
    mask_row_zero : bool
        Zero every contribution that lands on row 0 (padding semantics,
        see :class:`~spotlight_tpu.ops.embeddings.BloomEmbedding`); the
        gradient to row 0 is likewise zero.

    Returns
    -------
    (B, D) summed embeddings, in ``table.dtype``.
    """
    table_tile = min(table_tile, _round_up(table.shape[0], 8))
    return _forward(table, rows, batch_tile, table_tile, mask_row_zero,
                    interpret)


def _vjp_fwd(table, rows, mask_row_zero, batch_tile, table_tile, interpret):
    out = multihot_gather_sum(table, rows, mask_row_zero, batch_tile,
                              table_tile, interpret)
    # The table itself is kept only for its (static) shape/dtype; it is
    # already live as the primal, so this stores no extra memory.
    return out, (rows, table)


def _vjp_bwd(mask_row_zero, batch_tile, table_tile, interpret, residuals,
             grad):
    rows, table = residuals
    table_tile = min(table_tile, _round_up(table.shape[0], 8))
    dtable = _backward(grad, rows, table.shape[0], table.shape[1],
                       table.dtype, batch_tile, table_tile, mask_row_zero,
                       interpret)
    return dtable, None


multihot_gather_sum.defvjp(_vjp_fwd, _vjp_bwd)
