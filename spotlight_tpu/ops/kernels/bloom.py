"""Pallas TPU kernel: fused multi-hash bloom embedding gather.

Replaces the reference's hash-table-gather-then-sum
(`/root/reference/spotlight/layers.py:206-244`): for each id, ``k`` hashed
rows of the compressed table are fetched and summed.  The XLA lowering of
``table[rows].sum(-2)`` materializes the ``(batch, k, dim)`` intermediate in
HBM before reducing; this kernel streams each row through VMEM with
double-buffered DMAs and accumulates in registers, so HBM traffic is exactly
``batch * k`` row reads plus one ``(batch, dim)`` write.

The hashes themselves are computed on the fly *outside* the kernel (about a
dozen fused integer ops per id, see
:func:`spotlight_tpu.ops.hashing.bloom_hash_jnp`) — there is no precomputed
hash table anywhere.

Gradients: the kernel is wrapped in a ``custom_vjp`` whose backward pass is
the natural XLA scatter-add of the output cotangent into the ``k`` hashed
rows — identical to the transpose XLA derives for the dense formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_NUM_BUFFERS = 8  # DMA pipeline depth (row fetches are latency-bound)


def _bloom_gather_kernel(rows_ref, table_ref, out_ref, scratch, sems, *,
                         tile_batch, num_hashes):
    """Grid step over batch tiles: sum k table rows per id.

    Refs:
        rows_ref  : (B * k,) int32 scalar-prefetch (SMEM) — hashed row ids,
                    flattened (2-D SMEM operands get lane-padded to 128)
        table_ref : (C, D) HBM — compressed table, DMA'd row by row
        out_ref   : (TILE, D) VMEM — output block for this grid step
        scratch   : (2, D) VMEM — double buffer for row DMAs
        sems      : (2,) DMA semaphores
    """
    step = pl.program_id(0)
    base = step * tile_batch
    total = tile_batch * num_hashes

    def row_dma(slot, flat_idx):
        row = rows_ref[base * num_hashes + flat_idx]
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(row, 1), :],
            scratch.at[pl.ds(slot, 1), :],
            sems.at[slot],
        )

    # Warm up the pipeline: keep _NUM_BUFFERS row fetches in flight.
    for ahead in range(_NUM_BUFFERS - 1):
        @pl.when(ahead < total)
        def _(ahead=ahead):
            row_dma(ahead % _NUM_BUFFERS, ahead).start()

    def body(flat_idx, acc):
        slot = flat_idx % _NUM_BUFFERS
        prefetch_idx = flat_idx + _NUM_BUFFERS - 1

        @pl.when(prefetch_idx < total)
        def _():
            row_dma(prefetch_idx % _NUM_BUFFERS, prefetch_idx).start()

        row_dma(slot, flat_idx).wait()
        acc = acc + scratch[slot, :]

        @pl.when(flat_idx % num_hashes == num_hashes - 1)
        def _():
            out_ref[pl.ds(flat_idx // num_hashes, 1), :] = acc[None, :]

        return jnp.where(flat_idx % num_hashes == num_hashes - 1,
                         jnp.zeros_like(acc), acc)

    jax.lax.fori_loop(0, total, body,
                      jnp.zeros((out_ref.shape[1],), dtype=out_ref.dtype))


def _bloom_gather_forward(table, rows, tile_batch, interpret):
    batch, num_hashes = rows.shape
    dim = table.shape[1]

    padded_batch = pl.cdiv(batch, tile_batch) * tile_batch
    pad = padded_batch - batch
    if pad:
        rows = jnp.concatenate(
            [rows, jnp.zeros((pad, num_hashes), rows.dtype)])
    rows = rows.reshape(-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(padded_batch // tile_batch,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # table stays in HBM
        ],
        # index_map receives the scalar-prefetch ref as a trailing arg.
        out_specs=pl.BlockSpec((tile_batch, dim), lambda i, _rows: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_NUM_BUFFERS, dim), table.dtype),
            pltpu.SemaphoreType.DMA((_NUM_BUFFERS,)),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_bloom_gather_kernel,
                          tile_batch=tile_batch, num_hashes=num_hashes),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((padded_batch, dim), table.dtype),
        interpret=interpret,
    )(rows.astype(jnp.int32), table)
    return out[:batch]


def supported(embedding_dim):
    """Mosaic HBM row-DMA requires the lane dimension to be a multiple of
    the 128-lane tile; narrower tables fall back to the XLA gather."""
    return embedding_dim % 128 == 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def bloom_gather_sum(table, rows, tile_batch=256, interpret=False):
    """Fused ``table[rows].sum(-2)``.

    Parameters
    ----------
    table : (C, D) float — compressed embedding table; D must satisfy
        :func:`supported` (multiple of 128) on real TPU hardware
    rows : (B, k) int32 — hashed row indices per id
    tile_batch : int — ids processed per grid step

    Returns
    -------
    (B, D) summed embeddings
    """
    return _bloom_gather_forward(table, rows, tile_batch, interpret)


def _fwd(table, rows, tile_batch, interpret):
    return _bloom_gather_forward(table, rows, tile_batch, interpret), (
        rows, table.shape)


def _bwd(tile_batch, interpret, residuals, grad):
    rows, table_shape = residuals
    # Transpose: scatter-add the cotangent into each hashed row (XLA's
    # native scatter path; the same transpose it derives for the dense
    # gather+sum formulation).
    flat_rows = rows.reshape(-1)
    tiled_grad = jnp.repeat(grad, rows.shape[1], axis=0)
    dtable = jnp.zeros(table_shape, grad.dtype).at[flat_rows].add(tiled_grad)
    return dtable, None


bloom_gather_sum.defvjp(_fwd, _bwd)
