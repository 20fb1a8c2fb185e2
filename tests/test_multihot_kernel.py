"""Multi-hot MXU bloom-lookup kernel vs the dense-formulation oracle.

Runs in Pallas interpret mode on the CPU conftest (the kernel itself is
exercised on real TPU by ``scripts/bloom_kernel_bench.py``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spotlight_tpu.ops.kernels.multihot import multihot_gather_sum


def _oracle(table, rows, mask_row_zero):
    vectors = np.asarray(table)[np.asarray(rows)]
    if mask_row_zero:
        vectors = np.where((np.asarray(rows) == 0)[..., None], 0.0, vectors)
    return vectors.sum(-2)


@pytest.mark.parametrize('batch, num_rows, dim, k, mask', [
    (37, 100, 16, 4, False),     # odd batch, tiny table
    (37, 100, 16, 4, True),      # row-0 padding mask
    (513, 1000, 64, 2, True),    # batch > one tile, odd table rows
    (64, 30, 8, 1, False),       # single hash
    (8, 4096, 128, 24, True),    # every reference seed
])
def test_forward_matches_oracle(batch, num_rows, dim, k, mask,
                                random_state):
    table = jnp.asarray(random_state.randn(num_rows, dim), jnp.float32)
    rows = jnp.asarray(random_state.randint(0, num_rows, (batch, k)),
                       jnp.int32)
    out = multihot_gather_sum(table, rows, mask, 512, 2048, True)
    # bf16 (hi, lo) two-pass: ~3e-6 relative; atol covers the k=24 sums.
    np.testing.assert_allclose(np.asarray(out),
                               _oracle(table, rows, mask),
                               rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize('mask', [False, True])
def test_gradient_matches_dense_transpose(mask, random_state):
    """The transposed-matmul backward equals XLA's scatter-add transpose
    of the dense gather+sum formulation, exactly (f32 one-hot)."""
    table = jnp.asarray(random_state.randn(300, 24), jnp.float32)
    rows = jnp.asarray(random_state.randint(0, 300, (129, 4)), jnp.int32)
    cotangent = jnp.asarray(random_state.randn(129, 24), jnp.float32)

    def kernel_loss(t):
        return (multihot_gather_sum(t, rows, mask, 512, 2048, True)
                * cotangent).sum()

    def dense_loss(t):
        v = t[rows]
        if mask:
            v = jnp.where((rows == 0)[..., None], 0.0, v)
        return (v.sum(-2) * cotangent).sum()

    np.testing.assert_allclose(np.asarray(jax.grad(kernel_loss)(table)),
                               np.asarray(jax.grad(dense_loss)(table)),
                               rtol=1e-6, atol=1e-6)


def test_duplicate_hashes_count_twice(random_state):
    """h_i(id) == h_j(id) must contribute the row twice (reference
    `layers.py:238-241` sums duplicates)."""
    table = jnp.asarray(random_state.randn(64, 8), jnp.float32)
    rows = jnp.asarray([[3, 3, 5, 7]], jnp.int32)
    out = multihot_gather_sum(table, rows, False, 512, 2048, True)
    expected = 2 * table[3] + table[5] + table[7]
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(expected),
                               rtol=2e-5, atol=2e-5)


def test_bfloat16_table_single_pass(random_state):
    table = jnp.asarray(random_state.randn(128, 16),
                        jnp.float32).astype(jnp.bfloat16)
    rows = jnp.asarray(random_state.randint(0, 128, (33, 4)), jnp.int32)
    out = multihot_gather_sum(table, rows, False, 512, 2048, True)
    assert out.dtype == jnp.bfloat16
    expected = np.asarray(table.astype(jnp.float32))[
        np.asarray(rows)].sum(-2)
    np.testing.assert_allclose(np.asarray(out.astype(jnp.float32)),
                               expected, rtol=2e-2, atol=2e-2)
