"""Bit-parity tests for murmurhash against scikit-learn's Cython version."""

import numpy as np
import pytest
from sklearn.utils import murmurhash3_32 as sk_murmurhash3_32

from spotlight_tpu.ops.hashing import (SEEDS, bloom_hash_jnp, murmurhash3_32,
                                       murmurhash3_32_jnp)


@pytest.mark.parametrize('seed', [0, 42, SEEDS[0], SEEDS[23]])
def test_numpy_parity_with_sklearn(seed, random_state):
    keys = random_state.randint(-2 ** 31, 2 ** 31 - 1,
                                size=1000).astype(np.int32)
    ours = murmurhash3_32(keys, seed=seed)
    theirs = np.array([sk_murmurhash3_32(int(k), seed=seed) for k in keys],
                      dtype=np.int32)
    assert np.array_equal(ours, theirs)

    ours_pos = murmurhash3_32(keys, seed=seed, positive=True)
    theirs_pos = np.array(
        [sk_murmurhash3_32(int(k), seed=seed, positive=True) for k in keys],
        dtype=np.uint32)
    assert np.array_equal(ours_pos, theirs_pos)


def test_jnp_matches_numpy(random_state):
    import jax.numpy as jnp

    keys = random_state.randint(-2 ** 31, 2 ** 31 - 1,
                                size=1000).astype(np.int32)
    for seed in (0, SEEDS[3]):
        ours = np.asarray(murmurhash3_32_jnp(jnp.asarray(keys), seed))
        expected = murmurhash3_32(keys, seed=seed, positive=True)
        assert np.array_equal(ours, expected)


def test_bloom_hash_matches_reference_table(random_state):
    """The on-the-fly hash must agree with the reference's precomputed
    table semantics (`/root/reference/spotlight/layers.py:188-198`)."""
    import jax.numpy as jnp

    num_embeddings, compressed, num_hashes = 500, 100, 4
    # Reference-style precomputed table.
    indices = np.arange(num_embeddings, dtype=np.int32)
    table = []
    for seed in SEEDS[:num_hashes]:
        # Signed hash + numpy modulo, exactly as the reference's
        # `_get_hashed_indices` (`layers.py:178-186`) computes its table.
        hashed = murmurhash3_32(indices, seed=seed)
        hashed[0] = 0  # padding idx hashes to 0
        table.append(hashed % compressed)
    table = np.stack(table, axis=1).astype(np.int64)
    assert table[0].sum() == 0

    ids = random_state.randint(0, num_embeddings, size=200).astype(np.int32)
    ours = np.asarray(
        bloom_hash_jnp(jnp.asarray(ids), num_hashes, compressed,
                       padding_idx=0))
    assert np.array_equal(ours, table[ids])
