"""Vectorized MurmurHash3 (32-bit) for bloom embeddings and user-based splits.

The reference delegates hashing to scikit-learn's Cython ``murmurhash3_32``
(`/root/reference/spotlight/layers.py:7,183`,
`/root/reference/spotlight/cross_validation.py:7,148`).  On TPU, hashing is a
handful of integer ALU ops, so instead of precomputing a
``num_embeddings x num_hashes`` table on the host (reference
`layers.py:188-198`), we hash ids *on the fly inside jitted code* with a jnp
implementation.  A vectorized numpy twin is provided for host-side use (data
splits) and for bit-parity tests against scikit-learn.

Both implementations are bit-exact with sklearn's ``murmurhash3_32`` for
int32 keys (the only key type the reference uses).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# The 24 fixed prime seeds used by the reference's bloom embeddings
# (`/root/reference/spotlight/layers.py:13-20`).
SEEDS = (
    179424941, 179425457, 179425907, 179426369,
    179424977, 179425517, 179425943, 179426407,
    179424989, 179425529, 179425993, 179426447,
    179425003, 179425537, 179426003, 179426453,
    179425019, 179425559, 179426029, 179426491,
    179425027, 179425579, 179426081, 179426549,
)

_C1 = 0xCC9E2D51
_C2 = 0x1B873593


def murmurhash3_32(keys, seed=0, positive=False):
    """MurmurHash3 32-bit hash of int32 keys (vectorized numpy, host-side).

    Bit-compatible with ``sklearn.utils.murmurhash3_32`` on int32 inputs.

    Parameters
    ----------
    keys : array-like of int32
    seed : int
    positive : bool
        If True, return uint32 values; otherwise int32 (two's complement).
    """
    k = np.asarray(keys).astype(np.uint32)
    with np.errstate(over='ignore'):
        k = (k * _C1) & 0xFFFFFFFF
        k = ((k << np.uint32(15)) | (k >> np.uint32(17))) & 0xFFFFFFFF
        k = (k * _C2) & 0xFFFFFFFF

        h = np.uint32(seed & 0xFFFFFFFF) ^ k
        h = ((h << np.uint32(13)) | (h >> np.uint32(19))) & 0xFFFFFFFF
        h = (h * np.uint32(5) + np.uint32(0xE6546B64)) & 0xFFFFFFFF

        # Finalization: fold in the key length (4 bytes) and avalanche.
        h ^= np.uint32(4)
        h ^= h >> np.uint32(16)
        h = (h * np.uint32(0x85EBCA6B)) & 0xFFFFFFFF
        h ^= h >> np.uint32(13)
        h = (h * np.uint32(0xC2B2AE35)) & 0xFFFFFFFF
        h ^= h >> np.uint32(16)

    if positive:
        return h
    return h.astype(np.int32)


def murmurhash3_32_jnp(keys, seed):
    """MurmurHash3 32-bit hash of int32 keys, traceable jax version.

    Runs on-device inside jitted code; XLA fuses the ~12 integer ops into
    surrounding computation, so hashing ids costs essentially nothing compared
    to the embedding-row gathers they feed.

    Returns uint32 hashes.
    """
    k = keys.astype(jnp.uint32)
    k = k * jnp.uint32(_C1)
    k = (k << jnp.uint32(15)) | (k >> jnp.uint32(17))
    k = k * jnp.uint32(_C2)

    h = jnp.uint32(seed & 0xFFFFFFFF) ^ k
    h = (h << jnp.uint32(13)) | (h >> jnp.uint32(19))
    h = h * jnp.uint32(5) + jnp.uint32(0xE6546B64)

    h = h ^ jnp.uint32(4)
    h = h ^ (h >> jnp.uint32(16))
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> jnp.uint32(13))
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> jnp.uint32(16))
    return h


def bloom_hash_jnp(ids, num_hashes, compressed_size, padding_idx=0):
    """Map ids to ``num_hashes`` bloom rows each, on the fly, on device.

    Matches the reference's precomputed hash table semantics
    (`/root/reference/spotlight/layers.py:178-198`): id ``padding_idx`` maps
    to row 0 under every hash function; all other ids map to
    ``murmurhash3_32(id, SEEDS[j]) % compressed_size`` where the hash is the
    *signed* int32 value and ``%`` follows numpy's sign-of-divisor semantics
    (the reference feeds sklearn's signed hash through numpy ``%``), so a
    bloom model trained here maps ids to the same compressed rows as one
    trained with the reference.

    Parameters
    ----------
    ids : int array of any shape
    num_hashes : int (static)
    compressed_size : int (static)
    padding_idx : int or None (static)

    Returns
    -------
    int32 array of shape ``ids.shape + (num_hashes,)``
    """
    ids = ids.astype(jnp.int32)
    hashes = jnp.stack(
        [murmurhash3_32_jnp(ids, seed) for seed in SEEDS[:num_hashes]],
        axis=-1)
    # Reinterpret as signed int32 and use Python/numpy modulo (result takes
    # the divisor's sign, i.e. non-negative here) — bit-identical to the
    # reference's `signed_hash % compressed_num_embeddings`.
    rows = jnp.mod(hashes.astype(jnp.int32), jnp.int32(compressed_size))
    if padding_idx is not None:
        rows = jnp.where((ids == padding_idx)[..., None], 0, rows)
    return rows
