"""Shared training machinery for the sklearn-style estimators.

The reference's training loop shuffles on the host, copies every minibatch to
the device, and syncs the loss back per batch
(`/root/reference/spotlight/factorization/implicit.py:210-248`).  The
TPU-native loop here instead:

- pads the dataset once to a whole number of minibatches (static shapes),
- keeps it on device across epochs,
- runs one *jitted epoch*: an on-device shuffle (``jax.random.permutation``)
  followed by a ``lax.scan`` over minibatches, with negative sampling keys
  split per batch inside the scan,
- transfers a single scalar (the epoch loss) back per epoch, preserving the
  reference's degenerate-loss guard semantics.

Optimizers are optax transformations.  The default matches the reference's
``optim.Adam(params, weight_decay=l2, lr=learning_rate)``: torch's Adam adds
the decay term to the gradient *before* the moment updates, which corresponds
to ``optax.chain(add_decayed_weights(l2), adam(lr))`` (not decoupled AdamW).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
import optax


def make_optimizer(learning_rate, l2, optimizer_func=None):
    """Build the optax optimizer.

    ``optimizer_func`` mirrors the reference's escape hatch: it may be an
    ``optax.GradientTransformation`` or a zero-argument callable returning
    one; if supplied it overrides ``l2`` and ``learning_rate``.
    """
    if optimizer_func is not None:
        if callable(optimizer_func) and not isinstance(
                optimizer_func, optax.GradientTransformation):
            try:
                return optimizer_func()
            except TypeError as error:
                raise TypeError(
                    'optimizer_func must be an optax.GradientTransformation '
                    'or a zero-argument callable returning one (unlike the '
                    'torch reference, it does not receive parameters): {}'
                    .format(error)) from error
        return optimizer_func
    transforms = []
    if l2:
        transforms.append(optax.add_decayed_weights(l2))
    transforms.append(optax.adam(learning_rate))
    return optax.chain(*transforms)


def key_from_random_state(random_state):
    """Derive a jax PRNG key from a numpy RandomState (reference seeds torch
    from the RandomState the same way, `implicit.py:115-116`)."""
    return jax.random.PRNGKey(
        int(random_state.randint(0, 2 ** 31 - 1)))


def pad_to_batches(n, batch_size):
    """Return (padded_length, num_batches) for a dataset of ``n`` rows."""
    num_batches = -(-n // batch_size)
    return num_batches * batch_size, num_batches


def pad_array(array, padded_length):
    """Pad the leading axis with zeros up to ``padded_length``."""
    pad = padded_length - array.shape[0]
    if pad == 0:
        return array
    pad_width = [(0, pad)] + [(0, 0)] * (array.ndim - 1)
    return np.pad(array, pad_width)


def valid_mask(n, padded_length):
    mask = np.zeros(padded_length, dtype=np.float32)
    mask[:n] = 1.0
    return mask


def shuffle_and_batch(perm_key, data, n_valid, num_batches, batch_size):
    """On-device epoch shuffle.

    Returns the shuffled ``data`` reshaped to ``(num_batches, batch_size,
    ...)`` with a ``'mask'`` entry added.  The row-validity mask (rows past
    ``n_valid`` are padding) is *derived from the permutation itself*
    (``perm < n_valid``) rather than stored and gathered: element gathers
    are HBM-latency-bound on TPU, so skipping the mask gather saves a third
    of the shuffle cost — and the mask array never has to cross the
    host-to-device link at all.
    """
    padded_length = num_batches * batch_size
    perm = jax.random.permutation(perm_key, padded_length)
    batched = {
        name: value[perm].reshape(
            (num_batches, batch_size) + value.shape[1:])
        for name, value in data.items()}
    batched['mask'] = (perm < n_valid).astype(jnp.float32).reshape(
        (num_batches, batch_size))
    return batched


def epoch_scan(params, opt_state, key, data, n_valid, num_batches,
               batch_size, batch_loss_fn, optimizer):
    """One full training epoch as a single traced computation.

    Parameters
    ----------
    data : dict of arrays with leading axis ``num_batches * batch_size``
        Must include every tensor the loss needs.  A ``'mask'`` entry
        marking valid (non-padding) rows is synthesized from ``n_valid``.
    n_valid : int or scalar
        Number of real rows; trailing rows are padding.
    batch_loss_fn : callable(params, batch_dict, key) -> scalar loss
    optimizer : optax.GradientTransformation

    Returns
    -------
    (params, opt_state, epoch_loss)
    """
    perm_key, negatives_key = jax.random.split(key)
    batched = shuffle_and_batch(perm_key, data, n_valid, num_batches,
                                batch_size)
    batch_keys = jax.random.split(negatives_key, num_batches)

    grad_fn = jax.value_and_grad(batch_loss_fn)

    def step(carry, batch_and_key):
        params, opt_state = carry
        batch, batch_key = batch_and_key
        loss, grads = grad_fn(params, batch, batch_key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    (params, opt_state), losses = jax.lax.scan(
        step, (params, opt_state), (batched, batch_keys))
    return params, opt_state, jnp.mean(losses)


def placed_data_cached(owner, arrays, mesh, build=None):
    """Device placement of a fit's epoch data, cached across ``fit()``
    calls on the same bytes.

    The per-fit host-to-device copy is a real cost through slow links
    (the dev tunnel moves H2D at ~30 MB/s: ~120 ms for a 4 MB sequence
    matrix, ~12 ms/epoch of a 10-epoch fit), and the documented
    resume-training workflow (`fit()` called repeatedly) re-uploads
    identical data every call.  The cache key is a **content hash** of
    the host arrays (blake2b over the raw bytes, ~5 ms for 8 MB — an
    identity-based key would silently train on stale data if the caller
    mutated an array in place), so a hit is always byte-safe.

    ``build(placed)`` optionally derives extra device columns (e.g. the
    in-batch negative-weight gather); its output is what gets cached.

    Above 64 MB of host arrays the cache is bypassed (plain placement):
    hashing scales with the data while the copy it saves is one-time, so
    at 10M-interaction scale the per-fit hash would cost more than a
    real-hardware H2D copy.
    """
    import hashlib

    total_bytes = sum(np.asarray(a).nbytes for a in arrays.values())
    if total_bytes > (64 << 20):
        data = place_data(arrays, mesh)
        return build(data) if build is not None else data

    digest = hashlib.blake2b(digest_size=16)
    for name in sorted(arrays):
        array = np.ascontiguousarray(arrays[name])
        digest.update(name.encode())
        digest.update(str(array.dtype).encode())
        digest.update(str(array.shape).encode())
        digest.update(array.tobytes())
    key = digest.digest()

    # The mesh participates in the key by *live identity* — the entry
    # holds a reference to the mesh object itself, so a replaced (and
    # garbage-collected) mesh can never produce a false hit through a
    # recycled id().
    cache = getattr(owner, '_placed_data_cache', None)
    if cache is not None and cache[0] == key and cache[1] is mesh:
        return cache[2]
    data = place_data(arrays, mesh)
    if build is not None:
        data = build(data)
    owner._placed_data_cache = (key, mesh, data)
    return data


def place_data(data, mesh):
    """Place epoch data arrays for the mesh (or default device).

    With a mesh, the id/mask arrays are explicitly replicated across all
    chips up front: they are small (ints per interaction), and replication
    means the per-batch shard_map slices never pull data from one source
    chip mid-epoch.
    """
    if mesh is None:
        return {name: jnp.asarray(value) for name, value in data.items()}

    from jax.sharding import NamedSharding, PartitionSpec

    sharding = NamedSharding(mesh, PartitionSpec())
    return {name: jax.device_put(np.asarray(value), sharding)
            for name, value in data.items()}


def build_epoch_fn(elems_fn, optimizer, num_batches, batch_size,
                   mesh=None, param_specs=None, opt_specs=None,
                   exchange='psum'):
    """Compile an epoch function from an elementwise-loss builder.

    ``elems_fn(params, batch, key) -> (elementwise_loss, mask)``; the
    reduction (masked mean) is applied here so the same builder serves both
    the single-device scan and the mesh-distributed scan (which needs the
    mask denominator psum-ed across data shards).
    """
    if mesh is None:
        def batch_loss(params, batch, key):
            elems, mask = elems_fn(params, batch, key)
            mask = mask.astype(elems.dtype)
            return jnp.sum(elems * mask) / jnp.maximum(jnp.sum(mask), 1.0)

        # Donating params/opt_state lets XLA update embedding tables in
        # place instead of double-buffering them in HBM.
        @functools.partial(jax.jit, donate_argnums=(0, 1),
                           static_argnums=(4,))
        def epoch_fn(params, opt_state, key, data, n_valid):
            return epoch_scan(params, opt_state, key, data, n_valid,
                              num_batches, batch_size, batch_loss, optimizer)

        return epoch_fn

    from spotlight_tpu.parallel.training import epoch_scan_distributed

    @functools.partial(jax.jit, donate_argnums=(0, 1), static_argnums=(4,))
    def epoch_fn(params, opt_state, key, data, n_valid):
        return epoch_scan_distributed(
            params, opt_state, key, data, n_valid, num_batches, batch_size,
            elems_fn, optimizer, mesh, param_specs, opt_specs,
            exchange=exchange)

    return epoch_fn


class EpochLossDrain:
    """Depth-1 pipelined epoch-loss readback.

    Reading an on-device scalar back to the host costs a full round trip
    (~33 ms through the dev tunnel); doing it synchronously after every
    epoch serializes host sync against device work.  This helper holds
    each epoch's device loss until the *next* epoch has been dispatched,
    so the readback overlaps device compute.  The reference's
    degenerate-loss guard (`factorization/implicit.py:250-252`) still
    raises inside ``fit`` with the offending epoch's loss — at most one
    extra (discarded-quality) epoch of device work is dispatched first.
    """

    def __init__(self, verbose=False):
        self._verbose = verbose
        self._pending = None
        self.last_loss = None

    def _drain(self):
        epoch_num, device_loss = self._pending
        self._pending = None
        epoch_loss = float(device_loss)
        self.last_loss = epoch_loss
        if self._verbose:
            print('Epoch {}: loss {}'.format(epoch_num, epoch_loss))
        check_degenerate(epoch_loss)

    def push(self, epoch_num, device_loss):
        """Register this epoch's (still on-device) loss; reads back and
        checks the previous epoch's."""
        if self._pending is not None:
            self._drain()
        self._pending = (epoch_num, device_loss)

    def finish(self):
        if self._pending is not None:
            self._drain()


def check_degenerate(epoch_loss):
    """Raise on non-finite or exactly-zero epoch loss.

    Superset of the reference guard (`factorization/implicit.py:250-252`,
    NaN or 0.0): under XLA a diverging f32 loss can saturate at ``inf``
    without ever producing the NaN that torch's eager arithmetic would, so
    ``inf`` is treated as degenerate too.
    """
    if not np.isfinite(epoch_loss) or epoch_loss == 0.0:
        raise ValueError('Degenerate epoch loss: {}'.format(epoch_loss))
