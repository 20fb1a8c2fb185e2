"""Negative item sampling.

The reference samples negatives on the host with numpy once per minibatch and
copies them to the device (`/root/reference/spotlight/sampling.py:8`,
`/root/reference/spotlight/factorization/implicit.py:254-262`) — a per-batch
host-to-device round trip.  The TPU-native training loops instead sample
negatives *on device* with ``jax.random`` inside the jitted epoch step, one key
split per minibatch, so sampling fuses into the training computation and never
touches the host.

The host-side ``sample_items`` is kept for API parity and host-side workflows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def sample_items(num_items, shape, random_state=None):
    """Uniformly sample item ids on the host (API parity helper).

    Parameters
    ----------
    num_items : int
        Sampled ids are drawn from ``[0, num_items)``.
    shape : int or tuple of int
    random_state : np.random.RandomState, optional

    Returns
    -------
    np.ndarray of int64
    """
    if random_state is None:
        random_state = np.random.RandomState()
    return random_state.randint(0, num_items, shape, dtype=np.int64)


def sample_items_device(key, num_items, shape):
    """Uniformly sample item ids on device (traceable).

    Parameters
    ----------
    key : jax.random key
    num_items : int (static)
    shape : tuple of int (static)

    Returns
    -------
    jnp.ndarray of int32
    """
    return jax.random.randint(key, shape, 0, num_items, dtype=jnp.int32)
