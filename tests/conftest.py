"""Test configuration: run everything on a virtual 8-device CPU mesh.

Sharding/collective correctness is tested on forced host devices
(``--xla_force_host_platform_device_count=8``); the same statistical threshold
tests pass unchanged on real TPU hardware (set ``SPOTLIGHT_TPU=1`` to run the
suite against the default platform instead).

Note: the axon TPU plugin force-appends itself to ``jax_platforms`` during
import, overriding the ``JAX_PLATFORMS`` environment variable — so we pin the
platform via ``jax.config.update`` after importing jax.
"""

import os

_USE_TPU = bool(os.environ.get('SPOTLIGHT_TPU'))

if not _USE_TPU:
    flags = os.environ.get('XLA_FLAGS', '')
    if '--xla_force_host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (
            flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def random_state():
    return np.random.RandomState(42)
