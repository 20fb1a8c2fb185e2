"""Device mesh construction helpers."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(data=None, model=None, devices=None):
    """Build a ``Mesh(('data', 'model'))`` over the available devices.

    Parameters
    ----------
    data, model : int, optional
        Axis sizes.  If only one is given, the other is inferred from the
        device count; if neither, all devices go to the ``data`` axis.
    devices : list of jax devices, optional

    Returns
    -------
    jax.sharding.Mesh
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)

    if data is None and model is None:
        data, model = n, 1
    elif data is None:
        if n % model:
            raise ValueError('Device count {} not divisible by model={}'
                             .format(n, model))
        data = n // model
    elif model is None:
        if n % data:
            raise ValueError('Device count {} not divisible by data={}'
                             .format(n, data))
        model = n // data

    if data * model != n:
        raise ValueError('data * model = {} != {} devices'
                         .format(data * model, n))

    device_grid = np.asarray(devices).reshape(data, model)
    return Mesh(device_grid, axis_names=('data', 'model'))
