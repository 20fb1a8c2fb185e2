"""Multi-host (multi-process) training support.

One JAX process per host, standard SPMD: every process runs the same
program; the mesh spans all hosts' devices and collectives ride ICI within a
slice and DCN across slices.  There is no launcher to port from the
reference — it has none (SURVEY.md §2.2); this is the standard JAX recipe.

Typical use::

    from spotlight_tpu.parallel import multihost, make_mesh

    multihost.initialize()                  # env-configured (TPU pods: automatic)
    mesh = make_mesh(model=8)               # spans all hosts' devices
    data = multihost.shard_host_data(mesh, interactions_slice)
    model = ImplicitFactorizationModel(mesh=mesh)
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def initialize(coordinator_address=None, num_processes=None,
               process_id=None):
    """Initialize the JAX distributed runtime.

    On TPU pods all arguments are discovered from the environment; on other
    platforms pass them explicitly.  Must be called before any jax
    computation, once per process.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs['coordinator_address'] = coordinator_address
    if num_processes is not None:
        kwargs['num_processes'] = num_processes
    if process_id is not None:
        kwargs['process_id'] = process_id
    jax.distributed.initialize(**kwargs)


def is_primary():
    """True on process 0 (use to gate logging / checkpoint writes)."""
    return jax.process_index() == 0


def global_batch_array(mesh, host_local, axis='data'):
    """Assemble a globally-sharded array from per-host local batch shards.

    Each process passes *its* slice of the batch (the data-parallel
    convention: disjoint per-host input pipelines); the result is one global
    array sharded over ``axis`` whose global leading dimension is
    ``num_processes * local_rows``.
    """
    host_local = np.asarray(host_local)
    sharding = NamedSharding(
        mesh, P(axis, *([None] * (host_local.ndim - 1))))
    return jax.make_array_from_process_local_data(sharding, host_local)
