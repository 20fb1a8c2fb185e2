"""Worker process for the 2-process multi-host integration test.

Launched by ``tests/test_multihost.py`` (not collected by pytest).  Each
process owns 4 virtual CPU devices; the two processes form one 8-device
``(data=2, model=4)`` mesh and run the full distributed estimator path —
sharded tables, cross-process gradient psum over gloo, sharded optimizer
state.  Emits one JSON line with the final epoch loss and an md5 digest
of the (reassembled-from-addressable-shards) item table so the driver can
assert bit-identity with the single-process run.
"""

import hashlib
import json
import sys

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_cpu_collectives_implementation', 'gloo')


def table_digest(array):
    """md5 of the global array reassembled from this process's addressable
    shards (every row block is replicated over the data axis, so each
    process can see the whole table)."""
    import numpy as np

    full = np.zeros(array.shape, dtype=array.dtype)
    covered = np.zeros(array.shape[0], dtype=bool)
    for shard in array.addressable_shards:
        full[shard.index] = np.asarray(shard.data)
        covered[shard.index[0]] = True
    assert covered.all(), 'process cannot see the full table'
    return hashlib.md5(full.tobytes()).hexdigest()


def main():
    coordinator, num_processes, process_id = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))

    from spotlight_tpu.parallel import multihost

    multihost.initialize(coordinator_address=coordinator,
                         num_processes=num_processes,
                         process_id=process_id)

    import numpy as np

    from spotlight_tpu.data import Interactions
    from spotlight_tpu.factorization import ImplicitFactorizationModel
    from spotlight_tpu.parallel import make_mesh

    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

    rs = np.random.RandomState(0)
    n = 512
    interactions = Interactions(
        rs.randint(0, 37, n).astype(np.int32),
        rs.randint(0, 53, n).astype(np.int32),
        num_users=37, num_items=53)

    mesh = make_mesh(data=2, model=4)
    model = ImplicitFactorizationModel(
        loss='bpr', embedding_dim=16, n_iter=2, batch_size=64, mesh=mesh,
        random_state=np.random.RandomState(42))
    model.fit(interactions)

    # Sequence path too: sharded fused item table + replicated LSTM tower
    # with cross-process gradient psum.
    from spotlight_tpu.data.interactions import SequenceInteractions
    from spotlight_tpu.sequence import ImplicitSequenceModel

    sequences = rs.randint(1, 53, size=(128, 6)).astype(np.int32)
    seq_model = ImplicitSequenceModel(
        loss='bpr', representation='lstm', embedding_dim=16, n_iter=2,
        batch_size=64, mesh=mesh, random_state=np.random.RandomState(42))
    seq_model.fit(SequenceInteractions(sequences, num_items=53))

    # Lazy (sparse=True) mesh engine: sharded moments, cross-process
    # all_gather of gradient rows over the data axis, per-shard sparse
    # Adam — the round-3 composition, under real multi-process gloo.
    lazy_model = ImplicitFactorizationModel(
        loss='bpr', embedding_dim=16, n_iter=2, batch_size=64, mesh=mesh,
        sparse=True, random_state=np.random.RandomState(42))
    lazy_model.fit(interactions)
    assert lazy_model._lazy

    loss = float(model._last_epoch_loss)
    print('MULTIHOST_RESULT ' + json.dumps({
        'process_id': process_id,
        'is_primary': multihost.is_primary(),
        'loss': loss,
        'item_table_md5': table_digest(
            model._params['item_embeddings']['weight']),
        'seq_loss': float(seq_model._last_epoch_loss),
        'seq_item_table_md5': table_digest(
            seq_model._params['item_embeddings']['weight']),
        'lazy_loss': float(lazy_model._last_epoch_loss),
        'lazy_item_table_md5': table_digest(
            lazy_model._params['item_embeddings']['weight']),
    }), flush=True)


if __name__ == '__main__':
    main()
