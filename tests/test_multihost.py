"""Multi-host support: single-process helpers + a real 2-process run.

The 2-process test spawns two ``jax.distributed`` CPU workers (gloo
collectives, 4 virtual devices each) forming one 8-device mesh, runs the
full distributed estimator path with cross-process gradient psums, and
asserts bit-identity with the same training run on a single-process
8-device mesh.
"""

import hashlib
import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from spotlight_tpu.parallel import make_mesh, multihost


def test_is_primary_single_process():
    assert multihost.is_primary()


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 devices')
def test_global_batch_array_single_process():
    mesh = make_mesh(data=2, model=4)
    local = np.arange(32, dtype=np.float32).reshape(16, 2)
    global_arr = multihost.global_batch_array(mesh, local)
    assert global_arr.shape == (16, 2)
    np.testing.assert_array_equal(np.asarray(global_arr), local)
    # Sharded over the data axis.
    assert len(global_arr.sharding.device_set) == 8


def _free_port():
    with socket.socket() as sock:
        sock.bind(('localhost', 0))
        return sock.getsockname()[1]


def _single_process_reference():
    """The worker's exact training run on this process's 8-device mesh."""
    from spotlight_tpu.data import Interactions
    from spotlight_tpu.factorization import ImplicitFactorizationModel

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
    weight = np.asarray(model._params['item_embeddings']['weight'])

    from spotlight_tpu.data.interactions import SequenceInteractions
    from spotlight_tpu.sequence import ImplicitSequenceModel

    sequences = rs.randint(1, 53, size=(128, 6)).astype(np.int32)
    seq_model = ImplicitSequenceModel(
        loss='bpr', representation='lstm', embedding_dim=16, n_iter=2,
        batch_size=64, mesh=mesh, random_state=np.random.RandomState(42))
    seq_model.fit(SequenceInteractions(sequences, num_items=53))
    seq_weight = np.asarray(
        seq_model._params['item_embeddings']['weight'])

    lazy_model = ImplicitFactorizationModel(
        loss='bpr', embedding_dim=16, n_iter=2, batch_size=64, mesh=mesh,
        sparse=True, random_state=np.random.RandomState(42))
    lazy_model.fit(interactions)
    assert lazy_model._lazy
    lazy_weight = np.asarray(
        lazy_model._params['item_embeddings']['weight'])
    return (model._last_epoch_loss,
            hashlib.md5(weight.tobytes()).hexdigest(),
            seq_model._last_epoch_loss,
            hashlib.md5(seq_weight.tobytes()).hexdigest(),
            lazy_model._last_epoch_loss,
            hashlib.md5(lazy_weight.tobytes()).hexdigest())


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 devices')
def test_two_process_training_matches_single_process(tmp_path):
    worker = os.path.join(os.path.dirname(__file__), 'multihost_worker.py')
    coordinator = 'localhost:{}'.format(_free_port())
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    env = dict(os.environ)
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
    env['PYTHONPATH'] = repo_root + os.pathsep + env.get('PYTHONPATH', '')

    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, '2', str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=str(tmp_path))
        for pid in range(2)
    ]
    outputs = []
    for proc in procs:
        out, _ = proc.communicate(timeout=420)
        outputs.append(out)
    for proc, out in zip(procs, outputs):
        assert proc.returncode == 0, out[-3000:]

    results = {}
    for out in outputs:
        lines = [line for line in out.splitlines()
                 if line.startswith('MULTIHOST_RESULT ')]
        assert len(lines) == 1, out[-3000:]
        record = json.loads(lines[0][len('MULTIHOST_RESULT '):])
        results[record['process_id']] = record

    assert set(results) == {0, 1}
    assert results[0]['is_primary'] and not results[1]['is_primary']

    (ref_loss, ref_digest,
     ref_seq_loss, ref_seq_digest,
     ref_lazy_loss, ref_lazy_digest) = _single_process_reference()

    # Both processes observed the same replicated loss and table; both
    # match the single-process run bit-for-bit — for the factorization,
    # the sequence (LSTM tower), AND the lazy (sparse=True) engines.
    for record in results.values():
        assert record['loss'] == ref_loss, (record, ref_loss)
        assert record['item_table_md5'] == ref_digest, record
        assert record['seq_loss'] == ref_seq_loss, (record, ref_seq_loss)
        assert record['seq_item_table_md5'] == ref_seq_digest, record
        assert record['lazy_loss'] == ref_lazy_loss, (record,
                                                      ref_lazy_loss)
        assert record['lazy_item_table_md5'] == ref_lazy_digest, record
