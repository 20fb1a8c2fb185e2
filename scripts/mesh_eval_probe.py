"""Round-5 probe: mesh streaming-MRR pipelining (VERDICT item 2).

`_streaming_ranks_sharded` used to read its result back eagerly per
batch, re-introducing a serial dispatch+readback round trip per eval
batch; it now returns device arrays that join the metric's single
readback wave.  This probe measures the difference on the 8-virtual-CPU
mesh (interpret-mode kernels): the pipelined path vs a per-batch
``np.asarray`` readback forced around the same helper.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/mesh_eval_probe.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, '.')


def main():
    import jax

    jax.config.update('jax_platforms', 'cpu')
    assert len(jax.devices()) >= 8, 'run with host_platform_device_count=8'

    import spotlight_tpu.evaluation as evaluation
    from spotlight_tpu.data import Interactions
    from spotlight_tpu.evaluation import mrr_score
    from spotlight_tpu.factorization import ImplicitFactorizationModel
    from spotlight_tpu.parallel import make_mesh

    mesh = make_mesh(data=2, model=4)
    rs = np.random.RandomState(7)
    num_users, num_items = 8192, 4096
    n = 60_000
    train = Interactions(
        rs.randint(0, num_users, n).astype(np.int64),
        rs.randint(0, num_items, n).astype(np.int64),
        num_users=num_users, num_items=num_items)
    model = ImplicitFactorizationModel(
        loss='bpr', embedding_dim=32, n_iter=1, batch_size=2048,
        mesh=mesh, random_state=np.random.RandomState(42))
    model.fit(train)

    eval_users = 4096                      # multiple batches at bs=1024
    test = Interactions(
        np.repeat(np.arange(eval_users, dtype=np.int64), 2),
        rs.randint(0, num_items, 2 * eval_users).astype(np.int64),
        num_users=num_users, num_items=num_items)

    def timed(label):
        mrr_score(model, test, batch_size=1024)      # warm-up + compile
        best = float('inf')
        for _ in range(3):
            start = time.perf_counter()
            out = mrr_score(model, test, batch_size=1024)
            float(np.asarray(out).ravel()[0])
            best = min(best, time.perf_counter() - start)
        print(json.dumps(dict(
            metric='mesh_streaming_mrr_{}'.format(label),
            users_per_s=round(eval_users / best),
            batches=eval_users // 1024,
            config='data=2 x model=4 CPU mesh, 4096 users x 4096 items, '
                   'interpret-mode kernels')), flush=True)
        return best

    pipelined = timed('pipelined')

    # Force the old behavior: eager per-batch readback around the same
    # sharded helper.
    real = evaluation._streaming_ranks_sharded

    def eager(*args, **kwargs):
        return np.asarray(real(*args, **kwargs))

    evaluation._streaming_ranks_sharded = eager
    try:
        eager_t = timed('per_batch_readback')
    finally:
        evaluation._streaming_ranks_sharded = real
    print(json.dumps(dict(metric='mesh_streaming_mrr_overlap_gain',
                          value=round(eager_t / pipelined, 2),
                          unit='x')), flush=True)


if __name__ == '__main__':
    main()
