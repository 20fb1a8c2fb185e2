"""Round-4 VERDICT item 7: itemize the sequence estimator's fit-level
overhead vs raw jitted epochs.

Round 3 measured raw jitted LSTM epochs at 476K seq/s but only 397K
through ``fit`` at the same shapes (~17%).  Candidate costs, each timed
here at the bench config (LSTM, D=64, T=50, 20K sequences, batch 256,
10-epoch windows):

- ``place_data``: the per-fit host-to-device copy of the sequence matrix
  (4 MB; the dev tunnel moves H2D at ~30 MB/s, so this alone is
  ~120 ms/fit = ~12 ms/epoch against a ~42 ms device epoch);
- the per-epoch ``EpochLossDrain`` readback (depth-1 pipelined);
- per-epoch dispatch + key-split overhead.

Run: ``python scripts/seq_fit_overhead_probe.py [--quick]``
Prints one JSON line per stage.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

QUICK = '--quick' in sys.argv
EPOCHS = 3 if QUICK else 10
NUM_SEQS = 2000 if QUICK else 20000


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from spotlight_tpu.data.interactions import SequenceInteractions
    from spotlight_tpu.sequence import ImplicitSequenceModel
    from spotlight_tpu.utils import training

    rs = np.random.RandomState(0)
    seqs = rs.randint(1, 20000, size=(NUM_SEQS, 50)).astype(np.int32)
    data = SequenceInteractions(seqs, num_items=20000)

    model = ImplicitSequenceModel(
        loss='bpr', representation='lstm', embedding_dim=64,
        n_iter=EPOCHS, batch_size=256,
        random_state=np.random.RandomState(42))
    model.fit(data)  # compile + first fit (excluded)

    # Stage: fit wall-clock (resume fits; includes place_data + drain).
    for rep in range(2):
        start = time.perf_counter()
        model.fit(data)
        elapsed = time.perf_counter() - start
        emit(stage='fit', rep=rep, s=round(elapsed, 3),
             seq_per_s=round(NUM_SEQS * EPOCHS / elapsed, 1))

    # Stage: place_data alone (the per-fit H2D copy).
    n = len(seqs)
    padded, num_batches = training.pad_to_batches(n, 256)
    arrays = {'sequences': training.pad_array(seqs, padded)}
    for rep in range(2):
        start = time.perf_counter()
        placed = training.place_data(arrays, None)
        # force materialization
        _ = float(jnp.sum(placed['sequences'][0]))
        emit(stage='place_data', rep=rep,
             ms=round((time.perf_counter() - start) * 1e3, 1),
             mb=round(arrays['sequences'].nbytes / 1e6, 1))

    # Stage: raw chained epochs, one readback at the end.
    epoch_fn = model._epoch_fn(num_batches)
    params, opt_state = model._params, model._opt_state
    key = jax.random.PRNGKey(7)

    def chain(epochs, drain=False):
        nonlocal params, opt_state, key
        from spotlight_tpu.utils.training import EpochLossDrain
        d = EpochLossDrain(False) if drain else None
        start = time.perf_counter()
        loss = None
        for i in range(epochs):
            key, sub = jax.random.split(key)
            params, opt_state, loss = epoch_fn(params, opt_state, sub,
                                               placed, n)
            if d is not None:
                d.push(i, loss)
        if d is not None:
            d.finish()
        else:
            float(loss)
        return time.perf_counter() - start

    chain(1)  # warm any remaining compile
    for name, use_drain in [('raw_epochs', False),
                            ('raw_epochs_with_drain', True)]:
        elapsed = chain(EPOCHS, drain=use_drain)
        emit(stage=name, s=round(elapsed, 3),
             seq_per_s=round(NUM_SEQS * EPOCHS / elapsed, 1),
             ms_per_epoch=round(elapsed / EPOCHS * 1e3, 1))


if __name__ == '__main__':
    main()
