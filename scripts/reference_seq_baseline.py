"""Measure the reference implementation's CPU LSTM training and evaluation
rates on the same synthetic workload as the TPU sequence benchmark,
for the performance docs.  Runs the actual package at /root/reference."""

import sys
import time

import numpy as np

sys.path.insert(0, '/root/reference')

from spotlight.interactions import SequenceInteractions  # noqa: E402
from spotlight.sequence.implicit import ImplicitSequenceModel  # noqa: E402


def main():
    rs = np.random.RandomState(42)
    NSEQ, T, NITEMS, DIM = 2000, 50, 20000, 64  # 10x smaller train set
    seqs = rs.randint(1, NITEMS, size=(NSEQ, T)).astype(np.int64)
    data = SequenceInteractions(seqs, num_items=NITEMS)

    model = ImplicitSequenceModel(loss='bpr', representation='lstm',
                                  embedding_dim=DIM, batch_size=256,
                                  n_iter=1, use_cuda=False,
                                  random_state=np.random.RandomState(0))
    model.fit(data)  # warm-up epoch
    start = time.perf_counter()
    model.fit(data)
    elapsed = time.perf_counter() - start
    print('reference lstm train: {:.0f} seq/s ({:.3f}M interactions/s)'
          .format(NSEQ / elapsed, NSEQ * T / elapsed / 1e6), flush=True)

    num_eval = 64
    start = time.perf_counter()
    for i in range(num_eval):
        model.predict(seqs[i, :-1])
    elapsed = time.perf_counter() - start
    print('reference catalog eval: {:.4f}G item-scores/s '
          '({:.1f} users/s over {} items)'.format(
              num_eval * NITEMS / elapsed / 1e9, num_eval / elapsed,
              NITEMS), flush=True)


if __name__ == '__main__':
    main()
