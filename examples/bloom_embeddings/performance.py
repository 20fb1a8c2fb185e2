"""Bloom vs dense embedding fitting-speed comparison across table sizes.

TPU-native analogue of
`/root/reference/examples/bloom_embeddings/performance.py`: measures the
fit-time ratio of bloom-compressed vs dense embedding tables as the item
catalog grows (1e4 -> 5e6 rows), with a warm-up epoch excluded and the
minimum of two repetitions reported.
"""

import json
import time

import numpy as np

from spotlight_tpu.data.interactions import SequenceInteractions
from spotlight_tpu.ops import BloomEmbedding
from spotlight_tpu.sequence import ImplicitSequenceModel, LSTMNet

EMBEDDING_DIM = 64
SEQ_LEN = 50
NUM_SEQUENCES = 20000


def _synthetic_sequences(num_items, random_state):
    sequences = random_state.randint(
        1, num_items, size=(NUM_SEQUENCES, SEQ_LEN)).astype(np.int32)
    return SequenceInteractions(sequences, num_items=num_items)


def time_fitting(model, data, repetitions=2):
    # Warm-up run covers compilation and allocation.
    model._n_iter = 1
    model.fit(data)

    timings = []
    for _ in range(repetitions):
        start = time.time()
        model.fit(data)
        timings.append(time.time() - start)
    return min(timings)


def run():
    random_state = np.random.RandomState(42)
    results = []

    for num_items in (int(1e4), int(1e5), int(1e6), int(5e6)):
        data = _synthetic_sequences(num_items, random_state)

        dense = ImplicitSequenceModel(
            loss='bpr',
            representation=LSTMNet(num_items, embedding_dim=EMBEDDING_DIM),
            batch_size=256, n_iter=1,
            random_state=np.random.RandomState(42))
        bloom = ImplicitSequenceModel(
            loss='bpr',
            representation=LSTMNet(
                num_items, embedding_dim=EMBEDDING_DIM,
                item_embedding_layer=BloomEmbedding(
                    num_items, EMBEDDING_DIM, compression_ratio=0.2,
                    num_hash_functions=4)),
            batch_size=256, n_iter=1,
            random_state=np.random.RandomState(42))

        dense_time = time_fitting(dense, data)
        bloom_time = time_fitting(bloom, data)

        row = {'num_items': num_items,
               'dense_s': round(dense_time, 3),
               'bloom_s': round(bloom_time, 3),
               'ratio': round(bloom_time / dense_time, 3)}
        results.append(row)
        print(json.dumps(row), flush=True)

    return results


if __name__ == '__main__':
    run()
