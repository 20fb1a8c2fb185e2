"""Bloom-embedding accuracy/throughput sweep.

TPU-native analogue of `/root/reference/examples/bloom_embeddings/example.py`:
compares LSTM sequence models with bloom-compressed embedding tables at
various compression ratios against the uncompressed baseline, logging results
to a resumable JSONL file.

Usage::

    python example.py [movielens|amazon|synthetic]
"""

import sys
import time

import numpy as np

from spotlight_tpu.data import user_based_train_test_split
from spotlight_tpu.evaluation import sequence_mrr_score
from spotlight_tpu.ops import BloomEmbedding
from spotlight_tpu.sequence import ImplicitSequenceModel, LSTMNet
from spotlight_tpu.utils.results import Results

RANDOM_SEED = 42
COMPRESSION_RATIOS = (1.0, 0.8, 0.6, 0.4, 0.2)


def load_data(variant, random_state):
    if variant == 'movielens':
        from spotlight_tpu.data.movielens import get_movielens_dataset
        dataset = get_movielens_dataset('1M')
        max_len, min_len = 200, 20
    elif variant == 'amazon':
        from spotlight_tpu.data.amazon import get_amazon_dataset
        dataset = get_amazon_dataset(min_user_interactions=20,
                                     min_item_interactions=20)
        max_len, min_len = 50, 20
    else:
        from spotlight_tpu.data.synthetic import generate_sequential
        dataset = generate_sequential(
            num_users=2000, num_items=5000, num_interactions=200000,
            concentration_parameter=0.01, order=3,
            random_state=random_state)
        max_len, min_len = 50, 10

    train, test = user_based_train_test_split(
        dataset, random_state=random_state)
    return (train.to_sequence(max_sequence_length=max_len,
                              min_sequence_length=min_len),
            test.to_sequence(max_sequence_length=max_len,
                             min_sequence_length=min_len))


def run(variant='synthetic'):
    random_state = np.random.RandomState(RANDOM_SEED)
    train, test = load_data(variant, random_state)
    results = Results('{}_bloom_results.jsonl'.format(variant))

    for compression_ratio in COMPRESSION_RATIOS:
        for embedding_dim in (32, 64):
            config = {
                'compression_ratio': compression_ratio,
                'embedding_dim': embedding_dim,
                'loss': 'adaptive_hinge',
                'n_iter': 10,
                'batch_size': 256,
                'learning_rate': 1e-2,
                'l2': 1e-7,
            }
            if config in results:
                continue

            if compression_ratio == 1.0:
                representation = LSTMNet(train.num_items,
                                         embedding_dim=embedding_dim)
            else:
                embedding = BloomEmbedding(
                    train.num_items, embedding_dim,
                    compression_ratio=compression_ratio,
                    num_hash_functions=4)
                representation = LSTMNet(train.num_items,
                                         embedding_dim=embedding_dim,
                                         item_embedding_layer=embedding)

            model = ImplicitSequenceModel(
                loss=config['loss'],
                representation=representation,
                batch_size=config['batch_size'],
                learning_rate=config['learning_rate'],
                l2=config['l2'],
                n_iter=config['n_iter'],
                random_state=np.random.RandomState(RANDOM_SEED))

            start = time.time()
            model.fit(train, verbose=True)
            elapsed = time.time() - start
            test_mrr = float(sequence_mrr_score(model, test).mean())

            print('ratio {} dim {}: MRR {:.4f} ({:.0f}s)'.format(
                compression_ratio, embedding_dim, test_mrr, elapsed))
            results.save(config, test_mrr=test_mrr, elapsed=elapsed)

    print('Best: {}'.format(results.best('test_mrr')))


if __name__ == '__main__':
    run(sys.argv[1] if len(sys.argv) > 1 else 'synthetic')
