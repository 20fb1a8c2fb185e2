"""Sequence-training step-cost probes (TPU).

Decomposes the LSTM sequence training step the way
``scripts/in_scan_costs.py`` does for factorization: each variant strips
or swaps one cost component so the deltas attribute the step time.

    python scripts/seq_step_costs.py [variant ...]

Variants:
    fused       production step (BPR, on-device negatives, fused-bias table)
    classic     same but the separate factor + 1-wide bias tables
                (the round-1 layout) — measures the bias-row-touch cost
    noneg       negatives reuse the positive scores (no negative gather)
    fwd         user_representation forward only (no loss, no backward)
    recur       the LSTM recurrence alone (embeddings fixed, no grad)
    pooling / cnn / mixture
                production step for the other representations
"""

import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from spotlight_tpu.ops.losses import bpr_loss  # noqa: E402
from spotlight_tpu.ops.sampling import sample_items_device  # noqa: E402
from spotlight_tpu.sequence.representations import (  # noqa: E402
    PADDING_IDX, CNNNet, LSTMNet, MixtureLSTMNet, PoolNet)

NUM_ITEMS = 20_000
DIM = 64
SEQ_LEN = 50
BATCH = 256
NUM_SEQ = 20_480  # 80 batches


def build(variant):
    if variant == 'pooling':
        net = PoolNet(NUM_ITEMS, DIM)
    elif variant == 'cnn':
        net = CNNNet(NUM_ITEMS, DIM, kernel_width=5, num_layers=1)
    elif variant == 'mixture':
        net = MixtureLSTMNet(NUM_ITEMS, DIM)
    else:
        net = LSTMNet(NUM_ITEMS, DIM, fused=(variant != 'classic'))
    params = net.init(jax.random.PRNGKey(0))
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)

    rs = np.random.RandomState(42)
    sequences = jnp.asarray(
        rs.randint(1, NUM_ITEMS, size=(NUM_SEQ // BATCH, BATCH, SEQ_LEN)),
        dtype=jnp.int32)

    def loss_fn(params, seqs, key):
        reprs, _ = net.user_representation(params, seqs)
        positive = net.score(params, reprs, seqs)
        if variant == 'noneg':
            negative = positive * 0.5
        elif variant == 'inbatch':
            negative = net.score_inbatch_negatives(params, reprs, seqs)
        else:
            negative_items = sample_items_device(key, NUM_ITEMS, seqs.shape)
            negative = net.score(params, reprs, negative_items)
        mask = (seqs != PADDING_IDX)
        elems = bpr_loss(positive, negative, reduce=False)
        mask = mask.astype(elems.dtype)
        return jnp.sum(elems * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    if variant == 'fwd':
        @jax.jit
        def epoch(params, opt_state, key, sequences):
            def step(carry, batch):
                reprs, final = net.user_representation(params, batch)
                return carry, final.sum()
            _, outs = jax.lax.scan(step, 0.0, sequences)
            return params, opt_state, outs.sum()
    elif variant == 'recur':
        emb = jax.random.normal(
            jax.random.PRNGKey(1), (BATCH, SEQ_LEN + 1, DIM))

        @jax.jit
        def epoch(params, opt_state, key, sequences):
            def step(carry, batch):
                hidden = net._run_lstm(params, emb)
                return carry, hidden.sum()
            _, outs = jax.lax.scan(step, 0.0, sequences)
            return params, opt_state, outs.sum()
    else:
        grad_fn = jax.value_and_grad(loss_fn)

        @jax.jit
        def epoch(params, opt_state, key, sequences):
            keys = jax.random.split(key, sequences.shape[0])

            def step(carry, batch_and_key):
                params, opt_state = carry
                batch, k = batch_and_key
                loss, grads = grad_fn(params, batch, k)
                updates, opt_state = optimizer.update(
                    grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), (sequences, keys))
            return params, opt_state, losses.mean()

    return epoch, params, opt_state, sequences


def measure(variant, reps=5):
    epoch, params, opt_state, sequences = build(variant)
    key = jax.random.PRNGKey(7)
    params, opt_state, out = epoch(params, opt_state, key, sequences)
    float(out)  # force completion (a readback, not just block_until_ready)
    start = time.perf_counter()
    for _ in range(reps):
        params, opt_state, out = epoch(params, opt_state, key, sequences)
    float(out)
    return (time.perf_counter() - start) / reps


def main():
    variants = sys.argv[1:] or ['fused', 'classic', 'noneg', 'fwd', 'recur']
    for variant in variants:
        elapsed = measure(variant)
        steps = NUM_SEQ // BATCH
        print('{:8s} {:8.2f} ms/epoch  {:6.3f} ms/step  {:9.0f} seq/s'.format(
            variant, elapsed * 1e3, elapsed * 1e3 / steps,
            NUM_SEQ / elapsed), flush=True)


if __name__ == '__main__':
    main()
