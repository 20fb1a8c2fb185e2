"""Decompose implicit-MF training step cost on the TPU.

Times epoch variants with components disabled to attribute the per-example
cost (gathers, scatter-add gradients, Adam table traffic, negative
sampling).  Run on the default (TPU) platform:

    python scripts/decompose_step_cost.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

N = 999_424  # divisible by BS
NUM_USERS, NUM_ITEMS, DIM, BS = 100_000, 20_000, 64, 8192


def main():
    rs = np.random.RandomState(42)
    users = jnp.asarray(rs.randint(0, NUM_USERS, N), dtype=jnp.int32)
    items = jnp.asarray(rs.randint(0, NUM_ITEMS, N), dtype=jnp.int32)
    steps = N // BS

    key = jax.random.PRNGKey(0)
    params = {
        'U': jax.random.normal(key, (NUM_USERS, DIM)) / DIM,
        'I': jax.random.normal(key, (NUM_ITEMS, DIM)) / DIM,
        'bu': jnp.zeros((NUM_USERS,)),
        'bi': jnp.zeros((NUM_ITEMS,)),
    }

    def make_epoch(loss_mode, opt_name):
        tx = optax.adam(1e-2) if opt_name == 'adam' else optax.sgd(1e-2)
        opt_state = tx.init(params)

        def batch_loss(p, bu, bi, neg):
            pu = p['U'][bu]
            score_pos = (pu * p['I'][bi]).sum(-1) + p['bu'][bu] + p['bi'][bi]
            if loss_mode == 'no_neg':
                return jax.nn.sigmoid(-score_pos).mean()
            score_neg = (pu * p['I'][neg]).sum(-1) + p['bu'][bu] + p['bi'][neg]
            return (1.0 - jax.nn.sigmoid(score_pos - score_neg)).mean()

        @jax.jit
        def epoch(p, opt_state, key):
            perm = jax.random.permutation(key, N)
            u = users[perm].reshape(steps, BS)
            i = items[perm].reshape(steps, BS)
            negs = jax.random.randint(key, (steps, BS), 0, NUM_ITEMS)

            def step(carry, xs):
                p, s = carry
                bu, bi, neg = xs
                if loss_mode == 'stopgrad_emb':
                    loss, grads = jax.value_and_grad(
                        lambda p: batch_loss(
                            {'U': jax.lax.stop_gradient(p['U']),
                             'I': jax.lax.stop_gradient(p['I']),
                             'bu': p['bu'], 'bi': p['bi']},
                            bu, bi, neg))(p)
                else:
                    loss, grads = jax.value_and_grad(batch_loss)(
                        p, bu, bi, neg)
                updates, s = tx.update(grads, s, p)
                p = optax.apply_updates(p, updates)
                return (p, s), loss

            (p, opt_state), losses = jax.lax.scan(
                step, (p, opt_state), (u, i, negs))
            return p, opt_state, losses.mean()

        return epoch, opt_state

    def timeit(label, loss_mode, opt_name):
        epoch, opt_state = make_epoch(loss_mode, opt_name)
        out = epoch(params, opt_state, jax.random.PRNGKey(1))
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = epoch(params, opt_state, jax.random.PRNGKey(2))
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        print('{:26s} {:7.1f} ms/epoch  {:6.2f}M ex/s'.format(
            label, dt * 1e3, N / dt / 1e6), flush=True)

    timeit('full (bpr, adam)', 'bpr', 'adam')
    timeit('sgd instead of adam', 'bpr', 'sgd')
    timeit('no negatives', 'no_neg', 'adam')
    timeit('no embedding grads', 'stopgrad_emb', 'adam')


if __name__ == '__main__':
    main()
