"""Candidate step formulations for the implicit-MF training hot path.

Round-2 follow-up to scripts/in_scan_costs.py: measures the live
optimization candidates (VERDICT.md item 1) as whole jitted epochs so
tunnel dispatch latency amortizes.  Run one variant at a time on the TPU:

    python scripts/step_cost_experiments.py layout     # physical layout probe
    python scripts/step_cost_experiments.py dispatch   # tunnel dispatch cost
    python scripts/step_cost_experiments.py prod       # current formulation
    python scripts/step_cost_experiments.py nobias     # no bias tables at all
    python scripts/step_cost_experiments.py fusedbias  # biases folded into
                                                       # column D of the
                                                       # embedding tables
    python scripts/step_cost_experiments.py lazyadam   # touched-rows Adam
    python scripts/step_cost_experiments.py bf16       # bf16 tables, f32 moments
    python scripts/step_cost_experiments.py all
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

N, NU, NI, D, BS = 999_424, 100_000, 20_000, 64, 8192
STEPS = N // BS
LR = 1e-2


def timed(label, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float('inf')
    for _ in range(reps):
        start = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - start)
    print('{:34s} {:7.1f} ms/epoch ({:6.3f} ms/step, {:5.2f}M ex/s)'.format(
        label, best * 1e3, best * 1e3 / STEPS, N / best / 1e6), flush=True)
    return best


def make_data():
    rs = np.random.RandomState(42)
    users = jnp.asarray(rs.randint(0, NU, (STEPS, BS)), dtype=jnp.int32)
    items = jnp.asarray(rs.randint(0, NI, (STEPS, BS)), dtype=jnp.int32)
    return users, items


def layout_probe():
    """Is the minor dim of a 2-D f32 array padded to 128 lanes in HBM?"""
    for width in (32, 64, 65, 128, 192, 256):
        f = jax.jit(lambda w=width: jnp.zeros((100_000, w)) + 1.0)
        stats = f.lower().compile().memory_analysis()
        print('width {:4d}: output bytes {:>12,}'.format(
            width, stats.output_size_in_bytes), flush=True)

    # Bandwidth check: dense elementwise pass over each width.
    for width in (64, 65, 128):
        x = jnp.ones((200_000, width))
        g = jax.jit(lambda a: a * 1.0001 + 1e-7)
        g(x).block_until_ready()
        start = time.perf_counter()
        for _ in range(50):
            x = g(x)
        x.block_until_ready()
        print('width {:4d}: {:6.3f} ms / dense pass'.format(
            width, (time.perf_counter() - start) / 50 * 1e3), flush=True)


def dispatch_probe():
    x = jnp.float32(1.0)
    f = jax.jit(lambda a: a + 1)
    f(x).block_until_ready()
    start = time.perf_counter()
    reps = 20
    for _ in range(reps):
        y = f(x)
        y.block_until_ready()
    print('dispatch round-trip: {:6.2f} ms'.format(
        (time.perf_counter() - start) / reps * 1e3), flush=True)

    users, items = make_data()

    @jax.jit
    def scalar_scan(c):
        def step(carry, xs):
            bu, bi = xs
            return carry + jnp.float32(bu[0] + bi[0]), None
        out, _ = jax.lax.scan(step, c, (users, items))
        return out

    timed('scalar-carry scan (no compute)', scalar_scan, x)


def _bpr(pos, neg):
    return (1.0 - jax.nn.sigmoid(pos - neg)).mean()


def make_prod_epoch(bias='separate', mode=''):
    """The production formulation, optionally with biases folded into the
    embedding tables (column D, with a constant-1 partner broadcast in the
    score instead of a stored column)."""
    users, items = make_data()
    key0 = jax.random.PRNGKey(0)

    if bias == 'separate':
        params = {
            'U': jax.random.normal(key0, (NU, D)) / D,
            'I': jax.random.normal(key0, (NI, D)) / D,
            'bu': jnp.zeros((NU,)),
            'bi': jnp.zeros((NI,)),
        }

        def score(p, bu_ids, item_rows, item_ids):
            u = p['U'][bu_ids]
            i = p['I'][item_ids]
            return ((u[None] * i).sum(-1) + p['bu'][bu_ids][None]
                    + p['bi'][item_ids])
    elif bias == 'none':
        params = {
            'U': jax.random.normal(key0, (NU, D)) / D,
            'I': jax.random.normal(key0, (NI, D)) / D,
        }

        def score(p, bu_ids, item_rows, item_ids):
            u = p['U'][bu_ids]
            i = p['I'][item_ids]
            return (u[None] * i).sum(-1)
    elif bias == 'bf16':
        # bf16 tables (and bf16 moments via mu_dtype below); f32 compute.
        params = {
            'U': (jax.random.normal(key0, (NU, D)) / D).astype(jnp.bfloat16),
            'I': (jax.random.normal(key0, (NI, D)) / D).astype(jnp.bfloat16),
            'bu': jnp.zeros((NU,), jnp.bfloat16),
            'bi': jnp.zeros((NI,), jnp.bfloat16),
        }

        def score(p, bu_ids, item_rows, item_ids):
            u = p['U'][bu_ids].astype(jnp.float32)
            i = p['I'][item_ids].astype(jnp.float32)
            return ((u[None] * i).sum(-1)
                    + p['bu'][bu_ids].astype(jnp.float32)[None]
                    + p['bi'][item_ids].astype(jnp.float32))
    elif bias == 'fused':
        # Column D of each table is the bias; the dot runs over the first
        # D columns, biases are read from column D.
        params = {
            'U': jnp.concatenate(
                [jax.random.normal(key0, (NU, D)) / D,
                 jnp.zeros((NU, 1))], axis=1),
            'I': jnp.concatenate(
                [jax.random.normal(key0, (NI, D)) / D,
                 jnp.zeros((NI, 1))], axis=1),
        }

        def score(p, bu_ids, item_rows, item_ids):
            u = p['U'][bu_ids]                   # (B, D+1)
            i = p['I'][item_ids]                 # (2, B, D+1)
            return ((u[None, :, :D] * i[..., :D]).sum(-1)
                    + u[None, :, D] + i[..., D])
    else:
        raise ValueError(bias)

    tx = optax.sgd(LR) if 'sgd' in mode else optax.adam(LR)
    opt_state = tx.init(params)

    def batch_loss(p, bu, bi, key):
        neg = jax.random.randint(key, bu.shape, 0, NI, dtype=jnp.int32)
        all_items = jnp.stack([bi, neg])
        scores = score(p, bu, None, all_items)
        return _bpr(scores[0], scores[1])

    # NOTE: users/items are passed as ARGUMENTS, never closed over — a
    # closed-over device array (XLA constant) costs ~26 ms per execution
    # through the axon tunnel (measured; see docs/performance.md).
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def epoch(p, opt_state, key, users, items):
        keys = jax.random.split(key, STEPS)

        def step(carry, xs):
            p, opt_state = carry
            bu, bi, k = xs
            if 'fwdonly' in mode:
                return (p, opt_state), batch_loss(p, bu, bi, k)
            loss, grads = jax.value_and_grad(batch_loss)(p, bu, bi, k)
            if 'nopt' in mode:
                p = jax.tree_util.tree_map(
                    lambda a, g: a - 1e-6 * g, p, grads)
            else:
                updates, opt_state = tx.update(grads, opt_state, p)
                p = optax.apply_updates(p, updates)
            return (p, opt_state), loss

        (p, opt_state), losses = jax.lax.scan(
            step, (p, opt_state), (users, items, keys))
        return p, opt_state, losses.mean()

    return epoch, params, opt_state


def run_epoch_variant(label, bias, mode='', epochs=10):
    """Chained-epoch timing: donation + async dispatch make single-epoch
    wall timings unreliable; chaining epochs and blocking once at the end
    measures steady-state device throughput."""
    epoch, params, opt_state = make_prod_epoch(bias=bias, mode=mode)
    users, items = make_data()

    p = jax.tree_util.tree_map(jnp.copy, params)
    s = jax.tree_util.tree_map(jnp.copy, opt_state)
    p, s, loss = epoch(p, s, jax.random.PRNGKey(1), users, items)  # warmup
    float(loss)  # explicit D2H — block_until_ready alone does not reliably
    #              wait for completion through the dev tunnel

    start = time.perf_counter()
    for e in range(epochs):
        p, s, loss = epoch(p, s, jax.random.PRNGKey(2 + e), users, items)
    float(loss)
    dt = time.perf_counter() - start
    print('{:34s} {:7.1f} ms/epoch ({:6.3f} ms/step, {:5.2f}M ex/s) '
          'final loss {:.4f}'.format(
              label, dt / epochs * 1e3, dt / epochs / STEPS * 1e3,
              epochs * N / dt / 1e6, float(loss)), flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    print('backend:', jax.default_backend(), flush=True)

    if which in ('layout', 'all'):
        layout_probe()
    if which in ('dispatch', 'all'):
        dispatch_probe()
    if which in ('prod', 'all'):
        run_epoch_variant('prod (separate biases)', 'separate')
    if which in ('nobias', 'all'):
        run_epoch_variant('no bias tables', 'none')
    if which in ('fusedbias', 'all'):
        run_epoch_variant('fused bias column', 'fused')
    if which in ('bf16', 'all'):
        run_epoch_variant('bf16 tables', 'bf16')
    if which in ('fused_sgd', 'all'):
        run_epoch_variant('fused bias + sgd', 'fused', mode='sgd')
    if which in ('fused_fwdonly', 'all'):
        run_epoch_variant('fused bias, forward only', 'fused',
                          mode='fwdonly')
    if which in ('fused_nopt', 'all'):
        run_epoch_variant('fused bias, grads + trivial sgd', 'fused',
                          mode='nopt')


if __name__ == '__main__':
    main()
