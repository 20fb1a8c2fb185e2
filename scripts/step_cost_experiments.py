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

    if 'handadam' in mode:
        # Hand-rolled Adam carried as explicit (mu, nu, t): one fused
        # elementwise pass per table, no intermediate `updates` tree.
        opt_state = {
            'mu': jax.tree_util.tree_map(jnp.zeros_like, params),
            'nu': jax.tree_util.tree_map(jnp.zeros_like, params),
            't': jnp.zeros((), jnp.int32),
        }
        tx = None
    else:
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
            elif 'handadam' in mode:
                t = opt_state['t'] + 1
                c1 = 1.0 - 0.9 ** t.astype(jnp.float32)
                c2 = 1.0 - 0.999 ** t.astype(jnp.float32)

                def upd(param, m, v, g):
                    m = 0.9 * m + 0.1 * g
                    v = 0.999 * v + 0.001 * g * g
                    param = param - LR * (m / c1) / (jnp.sqrt(v / c2)
                                                     + 1e-8)
                    return param, m, v

                out = jax.tree_util.tree_map(
                    upd, p, opt_state['mu'], opt_state['nu'], grads)
                p = {k2: o[0] for k2, o in out.items()}
                opt_state = {
                    'mu': {k2: o[1] for k2, o in out.items()},
                    'nu': {k2: o[2] for k2, o in out.items()},
                    't': t,
                }
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


def _sparse_adam_group(ids, triples, t, num_rows, lr=LR, b1=0.9, b2=0.999,
                       eps=1e-8):
    """Touched-rows Adam via sort + segment-sum dedup.

    ``triples`` is a list of (param, mu, nu, grad_rows) where grad_rows has
    one row per occurrence in ``ids`` (duplicates allowed; they are summed,
    matching torch SparseAdam / dense-scatter-add semantics).  Returns the
    updated triples.  Untouched rows are left entirely alone (lazy
    semantics — the documented deviation from dense Adam).
    """
    n = ids.shape[0]
    order = jnp.argsort(ids)
    s_ids = ids[order]
    head = jnp.concatenate(
        [jnp.ones((1,), bool), s_ids[1:] != s_ids[:-1]])
    seg = jnp.cumsum(head) - 1
    uids = jax.ops.segment_max(s_ids, seg, num_segments=n)
    valid = jnp.arange(n) < head.sum()
    uids = jnp.where(valid, uids, num_rows)  # OOB -> drop/fill

    out = []
    for param, mu, nu, grad_rows in triples:
        sg = jax.ops.segment_sum(grad_rows[order], seg, num_segments=n)
        m0 = mu.at[uids].get(mode='fill', fill_value=0)
        v0 = nu.at[uids].get(mode='fill', fill_value=0)
        m = b1 * m0 + (1 - b1) * sg
        v = b2 * v0 + (1 - b2) * sg * sg
        mhat = m / (1 - b1 ** t)
        vhat = v / (1 - b2 ** t)
        delta = -lr * mhat / (jnp.sqrt(vhat) + eps)
        param = param.at[uids].add(delta, mode='drop')
        mu = mu.at[uids].set(m, mode='drop')
        nu = nu.at[uids].set(v, mode='drop')
        out.append((param, mu, nu))
    return out


def make_lazy_epoch(variant='sort'):
    """Sparse-update formulations: grads w.r.t. *gathered rows* only, so the
    dense table-sized scatter-add and dense Adam moment pass never happen.

    variant='sort':   sort+segment dedup, touched-rows Adam (no dense
                      buffers at all).
    variant='dense':  keep the dense scatter-add grad (XLA autodiff), then
                      row-indexed Adam at occurrence ids (duplicates write
                      identical values; moments stay lazy).
    variant='sortb':  'sort' with biases folded into column D (two tables
                      instead of four).
    """
    users, items = make_data()
    key0 = jax.random.PRNGKey(0)
    fused = variant == 'sortb'
    width = D + 1 if fused else D

    def table(n, d):
        w = jax.random.normal(key0, (n, d)) / D
        if fused:
            w = w.at[:, D].set(0.0)
        return w

    params = {'U': table(NU, width), 'I': table(NI, width)}
    if not fused:
        params['bu'] = jnp.zeros((NU,))
        params['bi'] = jnp.zeros((NI,))
    opt = {
        'mu': jax.tree_util.tree_map(jnp.zeros_like, params),
        'nu': jax.tree_util.tree_map(jnp.zeros_like, params),
        't': jnp.zeros((), jnp.int32),
    }

    def score_rows(u_rows, i_rows, bu_rows, bi_rows):
        if fused:
            return ((u_rows[None, :, :D] * i_rows[..., :D]).sum(-1)
                    + u_rows[None, :, D] + i_rows[..., D])
        return ((u_rows[None] * i_rows).sum(-1)
                + bu_rows[None] + bi_rows)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def epoch(p, opt_state, key, users, items):
        keys = jax.random.split(key, STEPS)

        def step(carry, xs):
            p, opt_state = carry
            bu_ids, bi_ids, k = xs
            neg = jax.random.randint(k, bu_ids.shape, 0, NI,
                                     dtype=jnp.int32)
            all_items = jnp.concatenate([bi_ids, neg])
            t = opt_state['t'] + 1

            if variant == 'dense':
                def batch_loss(p):
                    u = p['U'][bu_ids]
                    i = p['I'][all_items].reshape(2, BS, -1)
                    s = score_rows(u, i, p['bu'][bu_ids],
                                   p['bi'][all_items].reshape(2, BS))
                    return _bpr(s[0], s[1])
                loss, g = jax.value_and_grad(batch_loss)(p)
                new_p, mu, nu = dict(p), dict(opt_state['mu']), \
                    dict(opt_state['nu'])
                for name, ids in (('U', bu_ids), ('I', all_items),
                                  ('bu', bu_ids), ('bi', all_items)):
                    grows = g[name][ids]
                    m = 0.9 * opt_state['mu'][name][ids] + 0.1 * grows
                    v = (0.999 * opt_state['nu'][name][ids]
                         + 0.001 * grows * grows)
                    mhat = m / (1 - 0.9 ** t)
                    vhat = v / (1 - 0.999 ** t)
                    delta = -LR * mhat / (jnp.sqrt(vhat) + 1e-8)
                    new_p[name] = p[name].at[ids].set(p[name][ids] + delta)
                    mu[name] = opt_state['mu'][name].at[ids].set(m)
                    nu[name] = opt_state['nu'][name].at[ids].set(v)
                return (new_p, {'mu': mu, 'nu': nu, 't': t}), loss

            # sort variants: differentiate w.r.t. gathered rows only.
            u_rows = p['U'][bu_ids]
            i_rows = p['I'][all_items]
            if fused:
                bu_rows = bi_rows = jnp.zeros((1,))

                def loss_fn(u_rows, i_rows):
                    s = score_rows(u_rows, i_rows.reshape(2, BS, -1),
                                   None, None)
                    return _bpr(s[0], s[1])
                loss, (gu, gi) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1))(u_rows, i_rows)
            else:
                bu_rows = p['bu'][bu_ids]
                bi_rows = p['bi'][all_items]

                def loss_fn(u_rows, i_rows, bu_rows, bi_rows):
                    s = score_rows(u_rows, i_rows.reshape(2, BS, -1),
                                   bu_rows, bi_rows.reshape(2, BS))
                    return _bpr(s[0], s[1])
                loss, (gu, gi, gbu, gbi) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1, 2, 3))(
                        u_rows, i_rows, bu_rows, bi_rows)

            mu, nu = opt_state['mu'], opt_state['nu']
            u_triples = [(p['U'], mu['U'], nu['U'], gu)]
            i_triples = [(p['I'], mu['I'], nu['I'], gi)]
            if not fused:
                u_triples.append((p['bu'], mu['bu'], nu['bu'], gbu))
                i_triples.append((p['bi'], mu['bi'], nu['bi'], gbi))
            u_out = _sparse_adam_group(bu_ids, u_triples, t, NU)
            i_out = _sparse_adam_group(all_items, i_triples, t, NI)

            new_p = {'U': u_out[0][0], 'I': i_out[0][0]}
            new_mu = {'U': u_out[0][1], 'I': i_out[0][1]}
            new_nu = {'U': u_out[0][2], 'I': i_out[0][2]}
            if not fused:
                new_p.update(bu=u_out[1][0], bi=i_out[1][0])
                new_mu.update(bu=u_out[1][1], bi=i_out[1][1])
                new_nu.update(bu=u_out[1][2], bi=i_out[1][2])
            return (new_p, {'mu': new_mu, 'nu': new_nu, 't': t}), loss

        (p, opt_state), losses = jax.lax.scan(
            step, (p, opt_state), (users, items, keys))
        return p, opt_state, losses.mean()

    return epoch, params, opt


def run_lazy_variant(label, variant, epochs=10):
    epoch, params, opt_state = make_lazy_epoch(variant)
    users, items = make_data()
    p = jax.tree_util.tree_map(jnp.copy, params)
    s = jax.tree_util.tree_map(jnp.copy, opt_state)
    p, s, loss = epoch(p, s, jax.random.PRNGKey(1), users, items)
    float(loss)
    start = time.perf_counter()
    for e in range(epochs):
        p, s, loss = epoch(p, s, jax.random.PRNGKey(2 + e), users, items)
    float(loss)
    dt = time.perf_counter() - start
    print('{:34s} {:7.1f} ms/epoch ({:6.3f} ms/step, {:5.2f}M ex/s) '
          'final loss {:.4f}'.format(
              label, dt / epochs * 1e3, dt / epochs / STEPS * 1e3,
              epochs * N / dt / 1e6, float(loss)), flush=True)


def sort_probe():
    """Cost of argsort + segment machinery at batch sizes 8K/16K."""
    for n in (8192, 16384):
        ids = jnp.asarray(
            np.random.RandomState(0).randint(0, NI, (STEPS, n)),
            dtype=jnp.int32)

        @jax.jit
        def f(ids):
            def step(c, b):
                order = jnp.argsort(b)
                s = b[order]
                head = jnp.concatenate(
                    [jnp.ones((1,), bool), s[1:] != s[:-1]])
                seg = jnp.cumsum(head) - 1
                return c + seg[-1], None
            out, _ = jax.lax.scan(step, jnp.int32(0), ids)
            return out

        timed('argsort+segments n={}'.format(n), f, ids)


def scatter_probe():
    """Upper bound on batch-id-dedup savings (ROADMAP item 2): dense
    scatter-add cost at duplicate-heavy random ids (2B draws from NI:
    ~32% duplicates) vs fully-unique random ids of the same count."""
    rs = np.random.RandomState(0)
    dup_ids = jnp.asarray(rs.randint(0, NI, (STEPS, 2 * BS)), jnp.int32)
    uniq_ids = jnp.asarray(
        np.stack([rs.permutation(NI)[:2 * BS] for _ in range(STEPS)]),
        jnp.int32)
    g = jnp.ones((2 * BS, D + 1))

    @jax.jit
    def f(ids):
        def step(c, b):
            return c + jnp.zeros((NI, D + 1)).at[b].add(g)[0, 0], None
        out, _ = jax.lax.scan(step, jnp.float32(0), ids)
        return out

    dup = np.mean([len(np.unique(np.asarray(r))) for r in dup_ids[:4]])
    print('mean unique rows per dup batch: {:.0f} / {}'.format(
        dup, 2 * BS), flush=True)
    timed('scatter-add 16K ids, ~32% dups', f, dup_ids)
    timed('scatter-add 16K ids, unique', f, uniq_ids)


def make_dedup_epoch():
    """Production fused-bias formulation, but the item gradient is
    deduplicated (argsort + segment-sum) before the dense scatter-add, so
    each touched row is written once.  Dense Adam unchanged — this
    isolates ROADMAP item 2 (batch-level id dedup) from the lazy-Adam
    variants."""
    key0 = jax.random.PRNGKey(0)
    width = D + 1

    def table(n):
        return (jax.random.normal(key0, (n, width)) / D).at[:, D].set(0.0)

    params = {'U': table(NU), 'I': table(NI)}
    tx = optax.adam(LR)
    opt_state = tx.init(params)

    def score_rows(u_rows, i_rows):
        return ((u_rows[None, :, :D] * i_rows[..., :D]).sum(-1)
                + u_rows[None, :, D] + i_rows[..., D])

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def epoch(p, opt_state, key, users, items):
        keys = jax.random.split(key, STEPS)

        def step(carry, xs):
            p, opt_state = carry
            bu, bi, k = xs
            neg = jax.random.randint(k, bu.shape, 0, NI, dtype=jnp.int32)
            all_items = jnp.concatenate([bi, neg])
            u_rows = p['U'][bu]
            i_rows = p['I'][all_items]

            def loss_fn(u_rows, i_rows):
                s = score_rows(u_rows, i_rows.reshape(2, BS, -1))
                return _bpr(s[0], s[1])

            loss, (gu, gi) = jax.value_and_grad(
                loss_fn, argnums=(0, 1))(u_rows, i_rows)

            n = all_items.shape[0]
            order = jnp.argsort(all_items)
            sid = all_items[order]
            sg = gi[order]
            head = jnp.concatenate(
                [jnp.ones((1,), bool), sid[1:] != sid[:-1]])
            seg = jnp.cumsum(head) - 1
            summed = jax.ops.segment_sum(sg, seg, num_segments=n)
            rep = jnp.full((n,), NI, jnp.int32).at[seg].set(sid)
            gI = jnp.zeros((NI + 1, width)).at[rep].add(summed)[:NI]
            gU = jnp.zeros_like(p['U']).at[bu].add(gu)

            updates, opt_state = tx.update({'U': gU, 'I': gI},
                                           opt_state, p)
            p = optax.apply_updates(p, updates)
            return (p, opt_state), loss

        (p, opt_state), losses = jax.lax.scan(
            step, (p, opt_state), (users, items, keys))
        return p, opt_state, losses.mean()

    return epoch, params, opt_state


def run_dedup_variant(label, epochs=10):
    epoch, params, opt_state = make_dedup_epoch()
    users, items = make_data()
    p = jax.tree_util.tree_map(jnp.copy, params)
    s = jax.tree_util.tree_map(jnp.copy, opt_state)
    p, s, loss = epoch(p, s, jax.random.PRNGKey(1), users, items)
    float(loss)
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
    if which in ('sortprobe', 'all'):
        sort_probe()
    if which in ('lazyadam', 'all'):
        run_lazy_variant('lazy adam (sort+segment)', 'sort')
    if which in ('lazydense', 'all'):
        run_lazy_variant('lazy adam (dense grad buffer)', 'dense')
    if which in ('lazyfused', 'all'):
        run_lazy_variant('lazy adam (sort, fused bias)', 'sortb')
    if which in ('handadam',):
        run_epoch_variant('fused bias + hand-rolled adam', 'fused',
                          mode='handadam')
    if which in ('fusedbias2',):
        run_epoch_variant('fused bias column (rerun)', 'fused')
    if which in ('scatterprobe', 'all'):
        scatter_probe()
    if which in ('dedup', 'all'):
        run_dedup_variant('fused bias + item-grad dedup')


if __name__ == '__main__':
    main()
