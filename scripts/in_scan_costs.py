"""Attribute per-step training costs with whole-epoch timing only.

Each variant compiles one jitted scan over 122 steps (one device dispatch,
so tunnel latency is amortized away) and differs in exactly one component.

    python scripts/in_scan_costs.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

N, NU, NI, D, BS = 999_424, 100_000, 20_000, 64, 8192
STEPS = N // BS


def timed(label, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start
    print('{:32s} {:7.1f} ms/epoch ({:5.2f} ms/step)'.format(
        label, elapsed * 1e3, elapsed * 1e3 / STEPS), flush=True)


def main():
    rs = np.random.RandomState(0)
    users = jnp.asarray(rs.randint(0, NU, (STEPS, BS)), dtype=jnp.int32)
    items = jnp.asarray(rs.randint(0, NI, (STEPS, BS)), dtype=jnp.int32)
    U = jax.random.normal(jax.random.PRNGKey(0), (NU, D)) / D
    I = jax.random.normal(jax.random.PRNGKey(1), (NI, D)) / D

    @jax.jit
    def baseline(U, I):
        def step(carry, xs):
            bu, bi = xs
            return carry + jnp.float32(bu[0] + bi[0]), None

        out, _ = jax.lax.scan(step, jnp.float32(0), (users, items))
        return out

    @jax.jit
    def gathers_only(U, I):
        def step(carry, xs):
            bu, bi = xs
            return carry + U[bu].sum() + I[bi].sum(), None

        out, _ = jax.lax.scan(step, jnp.float32(0), (users, items))
        return out

    @jax.jit
    def gathers_and_dot(U, I):
        def step(carry, xs):
            bu, bi = xs
            return carry + (U[bu] * I[bi]).sum(), None

        out, _ = jax.lax.scan(step, jnp.float32(0), (users, items))
        return out

    @jax.jit
    def gathers_and_scatters(U, I):
        def step(carry, xs):
            U, I = carry
            bu, bi = xs
            g = (U[bu] * I[bi])
            U = U.at[bu].add(g * 1e-6)
            I = I.at[bi].add(g * 1e-6)
            return (U, I), None

        (U, I), _ = jax.lax.scan(step, (U, I), (users, items))
        return U

    @jax.jit
    def full_grad_step(U, I):
        def loss(params, bu, bi):
            U, I = params
            return (U[bu] * I[bi]).sum(-1).mean()

        def step(carry, xs):
            params, _ = carry, None
            bu, bi = xs
            grads = jax.grad(loss)(params, bu, bi)
            params = jax.tree_util.tree_map(
                lambda p, g: p - 1e-6 * g, params, grads)
            return params, None

        (U, I), _ = jax.lax.scan(step, (U, I), (users, items))
        return U

    timed('scan overhead only', baseline, U, I)
    timed('+ gathers (2 tables)', gathers_only, U, I)
    timed('+ gathers + dot', gathers_and_dot, U, I)
    timed('+ gathers + scatters', gathers_and_scatters, U, I)
    timed('+ autodiff sgd step', full_grad_step, U, I)


if __name__ == '__main__':
    main()
