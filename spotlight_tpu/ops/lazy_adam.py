"""Row-sparse (lazy) Adam core: touched-rows moment updates.

Shared by the factorization and sequence lazy engines (see
`spotlight_tpu/factorization/lazy.py` for the design rationale and
the torch-SparseAdam semantics statement).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lazy_adam_init(params):
    """Optimizer state: dense-shaped moments (allocated once, touched
    sparsely) plus the global step counter.

    Moments are always float32 — with ``table_dtype=bfloat16`` parameters
    the moment accumulators keep full precision (the separate-arrays
    layout makes mixed precision free; the update math runs in float32
    and only the final delta is cast to the table dtype)."""
    def zeros32(param):
        return jnp.zeros(param.shape, jnp.float32)

    return {'mu': jax.tree_util.tree_map(zeros32, params),
            'nu': jax.tree_util.tree_map(zeros32, params),
            't': jnp.zeros((), jnp.int32)}


def sparse_adam_rows(ids, param, mu, nu, grad_rows, t, lr, l2=0.0,
                     b1=0.9, b2=0.999, eps=1e-8):
    """Adam update restricted to the rows named by ``ids``.

    Duplicated ids have their gradient rows summed (sort + segment-sum —
    identical to what a dense scatter-add accumulates), then each distinct
    row's moments update exactly once.  ``l2`` adds the reference's
    coupled weight decay (``grad += l2 * param``) once per distinct row.

    Parameters
    ----------
    ids : int array, any shape — occurrence row ids
    param, mu, nu : (num_rows, width) tables
    grad_rows : ``ids.shape + (width,)`` per-occurrence gradient rows
    t : scalar int — global Adam step (bias correction)

    Returns
    -------
    (param, mu, nu) updated.
    """
    num_rows = param.shape[0]
    flat_ids = ids.reshape(-1).astype(jnp.int32)
    flat_grads = grad_rows.reshape(flat_ids.shape[0], -1)
    n = flat_ids.shape[0]

    order = jnp.argsort(flat_ids)
    s_ids = flat_ids[order]
    head = jnp.concatenate([jnp.ones((1,), bool), s_ids[1:] != s_ids[:-1]])
    seg = jnp.cumsum(head) - 1
    uids = jax.ops.segment_max(s_ids, seg, num_segments=n)
    valid = jnp.arange(n) < head.sum()
    uids = jnp.where(valid, uids, num_rows)  # out-of-bounds -> drop/fill

    summed = jax.ops.segment_sum(flat_grads[order], seg, num_segments=n)
    # Update math runs in the moments' dtype (float32 even for bfloat16
    # tables); only the final delta is cast to the table's storage dtype.
    summed = summed.astype(mu.dtype)
    if l2:
        rows = param.at[uids].get(mode='fill', fill_value=0)
        summed = summed + l2 * rows.astype(summed.dtype) * valid[:, None]

    m0 = mu.at[uids].get(mode='fill', fill_value=0)
    v0 = nu.at[uids].get(mode='fill', fill_value=0)
    m = b1 * m0 + (1 - b1) * summed
    v = b2 * v0 + (1 - b2) * summed * summed
    m_hat = m / (1 - b1 ** t)
    v_hat = v / (1 - b2 ** t)
    delta = -lr * m_hat / (jnp.sqrt(v_hat) + eps)
    param = param.at[uids].add(delta.astype(param.dtype), mode='drop')
    mu = mu.at[uids].set(m, mode='drop')
    nu = nu.at[uids].set(v, mode='drop')
    return param, mu, nu


