"""Adam optimizer, bit-matching the reference's math.

Reference: src/optim.cu:42-62 — L2 decay folded into the gradient for flagged
weights only (the first layer's weight, src/gcn.cu:157-158), biased moments,
and a host-computed bias-corrected step size

    step_size = lr · sqrt(1 − β2^t) / (1 − β1^t)
    w -= step_size · m / (sqrt(v) + eps)        # eps outside the sqrt

The reference staggers per-weight update kernels across two streams so next
epoch's forward can start on already-updated weights (src/optim.cu:75-92); under
XLA the same overlap falls out of async dispatch of independent per-weight
update subgraphs — no streams to manage.

Expressed in the optax GradientTransformation shape so it composes with the
rest of the JAX ecosystem, but self-contained (no dependency on optax's adam,
whose eps placement and decay semantics differ).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp


def decayed_leaf(w0):
    """The leaf the default decay mask updates: leaf 0 of the first layer's
    params (the plain array for the GCN; the W matrix of GAT's
    {W, a_src, a_dst} dict — dict keys sort W first). The reported-loss L2
    term (train._l2_term, train_parallel.l2_penalty) must track the SAME
    leaf adam_step decays, so both route through here."""
    return jax.tree.leaves(w0)[0]


class AdamState(NamedTuple):
    step: jnp.ndarray  # int32 scalar
    m: list  # first moments, same pytree as params
    v: list  # second moments


def init_adam(params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(step=jnp.zeros((), jnp.int32), m=zeros, v=jax.tree.map(jnp.zeros_like, params))


def adam_step(
    params,
    grads,
    state: AdamState,
    *,
    learning_rate: float,
    weight_decay: float,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    decay_mask=None,
):
    """One update. ``decay_mask`` is a pytree of bools matching ``params``
    (True = apply L2); default decays only the first leaf, matching the
    reference's decays.front() = true (src/gcn.cu:157-158)."""
    leaves, treedef = jax.tree.flatten(params)
    if decay_mask is None:
        mask_leaves = [i == 0 for i in range(len(leaves))]
    else:
        mask_leaves = jax.tree.leaves(decay_mask)

    t = state.step + 1
    tf = t.astype(jnp.float32)
    b1 = jnp.float32(beta1)
    b2 = jnp.float32(beta2)
    step_size = (
        jnp.float32(learning_rate) * jnp.sqrt(1.0 - jnp.power(b2, tf)) / (1.0 - jnp.power(b1, tf))
    )

    g_leaves = jax.tree.leaves(grads)
    m_leaves = jax.tree.leaves(state.m)
    v_leaves = jax.tree.leaves(state.v)

    new_p, new_m, new_v = [], [], []
    for w, g, m, v, decay in zip(leaves, g_leaves, m_leaves, v_leaves, mask_leaves):
        g = g.astype(jnp.float32)
        if decay and weight_decay:
            g = g + jnp.float32(weight_decay) * w
        m = b1 * m + (1.0 - b1) * g
        v = b2 * v + (1.0 - b2) * g * g
        w = w - step_size * m / (jnp.sqrt(v) + jnp.float32(eps))
        new_p.append(w)
        new_m.append(m)
        new_v.append(v)

    unflatten = treedef.unflatten
    return unflatten(new_p), AdamState(step=t, m=unflatten(new_m), v=unflatten(new_v))
