"""Inverted dropout.

Reference: src/module.cu:3-99 — in-place inverted dropout with a Philox pool,
mask kept only when the input needs grad, no-op in evaluation. Functionally
pure here: threefry key in, fresh array out; the eval no-op and the backward
masking fall out of JAX autograd (the VJP of ``x * mask / keep`` is exactly the
reference's backward kernel src/module.cu:80-99).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dropout(x: jnp.ndarray, rate: float, key: jax.Array, training: bool = True):
    """Keep each element with prob ``1-rate`` and scale survivors by 1/(1-rate).

    ``rate`` and ``training`` are trace-time constants: at rate 0 or in eval
    this compiles to nothing (reference: src/module.cu:67-68).
    """
    if not training or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, p=keep, shape=x.shape)
    return jnp.where(mask, x / jnp.asarray(keep, dtype=x.dtype), 0.0).astype(x.dtype)
