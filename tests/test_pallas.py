"""Pallas kernel tests.

On CPU the kernels run in TPU-interpret mode (pltpu.InterpretParams), which
executes the kernel logic but returns degenerate (all-zero) PRNG bits — so CPU
tests check structure (shapes, scaling, fwd/bwd mask consistency) and the
statistical tests are TPU-only (run on real hardware by bench/CI on-chip).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from parallel_gcn_tpu.ops.pallas_dropout import _run_kernel, dropout_pallas, key_to_seed

INTERP = pltpu.InterpretParams()

on_tpu = jax.default_backend() not in ("cpu",)
requires_tpu = pytest.mark.skipif(not on_tpu, reason="needs real TPU PRNG")


@pytest.mark.parametrize("shape", [(64, 128), (100, 257), (1000, 64)])
def test_pallas_dropout_structure(shape):
    """Interpret mode: kernel runs, output values are in {0, x/keep}."""
    x = jnp.ones(shape, jnp.float32)
    out = np.asarray(_run_kernel(x, jnp.asarray(7, jnp.int32), 0.4, INTERP))
    assert out.shape == shape
    vals = np.unique(out)
    assert set(np.round(vals, 5)).issubset({0.0, np.float32(np.round(1 / 0.6, 5))})


def test_pallas_dropout_vjp_mask_consistency():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((128, 96)), jnp.float32)
    seed = jnp.asarray(3, jnp.int32)
    fwd = lambda x: dropout_pallas(x, seed, 0.3, INTERP)
    out, vjp = jax.vjp(fwd, x)
    (dx,) = vjp(jnp.full_like(x, 1.0))
    out, dx = np.asarray(out), np.asarray(dx)
    np.testing.assert_array_equal(out != 0, dx != 0)
    if (dx != 0).any():
        np.testing.assert_allclose(dx[dx != 0], 1 / 0.7, rtol=1e-6)


@requires_tpu
def test_pallas_dropout_statistics_tpu():
    x = jnp.ones((1000, 257), jnp.float32)
    seed = jnp.asarray(42, jnp.int32)
    out = np.asarray(dropout_pallas(x, seed, 0.4))
    keep_frac = (out != 0).mean()
    assert abs(keep_frac - 0.6) < 0.05
    a = np.asarray(dropout_pallas(x, seed, 0.4))
    b = np.asarray(dropout_pallas(x, jnp.asarray(43, jnp.int32), 0.4))
    np.testing.assert_array_equal(out, a)  # deterministic
    assert (out != b).any()  # seed-sensitive


def test_key_to_seed_distinct():
    k = jax.random.PRNGKey(0)
    seeds = {int(key_to_seed(jax.random.fold_in(k, i))) for i in range(32)}
    assert len(seeds) == 32
