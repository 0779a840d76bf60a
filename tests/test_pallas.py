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


# --- fused ReLU → dropout (ops/pallas_dropout.relu_dropout_pallas) ---------

from parallel_gcn_tpu.ops.pallas_dropout import relu_dropout_pallas  # noqa: E402


def test_relu_dropout_matches_composition_interpret():
    """relu_dropout_pallas(x) must equal dropout_pallas(relu(x)) bitwise —
    the two walk the same PRNG stream and masking commutes with max(·,0).
    (Interpret mode: degenerate all-keep mask; the TPU test below covers the
    real bit-walk.)"""
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((200, 300)), jnp.float32
    )
    seed = jnp.asarray(11, jnp.int32)
    fused = np.asarray(relu_dropout_pallas(x, seed, 0.4, INTERP))
    composed = np.asarray(dropout_pallas(jax.nn.relu(x), seed, 0.4, INTERP))
    np.testing.assert_array_equal(fused, composed)
    assert (fused[np.asarray(x) < 0] == 0).all()


def test_relu_dropout_vjp_mask_consistency():
    """dx is nonzero exactly where the OUTPUT is positive (kept AND x>0),
    with value g/keep — the saved-output backward, no PRNG re-walk."""
    x = jnp.asarray(
        np.random.default_rng(6).standard_normal((128, 96)), jnp.float32
    )
    seed = jnp.asarray(9, jnp.int32)
    fwd = lambda x: relu_dropout_pallas(x, seed, 0.25, INTERP)
    out, vjp = jax.vjp(fwd, x)
    (dx,) = vjp(jnp.full_like(x, 1.0))
    out, dx = np.asarray(out), np.asarray(dx)
    np.testing.assert_array_equal(out > 0, dx != 0)
    if (dx != 0).any():
        np.testing.assert_allclose(dx[dx != 0], 1 / 0.75, rtol=1e-6)
    # negative inputs never propagate gradient
    assert (dx[np.asarray(x) <= 0] == 0).all()


@requires_tpu
def test_relu_dropout_matches_composition_tpu():
    """Real hardware PRNG: the fused kernel's trajectory is bit-identical to
    the unfused relu → dropout_pallas pair (same seed → same mask), and the
    fused VJP equals the composed VJP."""
    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((1000, 257)), jnp.float32
    )
    seed = jnp.asarray(42, jnp.int32)
    fused, f_vjp = jax.vjp(lambda x: relu_dropout_pallas(x, seed, 0.4), x)
    composed, c_vjp = jax.vjp(
        lambda x: dropout_pallas(jax.nn.relu(x), seed, 0.4), x
    )
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(composed))
    g = jnp.asarray(
        np.random.default_rng(8).standard_normal(x.shape), jnp.float32
    )
    (dxf,) = f_vjp(g)
    (dxc,) = c_vjp(g)
    np.testing.assert_allclose(np.asarray(dxf), np.asarray(dxc), rtol=1e-6)
