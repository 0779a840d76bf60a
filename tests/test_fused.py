"""Fused dropout+matmul kernel (ops/pallas_fused.py).

On CPU the kernel runs in TPU-interpret mode where the hardware PRNG returns
degenerate (all-zero) bits → the mask keeps everything. The identity-based
tests (forward == recovered-mask @ W, gradients == analytic forms) hold for
ANY mask, so they verify the contraction/masking/in-bounds logic on CPU;
drop-rate statistics and seed sensitivity are TPU-only.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from parallel_gcn_tpu.ops import pallas_fused
from parallel_gcn_tpu.ops.pallas_fused import dropout_matmul

on_tpu = jax.default_backend() not in ("cpu",)
requires_tpu = pytest.mark.skipif(not on_tpu, reason="needs real TPU PRNG")


@pytest.fixture(autouse=True)
def _interpret():
    old = pallas_fused._INTERPRET[0]
    pallas_fused._INTERPRET[0] = (
        pltpu.InterpretParams() if jax.default_backend() == "cpu" else False
    )
    yield
    pallas_fused._INTERPRET[0] = old


def _masked_x(x, seed, rate):
    """Recover the kernel's exact masked input: (mask ⊙ x)/keep = Y @ I."""
    eye = jnp.eye(x.shape[1], dtype=jnp.float32)
    return np.asarray(dropout_matmul(x, eye, seed, rate))


@pytest.mark.parametrize("shape", [(96, 200), (300, 513), (64, 128)])
def test_forward_equals_masked_matmul(shape):
    """Y must equal (recovered masked x) @ W exactly — locks mask consistency
    across different W and the in-bounds handling of ragged shapes."""
    rng = np.random.default_rng(0)
    n, k = shape
    x = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, 24)).astype(np.float32))
    seed = jnp.asarray(42, jnp.int32)
    rate = 0.4
    xm = _masked_x(x, seed, rate)
    y = np.asarray(dropout_matmul(x, w, seed, rate))
    np.testing.assert_allclose(y, xm @ np.asarray(w), rtol=1e-4, atol=1e-4)
    # kept entries are exactly x / keep (zeros appear only where dropped)
    keepm = xm != 0
    np.testing.assert_allclose(
        xm[keepm], np.asarray(x)[keepm] / (1 - rate), rtol=1e-6
    )


def test_gradients_match_recovered_mask():
    rng = np.random.default_rng(1)
    n, k, m = 120, 300, 16
    x = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, m)).astype(np.float32))
    g = rng.standard_normal((n, m)).astype(np.float32)
    seed = jnp.asarray(7, jnp.int32)
    rate = 0.3

    xm = _masked_x(x, seed, rate)  # mask * x / keep

    def loss(x, w):
        return jnp.vdot(dropout_matmul(x, w, seed, rate), jnp.asarray(g))

    dx, dw = jax.grad(loss, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dw), xm.T @ g, rtol=1e-4, atol=1e-4)
    mask = (xm != 0).astype(np.float32) / (1 - rate)
    np.testing.assert_allclose(
        np.asarray(dx), mask * (g @ np.asarray(w).T), rtol=1e-4, atol=1e-4
    )


def test_same_seed_reproduces_same_output():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((64, 256)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((256, 8)).astype(np.float32))
    seed = jnp.asarray(5, jnp.int32)
    a = np.asarray(dropout_matmul(x, w, seed, 0.5))
    b = np.asarray(dropout_matmul(x, w, seed, 0.5))
    np.testing.assert_array_equal(a, b)


@requires_tpu
def test_drop_statistics_and_seed_sensitivity():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((512, 1024)).astype(np.float32))
    rate = 0.4
    xm = _masked_x(x, jnp.asarray(11, jnp.int32), rate)
    assert abs((xm == 0).mean() - rate) < 0.02
    w = jnp.asarray(rng.standard_normal((1024, 8)).astype(np.float32))
    a = np.asarray(dropout_matmul(x, w, jnp.asarray(1, jnp.int32), rate))
    b = np.asarray(dropout_matmul(x, w, jnp.asarray(2, jnp.int32), rate))
    assert not np.allclose(a, b)


def test_model_uses_fused_path_and_learns():
    """End-to-end: GCN with fused dropout-matmul trains on the synthetic
    problem (CPU: degenerate all-keep mask — still exercises the full path)."""
    from parallel_gcn_tpu.config import Config, GCNConfig, TPUConfig, TrainConfig
    from parallel_gcn_tpu.data.graph import random_graph
    from parallel_gcn_tpu.data.parser import Dataset, to_device
    from parallel_gcn_tpu.train import fit

    rng = np.random.default_rng(3)
    n, f, c = 200, 12, 3
    csr, _ = random_graph(n, 6, seed=3)
    labels = rng.integers(0, c, n).astype(np.int32)
    feats = rng.standard_normal((n, f)).astype(np.float32)
    feats[np.arange(n), labels] += 2.0
    split = rng.choice([1, 2, 3], size=n, p=[.5, .25, .25]).astype(np.int32)
    ds = Dataset(name="t", graph=csr, feature_csr=None, features=feats,
                 labels=labels, split=split, n_nodes=n, input_dim=f, output_dim=c)
    dds = to_device(ds)
    cfg = Config(
        gcn=GCNConfig(n_layers=2, hidden_dims=(8,), dropouts=(0.3, 0.3),
                      epochs=25, early_stopping=0),
        tpu=TPUConfig(backend="segment", dropout_impl="pallas",
                      fuse_dropout_matmul=True, input_preagg=False),
        train=TrainConfig(verbose=False, mode="scan"),
    )
    res = fit(cfg, dds)
    assert np.isfinite(res.history).all()
    assert res.history[-1, 0] < res.history[0, 0]
    if on_tpu:
        # on CPU the degenerate all-keep mask scales train activations by
        # 1/keep while eval does not — accuracy is only meaningful on TPU
        assert res.test_acc > 0.5


@requires_tpu
def test_mask_bitidentical_to_standalone_dropout():
    """The fused kernel and the standalone Pallas dropout share
    mask_block_geometry + per-block seeding, so the SAME seed yields the
    bit-identical mask: flipping fuse_dropout_matmul must not change a
    training trajectory (tuned seeds keep their accuracy)."""
    from parallel_gcn_tpu.ops.pallas_dropout import dropout_pallas

    rng = np.random.default_rng(0)
    # cross a block boundary in both axes (geometry: rows=256, f_tile=2048)
    x = jnp.asarray(rng.standard_normal((300, 2100)).astype(np.float32))
    seed = jnp.asarray(17, jnp.int32)
    ref = np.asarray(dropout_pallas(x, seed, 0.4))
    # recover the fused kernel's masked X in 128-column identity strips
    # (the w block is [bk, nout] in VMEM — real callers have nout <= 72)
    cols = []
    eye = np.eye(2100, dtype=np.float32)
    for lo in range(0, 2100, 128):
        sel = jnp.asarray(eye[:, lo:lo + 128])
        # highest: true-f32 passes, so the identity recovery is exact
        cols.append(np.asarray(dropout_matmul(x, sel, seed, 0.4, True)))
    fused = np.concatenate(cols, axis=1)
    np.testing.assert_array_equal(ref != 0, fused != 0)
    np.testing.assert_allclose(ref, fused, rtol=1e-6)
    assert 0.35 < (ref == 0).mean() < 0.45
