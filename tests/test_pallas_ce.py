"""Fused Pallas masked-CE kernel vs the golden XLA expression."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import parallel_gcn_tpu.ops.pallas_ce as pce
from parallel_gcn_tpu.ops.loss import masked_softmax_xent


@pytest.fixture(autouse=True)
def interpret_mode():
    old = pce._INTERPRET[0]
    pce._INTERPRET[0] = True
    yield
    pce._INTERPRET[0] = old


def _case(n, c, seed=0):
    rng = np.random.default_rng(seed)
    logits = jnp.asarray(rng.standard_normal((n, c)).astype(np.float32) * 3)
    labels = jnp.asarray(rng.integers(0, c, n).astype(np.int32))
    mask = jnp.asarray(rng.random(n) < 0.4)
    num = max(int(np.asarray(mask).sum()), 1)
    return logits, labels, mask, num


@pytest.mark.parametrize("n,c", [(1024, 41), (1024, 7), (700, 41), (512, 3)])
def test_fused_ce_matches_xla(n, c):
    logits, labels, mask, num = _case(n, c)
    loss_x, acc_x = masked_softmax_xent(logits, labels, mask, num)
    loss_p, acc_p = pce.masked_softmax_xent_fused(logits, labels, mask, num)
    np.testing.assert_allclose(float(loss_p), float(loss_x), rtol=1e-5)
    np.testing.assert_allclose(float(acc_p), float(acc_x), rtol=0, atol=1e-6)


@pytest.mark.parametrize("n,c", [(1024, 41), (700, 5)])
def test_fused_ce_grad_matches_xla(n, c):
    logits, labels, mask, num = _case(n, c, seed=3)
    gx = jax.grad(lambda l: masked_softmax_xent(l, labels, mask, num)[0])(logits)
    gp = jax.grad(
        lambda l: pce.masked_softmax_xent_fused(l, labels, mask, num)[0]
    )(logits)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), rtol=2e-5,
                               atol=1e-7)
    # cotangent scaling flows through the saved-grad rescale
    gp2 = jax.grad(
        lambda l: 3.0 * pce.masked_softmax_xent_fused(l, labels, mask, num)[0]
    )(logits)
    np.testing.assert_allclose(np.asarray(gp2), 3.0 * np.asarray(gx),
                               rtol=2e-5, atol=1e-7)


def test_fused_ce_padded_rows_are_inert():
    """Rows past a block boundary with mask=False must not contribute."""
    logits, labels, mask, num = _case(600, 11, seed=5)
    # same data embedded in a longer padded array (mask already False there)
    big_logits = jnp.concatenate(
        [logits, jnp.full((424, 11), 1e9, jnp.float32)], axis=0
    )
    big_labels = jnp.concatenate([labels, jnp.zeros(424, jnp.int32)])
    big_mask = jnp.concatenate([mask, jnp.zeros(424, bool)])
    a = pce.masked_softmax_xent_fused(logits, labels, mask, num)
    b = pce.masked_softmax_xent_fused(big_logits, big_labels, big_mask, num)
    np.testing.assert_allclose(float(a[0]), float(b[0]), rtol=1e-6)
    np.testing.assert_allclose(float(a[1]), float(b[1]), atol=1e-7)
