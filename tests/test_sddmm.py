"""SDDMM Pallas kernel (TPU-interpret mode on CPU) vs dense reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import parallel_gcn_tpu.ops.pallas_bcsr as pb
from parallel_gcn_tpu.data.graph import build_graph, random_graph
from parallel_gcn_tpu.ops.pallas_sddmm import sddmm_bcsr


@pytest.fixture(autouse=True)
def interpret_mode():
    old = pb._INTERPRET[0]
    pb._INTERPRET[0] = True
    yield
    pb._INTERPRET[0] = old


def _pack_and_dense_scores(n=260, k=32, seed=0):
    csr, _ = random_graph(n, 6, seed=seed)
    graph = build_graph(csr, bcsr=True)
    pack = graph.bcsr
    rng = np.random.default_rng(seed + 1)
    a = rng.standard_normal((pack.n_nodes, k)).astype(np.float32)
    b = rng.standard_normal((pack.n_nodes, k)).astype(np.float32)
    return pack, jnp.asarray(a), jnp.asarray(b), a @ b.T


def _tiles_from_dense(pack, dense):
    """Slice the dense score matrix into the pack's tile positions."""
    tr, tc = pack.tile_r, pack.tile_c
    rows = np.asarray(pack.tile_rows)
    cols = np.asarray(pack.tile_cols)
    out = np.zeros((pack.n_tiles, tr, tc), np.float32)
    for t, (r, c) in enumerate(zip(rows, cols)):
        out[t] = dense[r * tr : (r + 1) * tr, c * tc : (c + 1) * tc]
    return out


def test_sddmm_matches_dense():
    pack, a, b, dense = _pack_and_dense_scores()
    tiles = np.asarray(sddmm_bcsr(pack, a, b))
    np.testing.assert_allclose(tiles, _tiles_from_dense(pack, dense),
                               rtol=2e-5, atol=2e-5)


def test_sddmm_grads_match_dense():
    """d/da, d/db of a pattern-masked score loss vs the dense formulation."""
    pack, a, b, _ = _pack_and_dense_scores(n=200, k=16, seed=3)
    # weight each score tile by the pack's (symmetric) Â values — this is the
    # edge-masked loss a GAT-style consumer produces
    w_tiles = jnp.asarray(np.asarray(pack.tiles))

    def loss(a, b):
        return jnp.sum(sddmm_bcsr(pack, a, b) * w_tiles)

    da, db = jax.grad(loss, argnums=(0, 1))(a, b)

    # dense reference: L = sum(W ⊙ (A Bᵀ)) with W the dense masked values
    n = pack.n_nodes
    tr = pack.tile_r
    rows = np.asarray(pack.tile_rows)
    cols = np.asarray(pack.tile_cols)
    W = np.zeros((n, n), np.float32)
    for t, (r, c) in enumerate(zip(rows, cols)):
        W[r * tr : (r + 1) * tr, c * tr : (c + 1) * tr] = np.asarray(
            pack.tiles[t]
        )
    an, bn = np.asarray(a), np.asarray(b)
    np.testing.assert_allclose(np.asarray(da), W @ bn, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(db), W.T @ an, rtol=2e-5, atol=2e-5)


def test_mirror_perm_present_and_involutive():
    pack, *_ = _pack_and_dense_scores(n=300, seed=5)
    assert pack.mirror_perm is not None
    perm = np.asarray(pack.mirror_perm)
    rows = np.asarray(pack.tile_rows)
    cols = np.asarray(pack.tile_cols)
    np.testing.assert_array_equal(rows[perm], cols)
    np.testing.assert_array_equal(cols[perm], rows)
    np.testing.assert_array_equal(perm[perm], np.arange(len(perm)))
