"""Fused block-sparse tile attention (ops/tile_attention.py) — op-level
gradient checks vs a dense-mask autodiff reference, GAT tile-backend parity
vs golden.golden_gat_forward and vs the segment backend (VERDICT round-2
item 2: the SDDMM/SpMM tile machinery wired into GAT)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallel_gcn_tpu.config import AdamConfig, Config, GCNConfig, TPUConfig, TrainConfig
from parallel_gcn_tpu.data.graph import build_graph, random_graph
from parallel_gcn_tpu.golden import golden_gat_forward
from parallel_gcn_tpu.models.gat import GATModel, init_gat_params
from parallel_gcn_tpu.ops import pallas_bcsr
from parallel_gcn_tpu.ops.tile_attention import gat_attend_tiles
from parallel_gcn_tpu.train import build_model, fit

SLOPE = 0.2


@pytest.fixture(autouse=True)
def _interpret_mode():
    old = pallas_bcsr._INTERPRET[0]
    pallas_bcsr._INTERPRET[0] = jax.default_backend() == "cpu"
    yield
    pallas_bcsr._INTERPRET[0] = old


def _edge_mask(graph):
    """Dense boolean edge pattern covering the pack tiles + COO residual."""
    n = graph.n_nodes
    mask = np.zeros((n, n), bool)
    pk = graph.bcsr
    tiles = np.asarray(pk.tiles)
    tr, tc = np.asarray(pk.tile_rows), np.asarray(pk.tile_cols)
    R, C = pk.tile_r, pk.tile_c
    for i in range(tiles.shape[0]):
        mask[tr[i] * R:(tr[i] + 1) * R, tc[i] * C:(tc[i] + 1) * C] |= (
            tiles[i] != 0
        )
    if graph.is_hybrid:
        live = np.asarray(graph.val) != 0
        mask[np.asarray(graph.row)[live], np.asarray(graph.col)[live]] = True
    return mask


def _dense_attend(mask, s, t, v):
    e = s[:, None, :] + t[None, :, :]
    e = jnp.where(e >= 0, e, SLOPE * e)
    e = jnp.where(mask[:, :, None], e, -1e9)
    a = jax.nn.softmax(e, axis=1)
    a = jnp.where(mask[:, :, None], a, 0.0)
    return jnp.einsum("ijh,jhd->ihd", a, v)


@pytest.mark.parametrize("tile_c,min_nnz,tile_dtype,label", [
    (128, 120, "float32", "hybrid square (real residual)"),
    (256, 120, "float32", "hybrid rectangular tiles"),
    (128, 0, "float32", "pure pack (empty residual)"),
    (128, 120, "int8", "int8 pattern tiles"),
])
def test_tile_attention_matches_dense_autodiff(tile_c, min_nnz, tile_dtype,
                                               label):
    """Forward AND (s, t, v) gradients of the fused kernel pair must match
    the dense masked-softmax autodiff reference on every pack geometry —
    incl. the flash merge with a live COO residual and the mirrored-traversal
    column gradients."""
    csr, _ = random_graph(300, 8, seed=5)
    g = build_graph(csr, hybrid=True, min_tile_nnz=min_nnz or None,
                    tile_size=128, tile_cols=tile_c,
                    tile_dtype=np.dtype(tile_dtype))
    if min_nnz:
        assert g.is_hybrid, "fixture must exercise the residual merge"
        assert int((np.asarray(g.val) != 0).sum()) > 0
    n = g.n_nodes
    H, D = 3, 5
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.standard_normal((n, H)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((n, H)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((n, H, D)).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((n, H, D)).astype(np.float32))
    mask = jnp.asarray(_edge_mask(g))

    out = gat_attend_tiles(g, s, t, v, slope=SLOPE)
    expected = _dense_attend(mask, s, t, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=2e-5, atol=2e-6, err_msg=label)

    grads_tile = jax.grad(
        lambda s, t, v: jnp.sum(gat_attend_tiles(g, s, t, v, slope=SLOPE)
                                * cot),
        argnums=(0, 1, 2),
    )(s, t, v)
    grads_dense = jax.grad(
        lambda s, t, v: jnp.sum(_dense_attend(mask, s, t, v) * cot),
        argnums=(0, 1, 2),
    )(s, t, v)
    for name, a, b in zip(("ds", "dt", "dv"), grads_tile, grads_dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"{label}: {name}")


def test_wide_tiles_split_for_attention(monkeypatch):
    """Packs wider than _MAX_TILE_C (the GCN's tuned 512x1024 reddit tiles
    blow the attention kernels' 16 MB VMEM scope) are view-split into column
    strips at op entry — forward and gradients must be identical to the
    unsplit evaluation (the split is a pure re-tiling of the same edge set)."""
    import parallel_gcn_tpu.ops.tile_attention as ta

    csr, _ = random_graph(300, 8, seed=5)
    g = build_graph(csr, hybrid=True, min_tile_nnz=60, tile_size=128,
                    tile_cols=256)
    n = g.n_nodes
    H, D = 2, 4
    rng = np.random.default_rng(1)
    s = jnp.asarray(rng.standard_normal((n, H)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((n, H)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((n, H, D)).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((n, H, D)).astype(np.float32))

    def run():
        out = gat_attend_tiles(g, s, t, v, slope=SLOPE)
        grads = jax.grad(
            lambda s, t, v: jnp.sum(gat_attend_tiles(g, s, t, v, slope=SLOPE)
                                    * cot),
            argnums=(0, 1, 2),
        )(s, t, v)
        return [np.asarray(x) for x in (out, *grads)]

    plain = run()
    monkeypatch.setattr(ta, "_MAX_TILE_C", 128)  # force the split path
    tiles, trow, tcol = ta._split_wide(g.bcsr.tiles, g.bcsr.tile_rows,
                                       g.bcsr.tile_cols)
    assert tiles.shape[1:] == (128, 128)
    assert tiles.shape[0] == 2 * g.bcsr.tiles.shape[0]
    assert bool((np.diff(np.asarray(trow)) >= 0).all())  # stays row-sorted
    split = run()
    for name, a, b in zip(("out", "ds", "dt", "dv"), plain, split):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6, err_msg=name)


@pytest.mark.parametrize("n_layers,heads", [(2, 1), (2, 4), (3, 2)])
def test_gat_tile_backend_matches_golden(n_layers, heads):
    """GATModel backend='tile' on a hybrid-built graph must reproduce the
    NumPy oracle — the same bar the dense/segment backends meet
    (test_gat.test_gat_forward_matches_golden)."""
    csr, _ = random_graph(300, 8, seed=3)
    g = build_graph(csr, hybrid=True, min_tile_nnz=120, tile_size=128)
    assert g.is_hybrid
    n_real = csr.n_rows
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n_real, 10)).astype(np.float32)
    xp = np.zeros((g.n_nodes, 10), np.float32)
    xp[:n_real] = x
    hidden = [6] * (n_layers - 1)
    params = init_gat_params(jax.random.PRNGKey(1), 10, hidden, 4, heads)
    expected = golden_gat_forward(jax.tree.map(np.asarray, params), x, csr,
                                  heads)
    model = GATModel(n_layers=n_layers, dropouts=(0.0,) * n_layers,
                     heads=heads, backend="tile", precision="highest")
    out = np.asarray(model.apply(params, jnp.asarray(xp), g, training=False))
    np.testing.assert_allclose(out[:n_real], expected, rtol=2e-5, atol=2e-5)


def test_gat_tile_backend_gradient_matches_segment():
    """Loss gradients through the full model must agree between the tile and
    segment backends (the tile graph's hybrid split vs the complete COO)."""
    csr, _ = random_graph(300, 8, seed=7)
    g_tile = build_graph(csr, hybrid=True, min_tile_nnz=120, tile_size=128)
    g_seg = build_graph(csr, n_nodes_pad=g_tile.n_nodes)
    assert g_tile.is_hybrid
    n = g_tile.n_nodes
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((n, 9)).astype(np.float32))
    params = init_gat_params(jax.random.PRNGKey(3), 9, [5], 4, heads=3)

    def loss(params, backend, graph):
        model = GATModel(n_layers=2, dropouts=(0.0, 0.0), heads=3,
                         backend=backend, precision="highest")
        logits = model.apply(params, x, graph, training=False)
        return jnp.sum(logits * jnp.cos(logits))

    l_t, g_t = jax.value_and_grad(loss)(params, "tile", g_tile)
    l_s, g_s = jax.value_and_grad(loss)(params, "segment", g_seg)
    assert float(l_t) == pytest.approx(float(l_s), rel=2e-5)
    for a, b in zip(jax.tree.leaves(g_t), jax.tree.leaves(g_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("mode", ["scan", "eager"])
def test_gat_tile_trains_end_to_end(mode):
    """model=gat backend=hybrid through the standard trainer: build_model
    routes to the tile backend, training learns the separable problem, and
    remat composes with the custom-VJP attention op."""
    from parallel_gcn_tpu.data.parser import Dataset, to_device

    from tests.test_model import _synthetic

    csr, x, labels, split = _synthetic()
    ds = Dataset(name="t", graph=csr, feature_csr=None, features=x,
                 labels=labels, split=split, n_nodes=csr.n_rows,
                 input_dim=x.shape[1], output_dim=int(labels.max()) + 1)
    cfg = Config(
        gcn=GCNConfig(n_layers=2, hidden_dims=(8,), dropouts=(0.1, 0.1),
                      epochs=40, early_stopping=0, model="gat", heads=2,
                      remat=True),
        adam=AdamConfig(learning_rate=0.02, weight_decay=5e-4),
        tpu=TPUConfig(backend="hybrid", min_tile_nnz=8,
                      matmul_precision="highest", seed=4),
        train=TrainConfig(verbose=False, mode=mode),
    )
    dds = to_device(ds, hybrid=True, min_tile_nnz=8)
    model = build_model(cfg, dds)
    assert model.backend == "tile"
    res = fit(cfg, dds)
    assert res.history[-1, 0] < res.history[0, 0]
    assert res.test_acc > 0.6, res.test_acc
    assert np.isfinite(res.history).all()


def test_gat_tile_rejects_unsupported_config():
    """Config-time errors: attn_dropout and edge_chunk have no tile-backend
    implementation — loud errors, not silent degradation."""
    from parallel_gcn_tpu.data.parser import Dataset, to_device

    csr, _ = random_graph(140, 6, seed=2)
    n = csr.n_rows
    rng = np.random.default_rng(0)
    ds = Dataset(name="t", graph=csr, feature_csr=None,
                 features=rng.standard_normal((n, 8)).astype(np.float32),
                 labels=rng.integers(0, 3, n).astype(np.int32),
                 split=np.ones(n, np.int32), n_nodes=n, input_dim=8,
                 output_dim=3)
    dds = to_device(ds, hybrid=True, min_tile_nnz=8)

    def cfg(**kw):
        gcn = dict(n_layers=2, hidden_dims=(8,), dropouts=(0.0, 0.0),
                   model="gat", heads=2)
        tpu = dict(backend="hybrid")
        gcn.update({k: v for k, v in kw.items() if k in ("attn_dropout",)})
        tpu.update({k: v for k, v in kw.items() if k in ("edge_chunk",)})
        return Config(gcn=GCNConfig(**gcn), tpu=TPUConfig(**tpu),
                      train=TrainConfig(verbose=False))

    with pytest.raises(ValueError, match="attn_dropout"):
        build_model(cfg(attn_dropout=0.5), dds)
    with pytest.raises(ValueError, match="edge_chunk"):
        build_model(cfg(edge_chunk=1024), dds)
    assert build_model(cfg(), dds).backend == "tile"
