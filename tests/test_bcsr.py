"""BCSR Pallas SpMM tests (TPU-interpret mode on CPU) + RCM reordering tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import parallel_gcn_tpu.ops.pallas_bcsr as pb
from parallel_gcn_tpu.data.graph import build_graph, random_graph
from parallel_gcn_tpu.data.reorder import permute_csr, rcm_permutation
from parallel_gcn_tpu.golden import csr_matvec_dense
from parallel_gcn_tpu.ops.graphsum import graphsum


@pytest.fixture(autouse=True)
def interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    old = pb._INTERPRET[0]
    pb._INTERPRET[0] = pltpu.InterpretParams()
    yield
    pb._INTERPRET[0] = old


@pytest.mark.parametrize("n,f", [(200, 64), (300, 130)])
def test_bcsr_matmul_matches_golden(n, f):
    csr, _ = random_graph(n, 6, seed=1)
    graph = build_graph(csr, bcsr=True)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((graph.n_nodes, f)).astype(np.float32)
    out = np.asarray(pb.bcsr_matmul(graph.bcsr, jnp.asarray(x)))
    expected = csr_matvec_dense(csr, x[: csr.n_rows])
    np.testing.assert_allclose(out[: csr.n_rows], expected, rtol=2e-5, atol=2e-5)
    # padded rows produce zeros (explicit zero tiles cover empty tile-rows)
    np.testing.assert_allclose(out[csr.n_rows :], 0.0, atol=1e-7)


def test_bcsr_through_graphsum_and_vjp():
    csr, _ = random_graph(150, 5, seed=2)
    graph = build_graph(csr, bcsr=True)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((graph.n_nodes, 32)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((graph.n_nodes, 32)).astype(np.float32))

    out = graphsum(x, graph, backend="bcsr")
    expected = graphsum(x, graph, backend="segment")
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=2e-5, atol=2e-5)

    _, vjp = jax.vjp(lambda x: graphsum(x, graph, backend="bcsr"), x)
    (dx,) = vjp(g)
    expected_dx = graphsum(g, graph, backend="segment")
    np.testing.assert_allclose(
        np.asarray(dx), np.asarray(expected_dx), rtol=2e-5, atol=2e-5
    )


def test_bcsr_tile_rows_sorted_and_covering():
    csr, _ = random_graph(500, 4, seed=3)
    graph = build_graph(csr, bcsr=True)
    rows = np.asarray(graph.bcsr.tile_rows)
    assert (np.diff(rows) >= 0).all()
    assert set(range(graph.n_nodes // 128)) <= set(rows.tolist())


def test_rcm_reduces_bandwidth():
    csr, _ = random_graph(400, 6, seed=4)
    perm = rcm_permutation(csr)
    assert sorted(perm.tolist()) == list(range(400))
    permuted = permute_csr(csr, perm)

    def bandwidth(c):
        rows = c.row_ids().astype(np.int64)
        return int(np.abs(rows - c.indices).max())

    assert bandwidth(permuted) <= bandwidth(csr)
    # permuted graph is the same graph: aggregation commutes with permutation
    rng = np.random.default_rng(0)
    x = rng.standard_normal((400, 8)).astype(np.float32)
    inv = np.empty(400, dtype=np.int64)
    inv[perm] = np.arange(400)
    out_orig = csr_matvec_dense(csr, x)
    out_perm = csr_matvec_dense(permuted, x[perm])
    np.testing.assert_allclose(out_perm, out_orig[perm], rtol=1e-5, atol=1e-5)


def test_rcm_tile_reduction_on_real_graph():
    """RCM should cut the BCSR tile count on a citation graph."""
    try:
        from parallel_gcn_tpu.data.parser import load_dataset

        ds = load_dataset("cora", use_native=False)
    except FileNotFoundError:
        pytest.skip("cora not available")
    csr = ds.graph
    perm = rcm_permutation(csr)
    permuted = permute_csr(csr, perm)
    g_orig = build_graph(csr, bcsr=True)
    g_perm = build_graph(permuted, bcsr=True)
    assert g_perm.bcsr.n_tiles < g_orig.bcsr.n_tiles


@pytest.mark.parametrize("hybrid", [False, True])
def test_int8_pattern_pack_matches_golden(hybrid):
    """int8 tiles store the exact 0/1 pattern; out = d ⊙ B(d ⊙ x) must equal
    the value-tile result to f32 tolerance (factorization, not quantization)."""
    csr, _ = random_graph(300, 6, seed=4)
    kw = dict(hybrid=True, min_tile_nnz=2) if hybrid else dict(bcsr=True)
    graph = build_graph(csr, tile_dtype=np.int8, **kw)
    b = graph.bcsr
    assert b.tiles.dtype == jnp.int8
    assert b.sym_scale is not None and b.sym_scale.shape[0] == b.n_nodes
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((graph.n_nodes, 32)).astype(np.float32))
    backend = "hybrid" if graph.is_hybrid else "bcsr"
    out = graphsum(x, graph, backend=backend)
    ref_graph = build_graph(csr, **kw)
    expected = graphsum(x, ref_graph, backend=backend)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), rtol=2e-5, atol=2e-5
    )
    # VJP: diag(d)·B·diag(d) is symmetric -> backward equals forward
    g = jnp.asarray(rng.standard_normal((graph.n_nodes, 32)).astype(np.float32))
    _, vjp = jax.vjp(lambda x: graphsum(x, graph, backend=backend), x)
    (dx,) = vjp(g)
    expected_dx = graphsum(g, ref_graph, backend=backend)
    np.testing.assert_allclose(
        np.asarray(dx), np.asarray(expected_dx), rtol=2e-5, atol=2e-5
    )


def test_int8_pack_rejects_nonfactoring_values():
    csr, _ = random_graph(100, 4, seed=5)
    bad = csr.values.copy()
    # break v_ij = k·d_i·d_j with a NON-integer factor (an integer one is a
    # legitimate duplicate-edge multiplicity under the exact sym_scale)
    bad[0] *= 1.7
    import dataclasses as dc

    broken = dc.replace(csr, values=bad)
    with pytest.raises(ValueError):
        build_graph(broken, bcsr=True, tile_dtype=np.int8)
    # without the carried scale the recovery must also refuse
    broken2 = dc.replace(csr, values=bad, sym_scale=None)
    with pytest.raises(ValueError):
        build_graph(broken2, bcsr=True, tile_dtype=np.int8)
