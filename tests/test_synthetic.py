"""Synthetic dataset generator (data/synthetic.py) — structure invariants."""

import numpy as np

from parallel_gcn_tpu.data.graph import normalized_adjacency_values
from parallel_gcn_tpu.data.synthetic import (
    make_synthetic_dataset,
    synthetic_csr,
)


def test_synthetic_csr_structure():
    n, e = 500, 4000
    csr = synthetic_csr(n, e, seed=7)
    # self-loop is the first neighbor of every row (reference src/parser.cpp:29-31)
    first = csr.indices[csr.indptr[:-1]]
    np.testing.assert_array_equal(first, np.arange(n))
    # undirected: every (r,c) has (c,r)
    rows = csr.row_ids().astype(np.int64)
    cols = csr.indices.astype(np.int64)
    keys = set((rows * n + cols).tolist())
    assert all((c * n + r) in keys for r, c in zip(rows[:500], cols[:500]))
    # edge count close to requested (±2% after dedupe), excluding self-loops
    real = csr.nnz - n
    assert abs(real - e) / e < 0.02, (real, e)
    # normalization matches the shared helper exactly
    np.testing.assert_allclose(
        csr.values, normalized_adjacency_values(csr.indptr, csr.indices)
    )


def test_synthetic_dataset_splits_and_features():
    ds = make_synthetic_dataset(
        "tiny", n_nodes=400, n_edges=3000, input_dim=32, n_classes=5,
        n_train=200, n_val=80, feature_nnz_per_row=8,
    )
    assert ds.train_dim == 200 and ds.val_dim == 80 and ds.test_dim == 120
    assert ds.features.shape == (400, 32)
    assert (np.count_nonzero(ds.features, axis=1) <= 8).all()
    # sparse CSR and dense features agree
    np.testing.assert_allclose(ds.feature_csr.to_dense(), ds.features)
    assert ds.labels.min() >= 0 and ds.labels.max() < 5


def test_synthetic_registered_name_loads():
    from parallel_gcn_tpu.data.parser import load_dataset

    ds = load_dataset("synth-medium")
    assert ds.n_nodes == 25_000
    assert ds.input_dim == 300 and ds.output_dim == 16
    assert abs((ds.graph.nnz - ds.n_nodes) - 1_200_000) / 1_200_000 < 0.02
