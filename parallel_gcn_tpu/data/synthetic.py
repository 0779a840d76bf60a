"""Synthetic dataset generator — reddit-scale benchmarking without the blob.

The reference benchmarks four datasets; the largest, reddit (232,965 nodes /
11,606,919 edges / 41 classes / 602 features, report p.10 Table 2), is not
checked into its repo either — it is downloaded separately
(hpdga-spring23/MisteryDataset.md, .MISSING_LARGE_BLOBS). In this environment
the blob is unavailable, so ``synth-reddit`` generates a graph with matched
statistics (node count, edge count, power-law degree distribution, feature and
class dimensionality, GraphSAGE split sizes) for the performance harness. The
numbers it produces measure exactly what the reference's reddit benchmark
measures — SpMM/GEMM throughput at scale — while accuracy claims remain the
domain of the three real citation datasets.

Everything is vectorized NumPy: 11.6M edges build in a few seconds, no Python
loops over nodes or edges.
"""

from __future__ import annotations

import numpy as np

from parallel_gcn_tpu.data.graph import HostCSR, normalized_adjacency_values

# Published statistics of the datasets whose blobs are not shipped
# (reference report p.10 Table 2; split sizes from the standard GraphSAGE split).
SYNTHETIC_SPECS = {
    "synth-reddit": dict(
        n_nodes=232_965,
        n_edges=11_606_919,  # directed nnz, excluding self-loops
        input_dim=602,
        n_classes=41,
        n_train=153_431,
        n_val=23_831,
        feature_nnz_per_row=64,
    ),
    # a ~10x smaller variant for quick iteration / CI-scale runs
    "synth-medium": dict(
        n_nodes=25_000,
        n_edges=1_200_000,
        input_dim=300,
        n_classes=16,
        n_train=16_000,
        n_val=3_000,
        feature_nnz_per_row=32,
    ),
}


def synthetic_csr(
    n_nodes: int, n_edges: int, seed: int = 0, power: float = 0.75
) -> HostCSR:
    """Undirected power-law graph as a self-loop-inclusive normalized CSR.

    Endpoints are drawn from a Zipf-like distribution over node ids (hubs at
    low ids, mirroring a degree-sorted real graph); the directed edge list is
    symmetrized and deduplicated, then trimmed/topped-up so the final nnz
    (excluding the self-loops the pipeline prepends) is close to ``n_edges``.
    """
    rng = np.random.default_rng(seed)
    w = np.arange(1, n_nodes + 1, dtype=np.float64) ** (-power)
    p = w / w.sum()

    # sample with surplus: symmetrize + dedupe loses edges
    target_half = n_edges // 2
    n_sample = int(target_half * 1.25) + 1024
    src = rng.choice(n_nodes, size=n_sample, p=p).astype(np.int64)
    dst = rng.integers(0, n_nodes, size=n_sample, dtype=np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # canonical undirected key (lo, hi), dedupe
    lo = np.minimum(src, dst)
    hi = np.maximum(src, dst)
    key = np.unique(lo * n_nodes + hi)
    if key.shape[0] > target_half:
        key = rng.permutation(key)[:target_half]
    lo, hi = key // n_nodes, key % n_nodes

    # symmetrize → directed COO, then append self-loops as FIRST neighbor per
    # row (reference: src/parser.cpp:29-31) via a sort key that orders the
    # self-loop before all real neighbors of the same row
    rows = np.concatenate([np.arange(n_nodes, dtype=np.int64), lo, hi])
    cols = np.concatenate([np.arange(n_nodes, dtype=np.int64), hi, lo])
    self_first = np.zeros(rows.shape[0], dtype=np.int64)
    self_first[n_nodes:] = 1  # real edges sort after the self-loop
    order = np.lexsort((cols, self_first, rows))
    rows, cols = rows[order], cols[order]

    counts = np.bincount(rows, minlength=n_nodes)
    indptr = np.zeros(n_nodes + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    indices = cols.astype(np.int32)
    values = normalized_adjacency_values(indptr, indices)
    return HostCSR(
        indptr=indptr, indices=indices, values=values, n_rows=n_nodes, n_cols=n_nodes
    )


def synthetic_features(
    n_nodes: int, input_dim: int, nnz_per_row: int, rng: np.random.Generator
) -> tuple[HostCSR, np.ndarray]:
    """Sparse feature CSR (svmlight-like) + its dense float32 form."""
    nnz_per_row = min(nnz_per_row, input_dim)
    # distinct column ids per row without a Python loop: random keys, take the
    # argsort prefix per row
    keys = rng.random((n_nodes, input_dim), dtype=np.float32)
    cols = np.argsort(keys, axis=1)[:, :nnz_per_row].astype(np.int32)
    vals = rng.standard_normal((n_nodes, nnz_per_row), dtype=np.float32)

    dense = np.zeros((n_nodes, input_dim), dtype=np.float32)
    np.put_along_axis(dense, cols.astype(np.int64), vals, axis=1)

    order = np.argsort(cols, axis=1)
    cols_sorted = np.take_along_axis(cols, order, axis=1)
    vals_sorted = np.take_along_axis(vals, order, axis=1)
    indptr = np.arange(n_nodes + 1, dtype=np.int64) * nnz_per_row
    csr = HostCSR(
        indptr=indptr,
        indices=cols_sorted.reshape(-1),
        values=vals_sorted.reshape(-1),
        n_rows=n_nodes,
        n_cols=input_dim,
    )
    return csr, dense


def make_synthetic_dataset(name: str, seed: int = 19990304, **overrides):
    """Build a ``Dataset`` for a registered synthetic spec (or explicit kwargs)."""
    from parallel_gcn_tpu.data.parser import TEST, TRAIN, VAL, Dataset

    spec = dict(SYNTHETIC_SPECS.get(name, {}))
    if not spec and not overrides:
        raise KeyError(f"unknown synthetic dataset {name!r}")
    spec.update(overrides)
    n_nodes = spec["n_nodes"]
    rng = np.random.default_rng(seed ^ 0x5EED)

    graph = synthetic_csr(n_nodes, spec["n_edges"], seed=seed)
    feature_csr, features = synthetic_features(
        n_nodes, spec["input_dim"], spec["feature_nnz_per_row"], rng
    )

    # labels carry a weak feature signal so loss actually decreases: class =
    # argmax of a fixed random projection of the features, with label noise
    proj = rng.standard_normal((spec["input_dim"], spec["n_classes"])).astype(
        np.float32
    )
    labels = np.argmax(features @ proj, axis=1).astype(np.int32)
    noise = rng.random(n_nodes) < 0.1
    labels[noise] = rng.integers(0, spec["n_classes"], size=int(noise.sum()))

    split = np.full(n_nodes, TEST, dtype=np.int32)
    perm = rng.permutation(n_nodes)
    split[perm[: spec["n_train"]]] = TRAIN
    split[perm[spec["n_train"] : spec["n_train"] + spec["n_val"]]] = VAL

    return Dataset(
        name=name,
        graph=graph,
        feature_csr=feature_csr,
        features=features,
        labels=labels,
        split=split,
        n_nodes=n_nodes,
        input_dim=spec["input_dim"],
        output_dim=spec["n_classes"],
    )
