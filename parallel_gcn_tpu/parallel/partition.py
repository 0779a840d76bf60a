"""Graph partitioning for multi-chip aggregation.

The reference is single-GPU (SURVEY.md §2.4: no DP/TP/PP anywhere); the scaling
dimension of this workload is graph size, and its TPU-native scale-out is
**node partitioning**: contiguous row blocks of the CSR per device, the
device's edges (all edges whose destination row it owns) kept local, and the
remote source features fetched over ICI during aggregation.

Host-side preprocessing produces equal-shaped per-device COO slabs (TPU needs
identical static shapes on every device); per-device edge counts are padded to
the max across devices.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import numpy as np

from parallel_gcn_tpu.data.graph import HostCSR, pad_to_multiple


@dataclass(frozen=True)
class ShardedGraph:
    """Per-device COO slabs, stacked on a leading device axis.

    row_local[d, e] is the destination row *within device d's shard*
    (shard rows are the global rows [d·n_local, (d+1)·n_local)); col[d, e] is
    the *global* source node id (resolved against the all-gathered features).
    Padding entries carry val 0 and in-bounds indices.
    """

    row_local: np.ndarray  # int32 [n_dev, e_local]
    col: np.ndarray  # int32 [n_dev, e_local]
    val: np.ndarray  # float32 [n_dev, e_local]
    n_dev: int
    n_local: int  # rows per device
    n_real_nodes: int
    n_real_edges: int

    @property
    def n_nodes_pad(self) -> int:
        return self.n_dev * self.n_local


def partition_graph(csr: HostCSR, n_dev: int, node_pad: int = 8) -> ShardedGraph:
    """Split a host CSR into ``n_dev`` contiguous row blocks.

    Rows are padded so every device owns the same number (a multiple of
    ``node_pad``); edge slabs are padded to the max per-device count rounded
    to 128.
    """
    n_local = pad_to_multiple(-(-csr.n_rows // n_dev), node_pad)
    n_pad = n_local * n_dev

    rows = csr.row_ids()
    # row-sorted already (CSR expansion); find per-device edge ranges
    bounds = np.searchsorted(rows, np.arange(1, n_dev) * n_local)
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [csr.nnz]])
    e_local = pad_to_multiple(max(int((ends - starts).max()), 1), 128)

    row_local = np.full((n_dev, e_local), n_local - 1, dtype=np.int32)
    col = np.full((n_dev, e_local), n_pad - 1, dtype=np.int32)
    val = np.zeros((n_dev, e_local), dtype=np.float32)
    for d in range(n_dev):
        s, e = int(starts[d]), int(ends[d])
        cnt = e - s
        row_local[d, :cnt] = rows[s:e] - d * n_local
        col[d, :cnt] = csr.indices[s:e]
        val[d, :cnt] = csr.values[s:e]

    return ShardedGraph(
        row_local=row_local,
        col=col,
        val=val,
        n_dev=n_dev,
        n_local=n_local,
        n_real_nodes=csr.n_rows,
        n_real_edges=csr.nnz,
    )
