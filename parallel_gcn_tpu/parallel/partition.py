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

    Flat layout (``ring=False``): row_local[d, e] is the destination row
    *within device d's shard* (shard rows are the global rows
    [d·n_local, (d+1)·n_local)); col[d, e] is the *global* source node id
    (resolved against the all-gathered features). Padding entries carry val 0
    and in-bounds indices.

    Ring layout (``ring=True``): arrays gain a ring-step axis —
    row_local/col/val are [n_dev, n_dev, e_slab], where slab ``s`` on device
    ``d`` holds exactly the edges whose source node lives in the block owned by
    device ``(d - s) mod n_dev`` — the block device ``d`` is holding at ring
    step ``s`` of the ``ppermute`` rotation. ``col`` is then the source index
    *within that block* (source node id mod n_local).
    """

    row_local: np.ndarray  # int32 [n_dev, e_local] | [n_dev, n_dev, e_slab]
    col: np.ndarray  # int32, same shape as row_local
    val: np.ndarray  # float32, same shape as row_local
    n_dev: int
    n_local: int  # rows per device
    n_real_nodes: int
    n_real_edges: int
    ring: bool = False

    @property
    def n_nodes_pad(self) -> int:
        return self.n_dev * self.n_local


def _slice_coo_by_dest(rows, cols, vals, n_dev, n_local, n_pad):
    """Cut row-sorted COO triplets into per-dest-device slabs of equal static
    shape (padding: val 0, row n_local-1, col n_pad-1)."""
    rows = np.asarray(rows, dtype=np.int64)
    bounds = np.searchsorted(rows, np.arange(1, n_dev) * n_local)
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [len(rows)]])
    e_local = pad_to_multiple(max(int((ends - starts).max()), 1), 128)
    row_s = np.full((n_dev, e_local), n_local - 1, dtype=np.int32)
    col_s = np.full((n_dev, e_local), n_pad - 1, dtype=np.int32)
    val_s = np.zeros((n_dev, e_local), dtype=np.float32)
    for d in range(n_dev):
        s, e = int(starts[d]), int(ends[d])
        cnt = e - s
        row_s[d, :cnt] = (rows[s:e] - d * n_local).astype(np.int32)
        col_s[d, :cnt] = cols[s:e]
        val_s[d, :cnt] = vals[s:e]
    return row_s, col_s, val_s


def partition_graph(csr: HostCSR, n_dev: int, node_pad: int = 8) -> ShardedGraph:
    """Split a host CSR into ``n_dev`` contiguous row blocks.

    Rows are padded so every device owns the same number (a multiple of
    ``node_pad``); edge slabs are padded to the max per-device count rounded
    to 128.
    """
    n_local = pad_to_multiple(-(-csr.n_rows // n_dev), node_pad)
    n_pad = n_local * n_dev

    # CSR expansion is row-sorted already
    row_local, col, val = _slice_coo_by_dest(
        csr.row_ids(), csr.indices, csr.values, n_dev, n_local, n_pad
    )

    return ShardedGraph(
        row_local=row_local,
        col=col,
        val=val,
        n_dev=n_dev,
        n_local=n_local,
        n_real_nodes=csr.n_rows,
        n_real_edges=csr.nnz,
    )


def partition_graph_ring(csr: HostCSR, n_dev: int, node_pad: int = 8) -> ShardedGraph:
    """Partition for the ``ppermute`` ring halo exchange (SURVEY.md §7.7).

    Each device's edges are additionally bucketed by *source block* and laid
    out in ring order: slab ``s`` of device ``d`` contains the edges whose
    source node belongs to device ``(d - s) mod n_dev`` — exactly the block
    that arrives at device ``d`` after ``s`` ring rotations. Slabs are padded
    to the max (device, step) edge count (rounded to 128) so every scan step
    has identical static shapes; per-slab rows stay sorted (padding rows are
    ``n_local - 1``, appended last) so ``segment_sum`` keeps its sorted-ids
    fast path.
    """
    n_local = pad_to_multiple(-(-csr.n_rows // n_dev), node_pad)

    rows = csr.row_ids().astype(np.int64)
    cols = csr.indices.astype(np.int64)
    vals = csr.values
    d = rows // n_local
    b = cols // n_local
    s = (d - b) % n_dev

    order = np.lexsort((rows, s, d))  # group by (d, s); row-sorted within
    group = (d[order] * n_dev + s[order]).astype(np.int64)
    counts = np.bincount(group, minlength=n_dev * n_dev)
    e_slab = pad_to_multiple(max(int(counts.max()), 1), 128)

    starts = np.zeros(n_dev * n_dev, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    pos = np.arange(len(order), dtype=np.int64) - starts[group]

    row_s = np.full((n_dev * n_dev, e_slab), n_local - 1, dtype=np.int32)
    col_s = np.zeros((n_dev * n_dev, e_slab), dtype=np.int32)
    val_s = np.zeros((n_dev * n_dev, e_slab), dtype=np.float32)
    row_s[group, pos] = (rows[order] - d[order] * n_local).astype(np.int32)
    col_s[group, pos] = (cols[order] % n_local).astype(np.int32)
    val_s[group, pos] = vals[order]

    shape = (n_dev, n_dev, e_slab)
    return ShardedGraph(
        row_local=row_s.reshape(shape),
        col=col_s.reshape(shape),
        val=val_s.reshape(shape),
        n_dev=n_dev,
        n_local=n_local,
        n_real_nodes=csr.n_rows,
        n_real_edges=csr.nnz,
        ring=True,
    )


@dataclass(frozen=True)
class HybridShardedGraph:
    """Row-block hybrid partition: per-device BCSR tile slabs (local tile-rows
    × GLOBAL tile-cols) + per-device COO residual (local dest rows × global
    source cols). Used with the all_gather halo: each device aggregates its
    own rows with MXU tiles against the gathered features
    (train_parallel.graphsum_dist_hybrid). All per-device arrays are padded to
    identical static shapes.
    """

    tiles: np.ndarray  # [n_dev, T, tile_r, tile_c] (f32, bf16 or int8 pattern)
    trow: np.ndarray  # int32 [n_dev, T] — LOCAL tile-row ids, ascending
    tcol: np.ndarray  # int32 [n_dev, T] — GLOBAL tile-col ids
    res_row: np.ndarray  # int32 [n_dev, e_local] — local dest rows
    res_col: np.ndarray  # int32 [n_dev, e_local] — global source cols
    res_val: np.ndarray  # float32 [n_dev, e_local] (int8 mode: 1.0 / 0.0 pad)
    n_dev: int
    n_local: int
    n_real_nodes: int
    n_real_edges: int
    # int8 pattern mode: row-sharded d (= deg^{-1/2}) [n_dev, n_local]; the
    # aggregation becomes d_local ⊙ (slab(ag(d_local ⊙ x)) + residual) with
    # residual values 1 — scale-before-gather keeps ONE collective. None for
    # value (f32/bf16) packs.
    sym_scale: np.ndarray | None = None

    @property
    def n_nodes_pad(self) -> int:
        return self.n_dev * self.n_local


def partition_graph_hybrid(
    csr: HostCSR,
    n_dev: int,
    node_pad: int = 8,
    tile_r: int = 128,
    tile_c: int = 0,
    tile_dtype=np.float32,
    tile_budget_bytes: int = 3 * 1024 * 1024 * 1024,
    min_tile_nnz: int | None = None,
) -> HybridShardedGraph:
    """Tile-accelerated row-block partition.

    The GLOBAL symmetric edge split (data.graph.split_dense_tiles) is packed
    once (data sorted by tile-row), then cut into per-device slabs at
    tile-row-block boundaries; every device gets the same static tile count
    (zero tiles pad the shorter slabs). The residual COO is sliced per dest
    device like ``partition_graph``.
    """
    from parallel_gcn_tpu.data.graph import split_dense_tiles
    from parallel_gcn_tpu.ops.pallas_bcsr import build_bcsr

    import math

    tile_c = tile_c or tile_r
    assert tile_c % tile_r == 0, (tile_r, tile_c)
    # rows per device must be a whole number of tile rows AND honor node_pad
    n_local = pad_to_multiple(
        -(-csr.n_rows // n_dev), math.lcm(node_pad, tile_c)
    )
    n_pad = n_local * n_dev
    assert n_local % tile_r == 0 and n_pad % tile_c == 0

    rows = csr.row_ids()
    cols = csr.indices
    vals = csr.values
    sym_scale = None
    if np.dtype(tile_dtype) == np.int8:
        from parallel_gcn_tpu.data.graph import recover_sym_scale

        sym_scale = recover_sym_scale(rows, cols, vals, csr.n_rows, n_pad)
    in_tiles = split_dense_tiles(
        rows, cols, n_pad, min_tile_nnz, tile_budget_bytes,
        tile=tile_r, bytes_per_elem=np.dtype(tile_dtype).itemsize, tile_c=tile_c,
    )
    pack = build_bcsr(
        rows[in_tiles], cols[in_tiles], vals[in_tiles], n_pad,
        dtype=tile_dtype, tile=tile_r, tile_c=tile_c, sym_scale=sym_scale,
    )
    g_trow = np.asarray(pack.tile_rows)
    g_tcol = np.asarray(pack.tile_cols)
    g_tiles = np.asarray(pack.tiles)

    rows_per_dev = n_local // tile_r
    dev_of_tile = g_trow // rows_per_dev
    counts = np.bincount(dev_of_tile, minlength=n_dev)
    T = int(counts.max())
    mean_t = max(counts.mean(), 1.0)
    if T > 1.5 * mean_t:
        # every device is padded to the max slab (SPMD static shapes), so a
        # hot row block (e.g. a hubs-first leading block) turns imbalance
        # into redundant zero-tile work AND memory on every chip
        import warnings

        warnings.warn(
            f"hybrid partition tile imbalance: max {T} vs mean {mean_t:.0f} "
            f"tiles/device — all devices pad to {T}. A flatter node order "
            "(e.g. rcm, or community order without the hubs-first block) "
            "balances the slabs.",
            stacklevel=2,
        )
    tiles = np.zeros((n_dev, T, tile_r, tile_c), dtype=g_tiles.dtype)
    trow = np.full((n_dev, T), rows_per_dev - 1, dtype=np.int32)
    tcol = np.zeros((n_dev, T), dtype=np.int32)
    for d in range(n_dev):
        sel = dev_of_tile == d
        k = int(sel.sum())
        tiles[d, :k] = g_tiles[sel]
        trow[d, :k] = g_trow[sel] - d * rows_per_dev  # sorted ascending; pads
        tcol[d, :k] = g_tcol[sel]                      # (= last row) keep order

    # residual: per-dest-device slabs, global source cols (row-sorted subset).
    # int8 mode: residual values become the 0/1 indicator — the residual rides
    # the same d-scaled features as the tile slabs (one gather, exact)
    rvals = vals[~in_tiles]
    if sym_scale is not None:
        rvals = (rvals != 0).astype(np.float32)
    res_row, res_col, res_val = _slice_coo_by_dest(
        rows[~in_tiles], cols[~in_tiles], rvals, n_dev, n_local, n_pad
    )

    return HybridShardedGraph(
        tiles=tiles, trow=trow, tcol=tcol,
        res_row=res_row, res_col=res_col, res_val=res_val,
        n_dev=n_dev, n_local=n_local,
        n_real_nodes=csr.n_rows, n_real_edges=csr.nnz,
        sym_scale=None if sym_scale is None else
        sym_scale[: n_pad].reshape(n_dev, n_local),
    )
