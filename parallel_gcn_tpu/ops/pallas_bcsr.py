"""Block-sparse (BCSR) SpMM Pallas kernel — ``out = Â · x`` on the MXU.

The TPU-native answer to the reference's hand-written no-cuSPARSE CSR SpMM
(src/module.cu:172-186): instead of one thread per output element walking a
ragged row, the sparse matrix is packed into dense 128×128 tiles (only the
nonempty ones), and the kernel contracts tile-by-tile on the systolic array.
Tile indices are scalar-prefetched so the pipeline can compute each grid step's
x/out block addresses before the body runs; tiles are sorted by tile-row, so
the output block stays resident in VMEM while a row's tiles accumulate
(the Pallas revisiting pattern).

Combined with the RCM reordering (data/reorder.py) this reads only the
populated neighborhood structure instead of the full dense Â — the bandwidth
win that dense aggregation leaves on the table.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128  # default tile edge (MXU-native); larger tiles amortize the
# per-grid-step overhead (~0.3 µs/step measured on v5e) when the graph has
# community blocks bigger than 128 — build-time parameter, see build_bcsr
_FEAT_TILE = 128


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BCSR:
    """Sorted-by-row pack of nonempty tile_r×tile_c blocks of Â.

    Rectangular tiles matter: after a bandwidth-reducing reorder a tile-row's
    occupied columns are contiguous, so wide tiles (tile_c ≫ tile_r) cover the
    same edges in fewer grid steps — the per-step overhead (~0.3 µs on v5e) is
    the dominant cost once tiles stream near HBM bandwidth.

    NOTE (symmetry): the VJP reuses the UNtransposed pack, which is valid iff
    the packed matrix itself is symmetric. For square tiles of symmetric Â
    that is automatic; for rectangular tiles the caller must pack a symmetric
    EDGE SET — data/graph.py split_dense_tiles enforces this by qualifying an
    edge only if its mirror's tile also qualifies. Do not feed an asymmetric
    matrix through bcsr_matmul's autodiff.
    """

    tiles: jnp.ndarray  # [T, tile_r, tile_c] — dense tile data (f32/bf16/int8)
    tile_rows: jnp.ndarray  # int32 [T] — tile-row index, ascending
    tile_cols: jnp.ndarray  # int32 [T]
    n_nodes: int = dataclasses.field(metadata=dict(static=True))  # padded cols
    n_tiles_real: int = dataclasses.field(metadata=dict(static=True))
    # output row count; 0 means square (= n_nodes). A row-block slab of a
    # sharded matrix sets this to its local row count.
    n_rows: int = dataclasses.field(metadata=dict(static=True), default=0)
    # int8 "binary" packs: Â's values factor as v_ij = d_i·d_j with
    # d = deg^{-1/2} (symmetric normalization), so tiles store the EXACT 0/1
    # adjacency pattern in int8 (half the bf16 stream, no quantization error)
    # and the kernel result is wrapped as out = d ⊙ K(d ⊙ x). ``sym_scale``
    # holds d ([n_nodes] f32); None for f32/bf16 value packs.
    sym_scale: jnp.ndarray | None = None
    # mirror permutation: mirror_perm[t] = t' with (rows[t'], cols[t']) ==
    # (cols[t], rows[t]). Exists iff the tile-POSITION set is symmetric and
    # tiles are square; lets transposed-pack traversals (ops/pallas_sddmm's
    # dB) reuse the row-sorted pack. None when not computed/applicable.
    mirror_perm: jnp.ndarray | None = None

    @property
    def n_tiles(self) -> int:
        return self.tiles.shape[0]

    @property
    def tile(self) -> int:
        return self.tiles.shape[1]

    @property
    def tile_r(self) -> int:
        return self.tiles.shape[1]

    @property
    def tile_c(self) -> int:
        return self.tiles.shape[2]


def build_bcsr(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    n_nodes: int,
    dtype=np.float32,
    tile: int = TILE,
    tile_c: int | None = None,
    sym_scale: np.ndarray | None = None,
) -> BCSR:
    """Pack COO triplets into BCSR. ``n_nodes`` is rounded up to a tile-column
    multiple; padding tiles (val 0) keep the tile count static-friendly.
    ``dtype=bfloat16`` halves tile bytes (the kernel accumulates in f32);
    ``tile`` (rows) and ``tile_c`` (columns, default square, must be a
    multiple of ``tile``) are multiples of 128 (MXU/lane granularity).

    ``dtype=int8`` stores the EXACT edge-multiplicity pattern (0/1, or k for
    coalesced duplicate edges; quarter the f32 stream) and requires
    ``sym_scale`` = the d vector ([n_nodes] f32) factoring the values as
    v_ij = k_ij·d_i·d_j — valid for any symmetrically-normalized adjacency
    (Â = D^{-1/2}(A+I)D^{-1/2}). The matmul then computes
    d ⊙ (pattern · (d ⊙ x)), which is algebraically identical."""
    tile_r = tile
    tile_c = tile_c or tile_r
    assert tile_r % 128 == 0 and tile_c % tile_r == 0, (tile_r, tile_c)
    binary = np.dtype(dtype) == np.int8
    if binary:
        assert sym_scale is not None, "int8 pattern pack needs sym_scale (d)"
        assert len(sym_scale) >= n_nodes
    n_pad = ((n_nodes + tile_c - 1) // tile_c) * tile_c
    live = vals != 0
    rows, cols, vals = rows[live], cols[live], vals[live]
    trow = rows // tile_r
    tcol = cols // tile_c
    n_tile_cols = n_pad // tile_c
    tile_id = trow.astype(np.int64) * n_tile_cols + tcol
    uniq, inverse = np.unique(tile_id, return_inverse=True)
    # every tile-row needs >=1 tile or its output block would never be
    # initialized by the kernel — give uncovered rows an explicit zero tile
    covered = np.unique(uniq // n_tile_cols)
    missing = np.setdiff1d(np.arange(n_pad // tile_r, dtype=np.int64), covered)
    T = len(uniq)
    # allocate the FINAL dtype and scatter converted values directly — a
    # float32 intermediate for a reddit-scale pack is a 4.8 GB alloc+convert
    # (int8 packs: 4× the bytes of the result)
    out_dtype = np.int8 if binary else jnp.dtype(dtype)
    tiles = np.zeros((T + len(missing), tile_r, tile_c), dtype=out_dtype)
    if binary:
        # edge multiplicity k (coalesced duplicates; 1 otherwise) — exact:
        # the value factors as k·d_i·d_j (verified by recover_sym_scale)
        d = np.asarray(sym_scale, np.float64)
        counts = np.rint(
            vals / np.maximum(d[rows] * d[cols], 1e-30)
        ).astype(np.int8)
        tiles[inverse, rows % tile_r, cols % tile_c] = counts
    else:
        tiles[inverse, rows % tile_r, cols % tile_c] = vals.astype(out_dtype)
    tile_rows = np.concatenate([uniq // n_tile_cols, missing]).astype(np.int32)
    # zero tiles for uncovered rows sit on the DIAGONAL when square (their
    # position is then its own mirror, keeping the position set symmetric for
    # mirror_perm below); any valid column works — they contribute nothing
    miss_cols = missing if tile_r == tile_c else np.zeros(len(missing), np.int64)
    tile_cols = np.concatenate([uniq % n_tile_cols, miss_cols]).astype(np.int32)
    order = np.argsort(tile_rows, kind="stable")
    tiles = tiles[order]
    tile_rows = tile_rows[order]
    tile_cols = tile_cols[order]
    T = len(tile_rows)
    # mirror permutation for square tiles with a symmetric position set
    mirror_perm = None
    if tile_r == tile_c:
        n_tc = n_pad // tile_c
        pos = tile_rows.astype(np.int64) * n_tc + tile_cols
        mirror = tile_cols.astype(np.int64) * n_tc + tile_rows
        lookup = np.argsort(pos, kind="stable")
        idx = np.searchsorted(pos[lookup], mirror)
        idx = np.clip(idx, 0, T - 1)
        cand = lookup[idx]
        if np.array_equal(pos[cand], mirror):
            mirror_perm = cand.astype(np.int32)
    return BCSR(
        tiles=jnp.asarray(tiles),
        tile_rows=jnp.asarray(tile_rows),
        tile_cols=jnp.asarray(tile_cols),
        n_nodes=n_pad,
        n_tiles_real=T,
        sym_scale=(
            None
            if not binary
            else jnp.asarray(
                np.pad(
                    np.asarray(sym_scale, np.float32)[:n_nodes],
                    (0, n_pad - n_nodes),
                )
            )
        ),
        mirror_perm=None if mirror_perm is None else jnp.asarray(mirror_perm),
    )


def _bcsr_kernel(rows_ref, cols_ref, tiles_ref, x_ref, o_ref):
    t = pl.program_id(1)
    # first tile of a new tile-row (tiles sorted by row): reset the accumulator
    is_first = jnp.where(t == 0, True, rows_ref[t] != rows_ref[jnp.maximum(t - 1, 0)])

    @pl.when(is_first)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    t = tiles_ref[0]
    x = x_ref[:]
    if t.dtype == jnp.int8:
        # binary pattern pack: DMA int8 (half the bf16 stream), upconvert on
        # the VPU, contract at the x dtype on the MXU — exact 0/1 values
        t = t.astype(x.dtype)
    else:
        x = x.astype(t.dtype)
    o_ref[:] += jnp.dot(t, x, preferred_element_type=jnp.float32)


def _bcsr_matmul_impl(tiles, tile_rows, tile_cols, x, n_nodes, n_rows=0):
    n_rows = n_rows or n_nodes
    T = tiles.shape[0]
    tile_r = tiles.shape[1]
    tile_c = tiles.shape[2]
    n_feat = x.shape[1]
    ft = min(_FEAT_TILE, n_feat)
    grid = (pl.cdiv(n_feat, ft), T)

    return pl.pallas_call(
        _bcsr_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # tile_rows, tile_cols
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, tile_r, tile_c),
                    lambda f, t, rows, cols: (t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (tile_c, ft),
                    lambda f, t, rows, cols: (cols[t], f),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (tile_r, ft),
                lambda f, t, rows, cols: (rows[t], f),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((n_rows, n_feat), jnp.float32),
        interpret=_INTERPRET[0],
    )(tile_rows, tile_cols, tiles, x)


# module-level switch so CPU tests can run the kernel in TPU-interpret mode
_INTERPRET = [False]
# A/B switch for the in-kernel D·B·D scaling on int8 pattern packs (the
# measured-win default; False = the original outside-the-kernel scalings)
_FUSED_SCALE = [True]


def _bcsr_kernel_scaled(rows_ref, cols_ref, tiles_ref, dr_ref, dc_ref,
                        x_ref, o_ref):
    """Pattern-pack kernel with the symmetric normalization FUSED: computes
    (d_r ⊙ tile ⊙ d_c) @ x per grid step, i.e. the D·B·D factorization is
    reconstructed on the VPU while the int8 tile is upconverted anyway.

    Why: the Pallas call is a fusion boundary, so the outside-the-kernel
    d ⊙ x and d ⊙ out scalings each materialize a full [N, F] lane-padded
    array per pass (~11 µs each on synth-pubmed's [20480, 6] stacked
    activations, 4 ops/epoch ≈ 45 µs — measured round 5). In-kernel the
    scale vectors are [1, tile] lane-resident slices and the two broadcast
    multiplies ride the existing per-tile upconvert. diag(d)·B·diag(d) is
    symmetric, so the VJP still reuses the forward pack."""
    t = pl.program_id(1)
    is_first = jnp.where(t == 0, True, rows_ref[t] != rows_ref[jnp.maximum(t - 1, 0)])

    @pl.when(is_first)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    tile = tiles_ref[0]
    x = x_ref[:]
    scaled = tile.astype(jnp.float32) * dc_ref[0, :][None, :]
    scaled = scaled * dr_ref[0, :][:, None]
    o_ref[:] += jnp.dot(
        scaled.astype(x.dtype), x, preferred_element_type=jnp.float32
    )


def _bcsr_matmul_scaled_impl(tiles, tile_rows, tile_cols, d2, x, n_nodes):
    T = tiles.shape[0]
    tile_r = tiles.shape[1]
    tile_c = tiles.shape[2]
    n_feat = x.shape[1]
    ft = min(_FEAT_TILE, n_feat)
    grid = (pl.cdiv(n_feat, ft), T)

    return pl.pallas_call(
        _bcsr_kernel_scaled,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # tile_rows, tile_cols
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, tile_r, tile_c),
                    lambda f, t, rows, cols: (t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(  # d slice for this tile's ROWS
                    (1, tile_r),
                    lambda f, t, rows, cols: (0, rows[t]),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(  # d slice for this tile's COLUMNS
                    (1, tile_c),
                    lambda f, t, rows, cols: (0, cols[t]),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (tile_c, ft),
                    lambda f, t, rows, cols: (cols[t], f),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (tile_r, ft),
                lambda f, t, rows, cols: (rows[t], f),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((n_nodes, n_feat), jnp.float32),
        interpret=_INTERPRET[0],
    )(tile_rows, tile_cols, tiles, d2, d2, x)


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def _bcsr_matmul_scaled(tiles, tile_rows, tile_cols, d2, x, n_nodes):
    return _bcsr_matmul_scaled_impl(tiles, tile_rows, tile_cols, d2, x, n_nodes)


def _fwd_scaled(tiles, tile_rows, tile_cols, d2, x, n_nodes):
    out = _bcsr_matmul_scaled_impl(tiles, tile_rows, tile_cols, d2, x, n_nodes)
    return out, (tiles, tile_rows, tile_cols, d2)


def _bwd_scaled(n_nodes, res, g):
    tiles, tile_rows, tile_cols, d2 = res
    # diag(d)·B·diag(d) is symmetric (B symmetric by the pack invariant), so
    # the backward is the SAME scaled kernel on the cotangent.
    dx = _bcsr_matmul_scaled_impl(tiles, tile_rows, tile_cols, d2, g, n_nodes)
    return None, None, None, None, dx


_bcsr_matmul_scaled.defvjp(_fwd_scaled, _bwd_scaled)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _bcsr_matmul(tiles, tile_rows, tile_cols, x, n_nodes):
    return _bcsr_matmul_impl(tiles, tile_rows, tile_cols, x, n_nodes)


def _fwd(tiles, tile_rows, tile_cols, x, n_nodes):
    out = _bcsr_matmul_impl(tiles, tile_rows, tile_cols, x, n_nodes)
    return out, (tiles, tile_rows, tile_cols)


def _bwd(n_nodes, res, g):
    tiles, tile_rows, tile_cols = res
    # The tile-part MATRIX is symmetric (Â symmetric + symmetric edge split,
    # data/graph.py split_dense_tiles) ⇒ Tᵀg = Tg: reuse the same tile pack
    # (src/module.cu:188-208 uses one kernel for both directions likewise).
    # This holds for rectangular tiles too — symmetry is enforced on the EDGE
    # SET, not the tile grid.
    dx = _bcsr_matmul_impl(tiles, tile_rows, tile_cols, g, n_nodes)
    return None, None, None, dx


_bcsr_matmul.defvjp(_fwd, _bwd)


def bcsr_matmul(bcsr: BCSR, x: jnp.ndarray) -> jnp.ndarray:
    """out = Â·x with Â in BCSR form. x: [n_nodes, F] (n_nodes = bcsr.n_nodes).

    Square packs only (the custom VJP reuses the forward, valid iff the packed
    matrix is symmetric); rectangular slabs use ``bcsr_matmul_rect``."""
    assert x.shape[0] == bcsr.n_nodes, (x.shape, bcsr.n_nodes)
    assert not bcsr.n_rows or bcsr.n_rows == bcsr.n_nodes, (
        "rectangular pack: use bcsr_matmul_rect"
    )
    if bcsr.sym_scale is not None:
        # d ⊙ (pattern · (d ⊙ x)) == Â·x exactly; diag(d)·B·diag(d) stays
        # symmetric, so the custom VJP's forward-reuse remains valid and the
        # outer diagonal scalings are self-adjoint under autodiff.
        d = bcsr.sym_scale
        if _FUSED_SCALE[0]:
            # reconstruct D·B·D inside the kernel: no [N, F] pre/post scale
            # materializations at the Pallas fusion boundary (measured 45 µs
            # per synth-pubmed epoch, ~0.5 ms per synth-reddit epoch)
            return _bcsr_matmul_scaled(
                bcsr.tiles, bcsr.tile_rows, bcsr.tile_cols, d[None, :], x,
                bcsr.n_nodes,
            )
        xs = (d[:, None] * x.astype(jnp.float32)).astype(x.dtype)
        out = _bcsr_matmul(
            bcsr.tiles, bcsr.tile_rows, bcsr.tile_cols, xs, bcsr.n_nodes
        )
        return d[:, None] * out
    return _bcsr_matmul(bcsr.tiles, bcsr.tile_rows, bcsr.tile_cols, x, bcsr.n_nodes)


def bcsr_matmul_rect(bcsr: BCSR, x: jnp.ndarray) -> jnp.ndarray:
    """out[n_rows, F] = slab · x for a rectangular (row-block) pack.

    NO custom VJP — callers embed this in their own adjoint (e.g. the sharded
    aggregation is self-adjoint at the collective level because the GLOBAL
    matrix is symmetric; see parallel/train_parallel.graphsum_dist_hybrid)."""
    assert x.shape[0] == bcsr.n_nodes, (x.shape, bcsr.n_nodes)
    assert bcsr.sym_scale is None, (
        "int8 pattern packs are single-device; build slab packs with values"
    )
    return _bcsr_matmul_impl(
        bcsr.tiles, bcsr.tile_rows, bcsr.tile_cols, x, bcsr.n_nodes, bcsr.n_rows
    )
