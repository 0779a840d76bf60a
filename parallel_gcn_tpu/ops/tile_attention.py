"""Block-sparse tile attention — fused flash-style GAT aggregation on the MXU.

The GAT's edge softmax over COO triplets costs ~10 gather/scatter sweeps over
E at the measured 15-20 ns/index (models/gat.py segment backend) — 16.6 s per
epoch at reddit scale. This module rides the SAME BCSR tile geometry as the
GCN's SpMM (ops/pallas_bcsr.py) instead: the per-edge logits of a tile are a
rank-1 outer sum (e_ij = LeakyReLU(s_i + t_j) — the SDDMM score with the
factors [s_i, 1]·[1, t_j]ᵀ, see ops/pallas_sddmm.py), so each pattern tile's
masked scores, its online-softmax statistics, and the weighted aggregation
(exactly the SpMM with the attention weights as tile data) are computed in ONE
streaming kernel pass, flash-attention style:

  forward : per tile-row span (tiles sorted by row, the SpMM revisiting
            pattern) carry running max m, denominator den and the RESCALED
            accumulator acc; one sweep over the tiles produces the
            unnormalized numerator + (m, den).
  residual: hybrid packs keep scattered edges as COO (data/graph.py
            split_dense_tiles); their segment-softmax statistics merge with
            the tile statistics EXACTLY via the flash rescale
            (den = den_t·e^{m_t−m} + den_r·e^{m_r−m}, same for numerators).
  backward: one more sweep re-deriving per-tile α from the saved O(N·H)
            statistics. The softmax jacobian collapses to
            de_ij = α_ij(⟨g_i, v_j⟩ − ⟨g_i, out_i⟩) — ⟨g_i,v_j⟩ is the SDDMM
            of g and v on the pattern, dv = αᵀ·g is the SpMM of the mirrored
            tiles, both evaluated in-kernel. Column-direction sums (dt, dv)
            reuse the row-sorted traversal through the EDGE-SET SYMMETRY of
            the pack (the repo's graph invariant, enforced by
            split_dense_tiles): every edge's mirror is visited exactly once.

No [T, tile_r, tile_c] score tensor is ever materialized — residuals are the
O(N·H) statistics, so reddit-scale attention fits HBM without remat tricks.

The op ships in two forms: ``gat_attend_tiles`` (single chip, square
symmetric packs, mirror-trick backward) and ``gat_attend_rect`` (mesh slabs:
local dest rows × the compact halo buffer, packs from
parallel.partition.gat_mesh_pack, two-sweep rect backward) — the sharded
path parallel/train_parallel routes model=gat backend=hybrid through.

Reference: the GAT family itself is beyond-reference surface (the CUDA
reference is GCN-only, src/gcn.cu); the kernel design follows the house SpMM
(src/module.cu:172-186's hand-written no-cuSPARSE analog).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parallel_gcn_tpu.ops.pallas_bcsr import _INTERPRET

_NEG = -1e9  # masked-logit fill (finite: empty rows stay finite, exp -> 0)
_LANE = 128


def _gather_stats(*stats, idx):
    """Per-edge gathers of the per-node softmax statistics, fenced with an
    optimization_barrier. NOT optional: XLA:TPU miscompiles the fused
    gather + select + segment_sum residual program at scale — measured on
    synth-medium (21k nodes, hybrid int8 pack), the backward's α factor for
    one edge came out as MINUS the global max denominator (-1008.13,
    exactly −max(den)), exploding ds to 4013.98 vs 2.40; every piece is
    bit-clean in isolation and on CPU, and fencing the gathered operands
    restores exact agreement. The barrier only splits a fusion — it adds no
    copies of the big per-edge tensors."""
    return jax.lax.optimization_barrier(tuple(s[idx] for s in stats))


def _pad_lane(n: int) -> int:
    return ((n + _LANE - 1) // _LANE) * _LANE


# Attention kernels hold several [tile_r, tile_c] f32 temporaries live at
# once (logits, alpha, SDDMM dot, jacobian term — per orientation in the
# backward); the GCN's tuned wide packs (512x1024 on synth-reddit) blow the
# 16 MB VMEM scope (measured: 16.66M requested). Wide tiles are therefore
# VIEW-SPLIT into <=_MAX_TILE_C column strips at op entry — a pure reshape:
# the edge set (and its symmetry, which the backward's mirror traversal
# needs) is unchanged, trow stays sorted (each tile expands to k strips of
# the SAME row), and the GCN's SpMM keeps the wide tiles it was tuned with.
_MAX_TILE_C = 512


def _split_wide(tiles, trow, tcol):
    T, R, C = tiles.shape
    if C <= _MAX_TILE_C:
        return tiles, trow, tcol
    assert C % _MAX_TILE_C == 0, (C, _MAX_TILE_C)
    k = C // _MAX_TILE_C
    tiles = (
        tiles.reshape(T, R, k, _MAX_TILE_C)
        .transpose(0, 2, 1, 3)
        .reshape(T * k, R, _MAX_TILE_C)
    )
    trow = jnp.repeat(trow, k)
    tcol = (tcol[:, None] * k
            + jnp.arange(k, dtype=tcol.dtype)[None, :]).reshape(-1)
    return tiles, trow, tcol


def _is_first_of_row(rows_ref):
    t = pl.program_id(0)
    return jnp.where(t == 0, True, rows_ref[t] != rows_ref[jnp.maximum(t - 1, 0)])


# ---------------------------------------------------------------------------
# attention dropout — stateless per-edge hash mask
#
# The flash-style sweep cannot drop the NORMALIZED α (the denominator is not
# known until the sweep ends), so dropout applies to the numerator terms with
# the UNDROPPED denominator — exactly α̃ = mask ⊙ α / keep, the same semantics
# as models/gat.py's chunked segment path (and the paper's dropped-α up to
# the keep-scaling). The mask is a pure function of (dest id, src id, head,
# seed) via a murmur3-style integer mix, so the forward kernel, both backward
# sweeps (including the MIRROR orientation, which sees the edge transposed),
# and the COO residual paths all regenerate the identical mask with zero
# saved state — the reference's Philox re-walk trick (src/module.cu:16-99)
# without even a stream to walk.
# ---------------------------------------------------------------------------


def _hash_keep(dest, src, h: int, seed, threshold: int):
    """Boolean keep-mask, broadcast over dest × src. ``dest``/``src`` are
    integer id arrays (any broadcastable shapes), ``h`` a static head index,
    ``seed`` a traced int32 scalar, ``threshold`` = round(keep·2³²)."""
    k = (
        dest.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
        + src.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B)
        + jnp.uint32((h * 0xC2B2AE35) & 0xFFFFFFFF)
        + seed.astype(jnp.uint32)
    )
    k = k ^ (k >> 16)
    k = k * jnp.uint32(0x7FEB352D)
    k = k ^ (k >> 15)
    k = k * jnp.uint32(0x846CA68B)
    k = k ^ (k >> 16)
    return k < jnp.uint32(threshold)


def _rate_to_threshold(rate: float) -> int:
    return min(int(round((1.0 - rate) * 2.0**32)), 2**32 - 1)


def _edge_keep(rrow, rcol, H: int, seed, rate: float):
    """[E, H] keep-mask for COO residual edges (dest=rrow, src=rcol ids)."""
    thr = _rate_to_threshold(rate)
    return jnp.stack(
        [_hash_keep(rrow, rcol, h, seed, thr) for h in range(H)], axis=1
    )


def _leaky(x, slope):
    return jnp.where(x >= 0, x, slope * x)


def _leaky_grad(x, slope):
    return jnp.where(x >= 0, 1.0, slope)


# ---------------------------------------------------------------------------
# forward kernel: one sweep -> (unnormalized acc, running max m, denom den)
# ---------------------------------------------------------------------------


def _tile_keep(rows_ref, cols_ref, seed_ref, t, h, R, C, tile_r, tile_c,
               rate):
    """[R, C] keep-mask for grid step ``t``'s tile from the GLOBAL dest/src
    ids (row block · tile_r + sublane, col block · tile_c + lane)."""
    dest = rows_ref[t] * tile_r + jax.lax.broadcasted_iota(
        jnp.int32, (R, C), 0)
    src = cols_ref[t] * tile_c + jax.lax.broadcasted_iota(
        jnp.int32, (R, C), 1)
    return _hash_keep(dest, src, h, seed_ref[0], _rate_to_threshold(rate))


def _fwd_kernel(H, D, slope, rate, rows_ref, cols_ref, seed_ref, tiles_ref,
                st_ref, tt_ref, v_ref, acc_ref, stat_ref):
    """Grid (T,). Per step: the pattern tile [R, C], the DEST-row block of the
    packed [s‖t] array (st_ref, [R, 128]), the SOURCE-col block (tt_ref,
    [C, 128]) and the source block of v ([C, HDpad]). Outputs revisit per
    tile-row span: acc [R, HDpad] (numerator), stat [R, 128] (m at [0:H],
    den at [H:2H]) — both f32, finalized (merge + divide) by the caller.
    ``rate`` > 0: attention dropout on the numerator terms (hash mask)."""
    live = tiles_ref[0] != 0  # [R, C] edge pattern (any tile dtype)

    @pl.when(_is_first_of_row(rows_ref))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        # m lanes [0:H] start at _NEG, den lanes [H:2H] at 0 (no in-kernel
        # scatter: build the init with an iota mask)
        lane = jax.lax.broadcasted_iota(jnp.int32, stat_ref.shape, 1)
        stat_ref[:] = jnp.where(lane < H, _NEG, 0.0)

    t_id = pl.program_id(0)
    R, C = live.shape
    tile_r, tile_c = tiles_ref.shape[1], tiles_ref.shape[2]
    v = v_ref[:].astype(jnp.float32)
    for h in range(H):
        s_h = st_ref[:, h : h + 1].astype(jnp.float32)        # [R, 1] dest
        t_h = tt_ref[:, H + h : H + h + 1].astype(jnp.float32)  # [C, 1] src
        e = _leaky(s_h + t_h.T, slope)                         # [R, C]
        e = jnp.where(live, e, _NEG)
        tile_m = jnp.max(e, axis=1, keepdims=True)             # [R, 1]
        m_old = stat_ref[:, h : h + 1]
        m_new = jnp.maximum(m_old, tile_m)
        # masked positions: e == _NEG << m_new -> exp underflows to exactly 0
        # UNLESS the whole row is still empty (m_new == _NEG) — re-mask.
        w = jnp.where(live, jnp.exp(e - m_new), 0.0)           # [R, C]
        scale = jnp.exp(m_old - m_new)                         # [R, 1]
        den_old = stat_ref[:, H + h : H + h + 1]
        stat_ref[:, H + h : H + h + 1] = (
            den_old * scale + jnp.sum(w, axis=1, keepdims=True)
        )
        stat_ref[:, h : h + 1] = m_new
        wn = w
        if rate > 0.0:
            keep = _tile_keep(rows_ref, cols_ref, seed_ref, t_id, h,
                              R, C, tile_r, tile_c, rate)
            wn = jnp.where(keep, w * (1.0 / (1.0 - rate)), 0.0)
        acc = acc_ref[:, h * D : (h + 1) * D]
        acc_ref[:, h * D : (h + 1) * D] = acc * scale + jnp.dot(
            wn, v[:, h * D : (h + 1) * D], preferred_element_type=jnp.float32
        )


def _fwd_tiles(tiles, trow, tcol, st_row, st_col, v_pad, H, D, slope, n_rows,
               rate=0.0, seed=None):
    """One forward sweep. ``st_row`` is indexed by the tiles' ROW blocks
    (dest side, s at lanes [0:H]); ``st_col`` and ``v_pad`` by their COL
    blocks (source side, t at lanes [H:2H]). Square packs pass the same
    packed array twice; the mesh rect path passes the local rows' pack and
    the halo buffer's pack."""
    T, tile_r, tile_c = tiles.shape
    hd_pad = v_pad.shape[1]
    kernel = partial(_fwd_kernel, H, D, slope, rate)
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # trow, tcol, seed
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, tile_r, tile_c),
                             lambda t, rows, cols, seed: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_r, _LANE),
                             lambda t, rows, cols, seed: (rows[t], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_c, _LANE),
                             lambda t, rows, cols, seed: (cols[t], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_c, hd_pad),
                             lambda t, rows, cols, seed: (cols[t], 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tile_r, hd_pad),
                             lambda t, rows, cols, seed: (rows[t], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_r, _LANE),
                             lambda t, rows, cols, seed: (rows[t], 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, hd_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, _LANE), jnp.float32),
        ],
        interpret=_INTERPRET[0],
    )(trow, tcol, seed.reshape(1).astype(jnp.int32), tiles, st_row, st_col,
      v_pad)


# ---------------------------------------------------------------------------
# backward kernel: one sweep -> (dv, ds, dt) from the saved O(N·H) statistics
# ---------------------------------------------------------------------------


def _bwd_kernel(H, D, slope, rate, rows_ref, cols_ref, seed_ref, tiles_ref,
                st_r_ref, st_c_ref, md_r_ref, md_c_ref,
                v_r_ref, v_c_ref, g_r_ref, g_c_ref,
                dv_ref, dst_ref):
    """Per tile (rb, cb): re-derive the forward α block A (dest rows rb) and
    the MIRRORED-orientation block A' (dest rows in cb, source rows in rb —
    valid because the packed edge set is symmetric), then

        ds[rb] += Σ_c  A ⊙ (m̃ ⊙ g_rb·v_cbᵀ − ρ_rb) ⊙ leaky'   (row sums)
        dt[rb] += Σ_c  A' ⊙ (m̃' ⊙ v_rb·g_cbᵀ − ρ_cb) ⊙ leaky'  (mirror rows)
        dv[rb] += (A' ⊙ m̃') · g_cb                              (mirror SpMM)

    md_* packs [m ‖ den ‖ ρ] at lanes [0:H], [H:2H], [2H:3H]. With attention
    dropout (rate > 0) m̃ is the hash keep-mask / keep; the MIRROR mask m̃' is
    the same hash evaluated with dest/src swapped (the mirror edge's own
    ids) — regenerated, never stored."""
    live = tiles_ref[0] != 0  # [R, C]

    @pl.when(_is_first_of_row(rows_ref))
    def _():
        dv_ref[:] = jnp.zeros_like(dv_ref)
        dst_ref[:] = jnp.zeros_like(dst_ref)

    t_id = pl.program_id(0)
    R, C = live.shape
    tile_r, tile_c = tiles_ref.shape[1], tiles_ref.shape[2]
    v_r = v_r_ref[:].astype(jnp.float32)
    v_c = v_c_ref[:].astype(jnp.float32)
    g_r = g_r_ref[:].astype(jnp.float32)
    g_c = g_c_ref[:].astype(jnp.float32)
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        s_r = st_r_ref[:, h : h + 1]          # [R, 1]
        t_r = st_r_ref[:, H + h : H + h + 1]  # [R, 1]
        s_c = st_c_ref[:, h : h + 1]          # [C, 1]
        t_c = st_c_ref[:, H + h : H + h + 1]  # [C, 1]
        m_r = md_r_ref[:, h : h + 1]
        den_r = jnp.maximum(md_r_ref[:, H + h : H + h + 1], 1e-16)
        rho_r = md_r_ref[:, 2 * H + h : 2 * H + h + 1]
        m_c = md_c_ref[:, h : h + 1]
        den_c = jnp.maximum(md_c_ref[:, H + h : H + h + 1], 1e-16)
        rho_c = md_c_ref[:, 2 * H + h : 2 * H + h + 1]

        # forward orientation: dest i in rb, source j in cb. Mask the logits
        # to _NEG BEFORE the exp (like the forward): at dead rows m == _NEG
        # and an unmasked exp(pre - m) overflows to inf/NaN, which survives
        # a multiply-lowered select — the masked exp argument is always <= 0.
        pre = s_r + t_c.T                                     # [R, C]
        e_f = jnp.where(live, _leaky(pre, slope), _NEG)
        a = jnp.where(live, jnp.exp(e_f - m_r) / den_r, 0.0)
        dot_a = jnp.dot(g_r[:, sl], v_c[:, sl].T,
                        preferred_element_type=jnp.float32)   # [R, C]
        if rate > 0.0:
            keep = _tile_keep(rows_ref, cols_ref, seed_ref, t_id, h,
                              R, C, tile_r, tile_c, rate)
            dot_a = jnp.where(keep, dot_a * (1.0 / (1.0 - rate)), 0.0)
        d_fwd = a * (dot_a - rho_r) * _leaky_grad(pre, slope)
        dst_ref[:, h : h + 1] += jnp.sum(d_fwd, axis=1, keepdims=True)

        # mirrored orientation: dest i' = cb-row b, source j' = rb-row a;
        # entry [a, b] = α_{i', j'} — the pattern mask is the SAME tile
        # (edge (a, b) present ⇔ mirror edge present, symmetric split)
        pre_m = t_r + s_c.T                                   # [R, C]
        e_m = jnp.where(live, _leaky(pre_m, slope), _NEG)
        a_m = jnp.where(live, jnp.exp(e_m - m_c.T) / den_c.T, 0.0)
        dot_b = jnp.dot(v_r[:, sl], g_c[:, sl].T,
                        preferred_element_type=jnp.float32)   # [R, C]
        if rate > 0.0:
            # the mirror edge's OWN ids: dest = cb-col id, src = rb-row id
            dest_m = cols_ref[t_id] * tile_c + jax.lax.broadcasted_iota(
                jnp.int32, (R, C), 1)
            src_m = rows_ref[t_id] * tile_r + jax.lax.broadcasted_iota(
                jnp.int32, (R, C), 0)
            keep_m = _hash_keep(dest_m, src_m, h, seed_ref[0],
                                _rate_to_threshold(rate))
            dot_b = jnp.where(keep_m, dot_b * (1.0 / (1.0 - rate)), 0.0)
            a_mn = jnp.where(keep_m, a_m * (1.0 / (1.0 - rate)), 0.0)
        else:
            a_mn = a_m
        d_mir = a_m * (dot_b - rho_c.T) * _leaky_grad(pre_m, slope)
        dst_ref[:, H + h : H + h + 1] += jnp.sum(d_mir, axis=1, keepdims=True)

        dv_ref[:, sl] += jnp.dot(a_mn, g_c[:, sl],
                                 preferred_element_type=jnp.float32)


def _bwd_tiles(tiles, trow, tcol, st_pad, md_pad, v_pad, g_pad, H, D, slope,
               n_rows, rate=0.0, seed=None):
    T, tile_r, tile_c = tiles.shape
    hd_pad = v_pad.shape[1]
    kernel = partial(_bwd_kernel, H, D, slope, rate)
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)

    def rb(shape_r):
        return pl.BlockSpec((shape_r, _LANE),
                            lambda t, rows, cols, seed: (rows[t], 0),
                            memory_space=pltpu.VMEM)

    def cb(shape_c):
        return pl.BlockSpec((shape_c, _LANE),
                            lambda t, rows, cols, seed: (cols[t], 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, tile_r, tile_c),
                             lambda t, rows, cols, seed: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                rb(tile_r), cb(tile_c),          # st at rb / cb
                rb(tile_r), cb(tile_c),          # m‖den‖ρ at rb / cb
                pl.BlockSpec((tile_r, hd_pad),
                             lambda t, rows, cols, seed: (rows[t], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_c, hd_pad),
                             lambda t, rows, cols, seed: (cols[t], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_r, hd_pad),
                             lambda t, rows, cols, seed: (rows[t], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_c, hd_pad),
                             lambda t, rows, cols, seed: (cols[t], 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tile_r, hd_pad),
                             lambda t, rows, cols, seed: (rows[t], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_r, _LANE),
                             lambda t, rows, cols, seed: (rows[t], 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, hd_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, _LANE), jnp.float32),
        ],
        interpret=_INTERPRET[0],
    )(trow, tcol, seed.reshape(1).astype(jnp.int32), tiles, st_pad, st_pad,
      md_pad, md_pad, v_pad, v_pad, g_pad, g_pad)


# ---------------------------------------------------------------------------
# rectangular backward kernels (mesh slabs: local dest rows x halo-buffer
# source cols). The slab is NOT symmetric, so the fused mirror-trick kernel
# above does not apply; instead two sweeps over the same tile set — the
# row-sorted pack emits ds (dest side), a col-sorted copy emits dt/dv into
# the buffer space (output revisiting needs consecutive identical block
# indices, hence the second sort order).
# ---------------------------------------------------------------------------


def _bwd_rect_row_kernel(H, D, slope, rate, rows_ref, cols_ref, seed_ref,
                         tiles_ref, s_r_ref, t_c_ref, md_r_ref, v_c_ref,
                         g_r_ref, ds_ref):
    """Grid (T,), tiles sorted by ROW block. ds[rb] += row-sums of
    A ⊙ (m̃ ⊙ g_r·v_cᵀ − ρ_r) ⊙ leaky' — the forward orientation only."""
    live = tiles_ref[0] != 0

    @pl.when(_is_first_of_row(rows_ref))
    def _():
        ds_ref[:] = jnp.zeros_like(ds_ref)

    t_id = pl.program_id(0)
    R, C = live.shape
    tile_r, tile_c = tiles_ref.shape[1], tiles_ref.shape[2]
    v_c = v_c_ref[:].astype(jnp.float32)
    g_r = g_r_ref[:].astype(jnp.float32)
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        s_r = s_r_ref[:, h : h + 1]
        t_c = t_c_ref[:, H + h : H + h + 1]
        m_r = md_r_ref[:, h : h + 1]
        den_r = jnp.maximum(md_r_ref[:, H + h : H + h + 1], 1e-16)
        rho_r = md_r_ref[:, 2 * H + h : 2 * H + h + 1]
        pre = s_r + t_c.T
        e_f = jnp.where(live, _leaky(pre, slope), _NEG)
        a = jnp.where(live, jnp.exp(e_f - m_r) / den_r, 0.0)
        dot_a = jnp.dot(g_r[:, sl], v_c[:, sl].T,
                        preferred_element_type=jnp.float32)
        if rate > 0.0:
            keep = _tile_keep(rows_ref, cols_ref, seed_ref, t_id, h,
                              R, C, tile_r, tile_c, rate)
            dot_a = jnp.where(keep, dot_a * (1.0 / (1.0 - rate)), 0.0)
        d_fwd = a * (dot_a - rho_r) * _leaky_grad(pre, slope)
        ds_ref[:, h : h + 1] += jnp.sum(d_fwd, axis=1, keepdims=True)


def _bwd_rect_col_kernel(H, D, slope, rate, cols_ref, rows_ref, seed_ref,
                         tiles_ref, s_r_ref, t_c_ref, md_r_ref, v_c_ref,
                         g_r_ref, dv_ref, dt_ref):
    """Grid (T,), tiles sorted by COL block (rows_ref/cols_ref carry that
    order). Source-side sums: dt[cb] += col-sums of the SAME jacobian term,
    dv[cb] += (A ⊙ m̃)ᵀ·g_r — stats stay dest-side (md at the tile's row
    block)."""
    live = tiles_ref[0] != 0

    @pl.when(_is_first_of_row(cols_ref))
    def _():
        dv_ref[:] = jnp.zeros_like(dv_ref)
        dt_ref[:] = jnp.zeros_like(dt_ref)

    t_id = pl.program_id(0)
    R, C = live.shape
    tile_r, tile_c = tiles_ref.shape[1], tiles_ref.shape[2]
    v_c = v_c_ref[:].astype(jnp.float32)
    g_r = g_r_ref[:].astype(jnp.float32)
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        s_r = s_r_ref[:, h : h + 1]
        t_c = t_c_ref[:, H + h : H + h + 1]
        m_r = md_r_ref[:, h : h + 1]
        den_r = jnp.maximum(md_r_ref[:, H + h : H + h + 1], 1e-16)
        rho_r = md_r_ref[:, 2 * H + h : 2 * H + h + 1]
        pre = s_r + t_c.T
        e_f = jnp.where(live, _leaky(pre, slope), _NEG)
        a = jnp.where(live, jnp.exp(e_f - m_r) / den_r, 0.0)
        dot_a = jnp.dot(g_r[:, sl], v_c[:, sl].T,
                        preferred_element_type=jnp.float32)
        if rate > 0.0:
            # same mask as the row sweep: ids come from the tile's OWN
            # (row block, col block), invariant to the pack's sort order
            keep = _tile_keep(rows_ref, cols_ref, seed_ref, t_id, h,
                              R, C, tile_r, tile_c, rate)
            dot_a = jnp.where(keep, dot_a * (1.0 / (1.0 - rate)), 0.0)
            an = jnp.where(keep, a * (1.0 / (1.0 - rate)), 0.0)
        else:
            an = a
        d_fwd = a * (dot_a - rho_r) * _leaky_grad(pre, slope)
        dt_ref[:, h : h + 1] += jnp.sum(d_fwd, axis=0, keepdims=True).T
        dv_ref[:, sl] += jnp.dot(an.T, g_r[:, sl],
                                 preferred_element_type=jnp.float32)


def _bwd_rect(tiles_r, trow_r, tcol_r, tiles_c, trow_c, tcol_c,
              s_row, t_col, md_row, v_col, g_row, H, D, slope,
              n_rows, n_cols, rate=0.0, seed=None):
    """The two rect backward sweeps. Row-sorted pack (tiles_r/trow_r/tcol_r)
    -> ds [n_rows, _LANE]; col-sorted copy (tiles_c/...) -> (dv, dt) in the
    source/buffer space [n_cols, ...]. Both packs must COVER their output
    block range (zero tiles for untouched blocks — gat_mesh_pack ensures it;
    uncovered output blocks would keep uninitialized HBM)."""
    T, tile_r, tile_c = tiles_r.shape
    hd_pad = v_col.shape[1]
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    seed = seed.reshape(1).astype(jnp.int32)

    ds = pl.pallas_call(
        partial(_bwd_rect_row_kernel, H, D, slope, rate),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # trow, tcol, seed
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, tile_r, tile_c),
                             lambda t, rows, cols, seed: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_r, _LANE),
                             lambda t, rows, cols, seed: (rows[t], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_c, _LANE),
                             lambda t, rows, cols, seed: (cols[t], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_r, _LANE),
                             lambda t, rows, cols, seed: (rows[t], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_c, hd_pad),
                             lambda t, rows, cols, seed: (cols[t], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_r, hd_pad),
                             lambda t, rows, cols, seed: (rows[t], 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tile_r, _LANE),
                             lambda t, rows, cols, seed: (rows[t], 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((n_rows, _LANE), jnp.float32)],
        interpret=_INTERPRET[0],
    )(trow_r, tcol_r, seed, tiles_r, s_row, t_col, md_row, v_col, g_row)[0]

    T_c = tiles_c.shape[0]
    dv, dt = pl.pallas_call(
        partial(_bwd_rect_col_kernel, H, D, slope, rate),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # COLS first: _is_first_of_row keys on it
            grid=(T_c,),
            in_specs=[
                pl.BlockSpec((1, tile_r, tile_c),
                             lambda t, cols, rows, seed: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_r, _LANE),
                             lambda t, cols, rows, seed: (rows[t], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_c, _LANE),
                             lambda t, cols, rows, seed: (cols[t], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_r, _LANE),
                             lambda t, cols, rows, seed: (rows[t], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_c, hd_pad),
                             lambda t, cols, rows, seed: (cols[t], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_r, hd_pad),
                             lambda t, cols, rows, seed: (rows[t], 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tile_c, hd_pad),
                             lambda t, cols, rows, seed: (cols[t], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_c, _LANE),
                             lambda t, cols, rows, seed: (cols[t], 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_cols, hd_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_cols, _LANE), jnp.float32),
        ],
        interpret=_INTERPRET[0],
    )(tcol_c, trow_c, seed, tiles_c, s_row, t_col, md_row, v_col, g_row)

    return ds, dt, dv


# ---------------------------------------------------------------------------
# the differentiable op: tiles (+ optional COO residual) -> softmax-attended
# aggregation, custom VJP in (s, t, v)
# ---------------------------------------------------------------------------


def _residual_stats(s, t, rrow, rcol, live, slope, n):
    e = _leaky(s[rrow] + t[rcol], slope)          # [E, H] f32
    e = jnp.where(live, e, _NEG)
    m = jax.ops.segment_max(e, rrow, num_segments=n, indices_are_sorted=True)
    m = jnp.maximum(m, _NEG)  # empty segments: -inf would poison exp
    (m_e,) = _gather_stats(m, idx=rrow)  # fenced: see _gather_stats
    w = jnp.where(live, jnp.exp(e - m_e), 0.0)
    den = jax.ops.segment_sum(w, rrow, num_segments=n, indices_are_sorted=True)
    return m, den


def _pack_st(s, t):
    n, H = s.shape
    out = jnp.zeros((n, _LANE), jnp.float32)
    return jax.lax.dynamic_update_slice(
        out, jnp.concatenate([s, t], axis=1).astype(jnp.float32), (0, 0)
    )


def _pack_lane(x, offset):
    """[n, H] -> [n, _LANE] f32 with ``x`` at lanes [offset, offset+H)."""
    n = x.shape[0]
    out = jnp.zeros((n, _LANE), jnp.float32)
    return jax.lax.dynamic_update_slice(out, x.astype(jnp.float32),
                                        (0, offset))


def _attend_impl(s, t, v, tiles, trow, tcol, rrow, rcol, rlive, seed, spec):
    """Forward evaluation; returns (out [n, H, D] f32, m, den [n, H])."""
    H, D, slope, has_res, rate = spec
    n = v.shape[0]
    hd_pad = _pad_lane(H * D)
    v_pad = jnp.zeros((n, hd_pad), jnp.float32)
    v_pad = jax.lax.dynamic_update_slice(
        v_pad, v.reshape(n, H * D).astype(jnp.float32), (0, 0)
    )
    st_pad = _pack_st(s, t)
    acc_t, stat = _fwd_tiles(tiles, trow, tcol, st_pad, st_pad, v_pad,
                             H, D, slope, n, rate=rate, seed=seed)
    m_t, den_t = stat[:, 0:H], stat[:, H : 2 * H]
    acc_t = acc_t[:, : H * D].reshape(n, H, D)

    if has_res:
        sf = s.astype(jnp.float32)
        tf = t.astype(jnp.float32)
        m_r, den_r = _residual_stats(sf, tf, rrow, rcol, rlive, slope, n)
        m = jnp.maximum(m_t, m_r)
        # mask the logits to _NEG before the exp (see _gat_attend_bwd):
        # padding edges point at padding rows whose m is _NEG
        (m_e,) = _gather_stats(m, idx=rrow)  # fenced: see _gather_stats
        e_r = jnp.where(rlive, _leaky(sf[rrow] + tf[rcol], slope), _NEG)
        w_r = jnp.where(rlive, jnp.exp(e_r - m_e), 0.0)
        wn_r = w_r
        if rate > 0.0:
            # same (dest, src, head, seed) hash the kernels evaluate — an
            # edge's mask is identical whether it rides a tile or the COO
            # residual (the hybrid split is layout, not semantics)
            keep_r = _edge_keep(rrow, rcol, H, seed[0], rate)
            wn_r = jnp.where(keep_r, w_r * (1.0 / (1.0 - rate)), 0.0)
        num_r = jax.ops.segment_sum(
            wn_r[:, :, None] * v.astype(jnp.float32)[rcol], rrow,
            num_segments=n, indices_are_sorted=True,
        )
        scale_t = jnp.exp(m_t - m)
        den = den_t * scale_t + jax.ops.segment_sum(
            w_r, rrow, num_segments=n, indices_are_sorted=True
        )
        acc = acc_t * scale_t[:, :, None] + num_r
    else:
        m, den, acc = m_t, den_t, acc_t
    out = acc / jnp.maximum(den, 1e-16)[:, :, None]
    return out, m, den


@partial(jax.custom_vjp, nondiff_argnums=(10,))
def _gat_attend(s, t, v, tiles, trow, tcol, rrow, rcol, rlive, seed, spec):
    out, _, _ = _attend_impl(s, t, v, tiles, trow, tcol, rrow, rcol, rlive,
                             seed, spec)
    return out


def _gat_attend_fwd(s, t, v, tiles, trow, tcol, rrow, rcol, rlive, seed,
                    spec):
    out, m, den = _attend_impl(s, t, v, tiles, trow, tcol, rrow, rcol, rlive,
                               seed, spec)
    return out, (s, t, v, tiles, trow, tcol, rrow, rcol, rlive, seed, m, den,
                 out)


def _gat_attend_bwd(spec, res, g):
    H, D, slope, has_res, rate = spec
    (s, t, v, tiles, trow, tcol, rrow, rcol, rlive, seed, m, den,
     out) = res
    n = v.shape[0]
    g = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    sf = s.astype(jnp.float32)
    tf = t.astype(jnp.float32)
    rho = jnp.sum(g * out, axis=-1)  # [n, H]

    hd_pad = _pad_lane(H * D)

    def pad_hd(x3):
        buf = jnp.zeros((n, hd_pad), jnp.float32)
        return jax.lax.dynamic_update_slice(buf, x3.reshape(n, H * D), (0, 0))

    st_pad = _pack_st(s, t)
    md_pad = jnp.zeros((n, _LANE), jnp.float32)
    md_pad = jax.lax.dynamic_update_slice(
        md_pad, jnp.concatenate([m, den, rho], axis=1), (0, 0)
    )
    dv_t, dst = _bwd_tiles(tiles, trow, tcol, st_pad, md_pad, pad_hd(v32),
                           pad_hd(g), H, D, slope, n, rate=rate, seed=seed)
    dv = dv_t[:, : H * D].reshape(n, H, D)
    ds = dst[:, 0:H]
    dt = dst[:, H : 2 * H]

    if has_res:
        den_g = jnp.maximum(den, 1e-16)
        inv_keep = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
        # forward orientation (dest = rrow): ds. Logits masked to _NEG before
        # the exp — padding edges point at padding rows whose m is _NEG, and
        # an unmasked exp(pre - m) overflows (same hazard as in the kernel).
        # The gathered stats are FENCED — see _gather_stats.
        m_r, den_r, rho_r = _gather_stats(m, den_g, rho, idx=rrow)
        pre = sf[rrow] + tf[rcol]
        e_f = jnp.where(rlive, _leaky(pre, slope), _NEG)
        a = jnp.where(rlive, jnp.exp(e_f - m_r) / den_r, 0.0)
        dot_a = jnp.sum(g[rrow] * v32[rcol], axis=-1)
        if rate > 0.0:
            keep_f = _edge_keep(rrow, rcol, H, seed[0], rate)
            dot_a = jnp.where(keep_f, dot_a * inv_keep, 0.0)
        d_fwd = a * (dot_a - rho_r) * _leaky_grad(pre, slope)
        ds = ds + jax.ops.segment_sum(d_fwd, rrow, num_segments=n,
                                      indices_are_sorted=True)
        # mirrored orientation (the residual edge set is symmetric, like the
        # tiles): per edge (r, c) process its mirror's contribution so every
        # scatter stays sorted by rrow
        m_c, den_c, rho_c = _gather_stats(m, den_g, rho, idx=rcol)
        pre_m = sf[rcol] + tf[rrow]
        e_m = jnp.where(rlive, _leaky(pre_m, slope), _NEG)
        a_m = jnp.where(rlive, jnp.exp(e_m - m_c) / den_c, 0.0)
        dot_b = jnp.sum(g[rcol] * v32[rrow], axis=-1)
        if rate > 0.0:
            # the mirror edge's OWN ids: dest = rcol, src = rrow
            keep_m = _edge_keep(rcol, rrow, H, seed[0], rate)
            dot_b = jnp.where(keep_m, dot_b * inv_keep, 0.0)
            a_mn = jnp.where(keep_m, a_m * inv_keep, 0.0)
        else:
            a_mn = a_m
        d_mir = a_m * (dot_b - rho_c) * _leaky_grad(pre_m, slope)
        dt = dt + jax.ops.segment_sum(d_mir, rrow, num_segments=n,
                                      indices_are_sorted=True)
        dv = dv + jax.ops.segment_sum(a_mn[:, :, None] * g[rcol], rrow,
                                      num_segments=n, indices_are_sorted=True)

    return (ds.astype(s.dtype), dt.astype(t.dtype), dv.astype(v.dtype),
            None, None, None, None, None, None, None)


_gat_attend.defvjp(_gat_attend_fwd, _gat_attend_bwd)


def gat_attend_tiles(graph, s, t, v, *, slope: float,
                     attn_dropout: float = 0.0,
                     seed=None) -> jnp.ndarray:
    """Softmax attention aggregation over a tile-packed graph:
    ``out_i = Σ_j softmax_j(LeakyReLU(s_i + t_j)) · v_j`` for j in N(i)∪{i},
    the edge set being the BCSR pattern plus (hybrid builds) the COO residual.

    s, t: [n_nodes, heads] logit halves; v: [n_nodes, heads, d].
    Returns [n_nodes, heads, d] float32. Differentiable in s, t, v.

    ``attn_dropout`` > 0 (training only — callers gate on it) drops the
    normalized coefficients: the numerator terms are masked with the
    UNDROPPED denominator (α̃ = mask ⊙ α / keep — models/gat.py's segment
    semantics). The mask is the stateless per-edge hash of
    (dest, src, head, ``seed``) — regenerated identically inside the forward
    kernel, both backward sweeps, and the COO residual paths, never stored.
    ``seed``: int32 scalar (array or python int), required when the rate > 0.

    Requirements (asserted): a tile pack on the graph; a SYMMETRIC edge set
    (the repo invariant — split_dense_tiles enforces it for hybrid splits,
    full packs of Â are symmetric), which the backward's sorted-traversal
    mirror trick relies on; heads ≤ 42 (3·H statistics lanes ≤ 128)."""
    pack = graph.bcsr
    assert pack is not None, "gat_attend_tiles needs a tile pack (bcsr/hybrid)"
    n, H = s.shape
    assert v.shape[:2] == (n, H) and t.shape == (n, H)
    assert 3 * H <= _LANE, f"heads={H} exceeds the packed-statistics lanes"
    assert n == pack.n_nodes, (n, pack.n_nodes)
    rate = float(attn_dropout)
    assert 0.0 <= rate < 1.0, rate
    if rate > 0.0:
        assert seed is not None, "attn_dropout > 0 needs a seed"
    seed_arr = (jnp.zeros((1,), jnp.int32) if seed is None
                else jnp.asarray(seed, jnp.int32).reshape(1))
    tiles, trow, tcol = _split_wide(pack.tiles, pack.tile_rows,
                                    pack.tile_cols)
    has_res = bool(graph.is_hybrid)
    if has_res:
        rrow, rcol = graph.row, graph.col
        rlive = (graph.val != 0.0)[:, None]
    else:
        # pure pack: the whole edge set lives in the tiles; feed an empty
        # residual (static flag keeps the segment ops out of the program)
        rrow = rcol = jnp.zeros((1,), jnp.int32)
        rlive = jnp.zeros((1, 1), bool)
    D = v.shape[2]
    return _gat_attend(
        s, t, v, tiles, trow, tcol,
        rrow, rcol, rlive, seed_arr, (H, D, float(slope), has_res, rate),
    )


# ---------------------------------------------------------------------------
# the rect differentiable op: mesh slab attention (local dest rows × compact
# halo-buffer source cols). Packs come from parallel.partition.gat_mesh_pack;
# callers run this per device inside shard_map and let autodiff transpose the
# surrounding halo exchange (the op's (dt, dv) cotangents live in BUFFER
# space; _gather_buffer's AD ships the halo part back to its owners).
# ---------------------------------------------------------------------------


def _pad_hd(x3, hd_pad):
    n = x3.shape[0]
    buf = jnp.zeros((n, hd_pad), jnp.float32)
    return jax.lax.dynamic_update_slice(
        buf, x3.reshape(n, -1).astype(jnp.float32), (0, 0)
    )


def _attend_rect_impl(s, t_buf, v_buf, tiles_r, trow_r, tcol_r,
                      rrow, rcol, rlive, seed, spec):
    """Forward evaluation; returns (out [n_rows, H, D] f32, m, den)."""
    H, D, slope, has_res, rate = spec
    n_rows = s.shape[0]
    n_buf = t_buf.shape[0]
    hd_pad = _pad_lane(H * D)
    v_pad = _pad_hd(v_buf, hd_pad)
    st_row = _pack_lane(s, 0)
    st_col = _pack_lane(t_buf, H)
    acc_t, stat = _fwd_tiles(tiles_r, trow_r, tcol_r, st_row, st_col, v_pad,
                             H, D, slope, n_rows, rate=rate, seed=seed)
    m_t, den_t = stat[:, 0:H], stat[:, H : 2 * H]
    acc_t = acc_t[:, : H * D].reshape(n_rows, H, D)

    if has_res:
        sf = s.astype(jnp.float32)
        tf = t_buf.astype(jnp.float32)
        m_r, den_r = _residual_stats(sf, tf, rrow, rcol, rlive, slope, n_rows)
        m = jnp.maximum(m_t, m_r)
        (m_e,) = _gather_stats(m, idx=rrow)  # fenced: see _gather_stats
        e_r = jnp.where(rlive, _leaky(sf[rrow] + tf[rcol], slope), _NEG)
        w_r = jnp.where(rlive, jnp.exp(e_r - m_e), 0.0)
        wn_r = w_r
        if rate > 0.0:
            # same (LOCAL dest, BUFFER src) id spaces the rect kernels hash —
            # an edge's mask is identical whether it rides a tile or the
            # residual (both see rrow/tile-row-block local, rcol/buffer-block)
            keep_r = _edge_keep(rrow, rcol, H, seed[0], rate)
            wn_r = jnp.where(keep_r, w_r * (1.0 / (1.0 - rate)), 0.0)
        num_r = jax.ops.segment_sum(
            wn_r[:, :, None] * v_buf.astype(jnp.float32)[rcol], rrow,
            num_segments=n_rows, indices_are_sorted=True,
        )
        scale_t = jnp.exp(m_t - m)
        den = den_t * scale_t + jax.ops.segment_sum(
            w_r, rrow, num_segments=n_rows, indices_are_sorted=True
        )
        acc = acc_t * scale_t[:, :, None] + num_r
    else:
        m, den, acc = m_t, den_t, acc_t
    out = acc / jnp.maximum(den, 1e-16)[:, :, None]
    return out, m, den


@partial(jax.custom_vjp, nondiff_argnums=(13,))
def _gat_attend_rect(s, t_buf, v_buf, tiles_r, trow_r, tcol_r,
                     tiles_c, trow_c, tcol_c, rrow, rcol, rlive, seed, spec):
    out, _, _ = _attend_rect_impl(s, t_buf, v_buf, tiles_r, trow_r, tcol_r,
                                  rrow, rcol, rlive, seed, spec)
    return out


def _gat_attend_rect_fwd(s, t_buf, v_buf, tiles_r, trow_r, tcol_r,
                         tiles_c, trow_c, tcol_c, rrow, rcol, rlive, seed,
                         spec):
    out, m, den = _attend_rect_impl(s, t_buf, v_buf, tiles_r, trow_r, tcol_r,
                                    rrow, rcol, rlive, seed, spec)
    return out, (s, t_buf, v_buf, tiles_r, trow_r, tcol_r,
                 tiles_c, trow_c, tcol_c, rrow, rcol, rlive, seed, m, den,
                 out)


def _gat_attend_rect_bwd(spec, res, g):
    H, D, slope, has_res, rate = spec
    (s, t_buf, v_buf, tiles_r, trow_r, tcol_r, tiles_c, trow_c, tcol_c,
     rrow, rcol, rlive, seed, m, den, out) = res
    n_rows = s.shape[0]
    n_buf = t_buf.shape[0]
    g = g.astype(jnp.float32)
    rho = jnp.sum(g * out, axis=-1)  # [n_rows, H]
    hd_pad = _pad_lane(H * D)

    st_row = _pack_lane(s, 0)
    st_col = _pack_lane(t_buf, H)
    md_row = jnp.zeros((n_rows, _LANE), jnp.float32)
    md_row = jax.lax.dynamic_update_slice(
        md_row, jnp.concatenate([m, den, rho], axis=1), (0, 0)
    )
    ds_p, dt_p, dv_p = _bwd_rect(
        tiles_r, trow_r, tcol_r, tiles_c, trow_c, tcol_c,
        st_row, st_col, md_row, _pad_hd(v_buf, hd_pad), _pad_hd(g, hd_pad),
        H, D, slope, n_rows, n_buf, rate=rate, seed=seed,
    )
    ds = ds_p[:, 0:H]
    dt = dt_p[:, 0:H]
    dv = dv_p[:, : H * D].reshape(n_buf, H, D)

    if has_res:
        den_g = jnp.maximum(den, 1e-16)
        sf = s.astype(jnp.float32)
        tf = t_buf.astype(jnp.float32)
        v32 = v_buf.astype(jnp.float32)
        # forward orientation only: the slab is NOT symmetric, so dest-side
        # sums ride the sorted rrow segment path while the source-side sums
        # (dt, dv) scatter-add into the buffer space (small residual set).
        # Logits masked to _NEG before the exp and gathered stats fenced —
        # the same hazards as _gat_attend_bwd.
        m_r, den_r, rho_r = _gather_stats(m, den_g, rho, idx=rrow)
        pre = sf[rrow] + tf[rcol]
        e_f = jnp.where(rlive, _leaky(pre, slope), _NEG)
        a = jnp.where(rlive, jnp.exp(e_f - m_r) / den_r, 0.0)
        dot_a = jnp.sum(g[rrow] * v32[rcol], axis=-1)
        if rate > 0.0:
            keep_f = _edge_keep(rrow, rcol, H, seed[0], rate)
            dot_a = jnp.where(keep_f, dot_a * (1.0 / (1.0 - rate)), 0.0)
            a_n = jnp.where(keep_f, a * (1.0 / (1.0 - rate)), 0.0)
        else:
            a_n = a
        d_fwd = a * (dot_a - rho_r) * _leaky_grad(pre, slope)
        ds = ds + jax.ops.segment_sum(d_fwd, rrow, num_segments=n_rows,
                                      indices_are_sorted=True)
        dt = dt.at[rcol].add(d_fwd)
        dv = dv.at[rcol].add(a_n[:, :, None] * g[rrow])

    return (ds.astype(s.dtype), dt.astype(t_buf.dtype), dv.astype(v_buf.dtype),
            None, None, None, None, None, None, None, None, None, None)


_gat_attend_rect.defvjp(_gat_attend_rect_fwd, _gat_attend_rect_bwd)


def gat_attend_rect(s, t_buf, v_buf, tiles_r, trow_r, tcol_r,
                    tiles_c, trow_c, tcol_c, rrow, rcol, rval,
                    *, slope: float, has_res: bool,
                    attn_dropout: float = 0.0, seed=None) -> jnp.ndarray:
    """Mesh-slab softmax attention: ``out_i = Σ_j α_ij v_j`` for local dest
    rows i against the compact ``[local ; halo]`` source buffer (j ranges over
    the slab's tile pattern + COO residual — every edge of i, because the
    partition keeps a row's edges on its owner, so the softmax is complete).

    s: [n_local, H]; t_buf: [n_buf, H]; v_buf: [n_buf, H, D]. Packs from
    parallel.partition.gat_mesh_pack (row-sorted + col-sorted copies, both
    output ranges zero-tile-covered, tile_c ≤ 512). Differentiable in
    (s, t_buf, v_buf); the (dt, dv) cotangents are in buffer space — the
    caller's halo exchange transposes them back to their owners via autodiff.

    ``attn_dropout``/``seed``: the same stateless hash mask as
    gat_attend_tiles, over (LOCAL dest id, BUFFER src id) — callers fold the
    device index into the seed's key upstream so masks decorrelate across
    shards (train_parallel's per-device key fold does).

    Reference intent: SURVEY §2.4 SP/CP row (src/module.cu:172-210's
    partition-every-aggregation treatment applied to the attention op)."""
    n, H = s.shape
    assert t_buf.shape[1] == H and v_buf.shape[:2] == (t_buf.shape[0], H)
    assert 3 * H <= _LANE, f"heads={H} exceeds the packed-statistics lanes"
    assert tiles_r.shape[2] <= _MAX_TILE_C, (
        "gat_mesh_pack splits wide tiles; got tile_c="
        f"{tiles_r.shape[2]} > {_MAX_TILE_C}"
    )
    rate = float(attn_dropout)
    assert 0.0 <= rate < 1.0, rate
    if rate > 0.0:
        assert seed is not None, "attn_dropout > 0 needs a seed"
    seed_arr = (jnp.zeros((1,), jnp.int32) if seed is None
                else jnp.asarray(seed, jnp.int32).reshape(1))
    rlive = (rval != 0.0)[:, None]
    D = v_buf.shape[2]
    return _gat_attend_rect(
        s, t_buf, v_buf, tiles_r, trow_r, tcol_r, tiles_c, trow_c, tcol_c,
        rrow, rcol, rlive, seed_arr,
        (H, D, float(slope), bool(has_res), rate),
    )
