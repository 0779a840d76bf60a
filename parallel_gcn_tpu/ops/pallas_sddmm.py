"""SDDMM — sampled dense-dense matmul on BCSR tiles.

``out[i, j] = <a_i, b_j>`` evaluated ONLY where the sparse pattern has
support: the dual of the SpMM in ops/pallas_bcsr.py and the missing half of
the sparse-kernel pair named in BASELINE.json ("Pallas SpMM/SDDMM kernels").
Message-passing models with edge scores (GAT-style attention, edge softmax)
compute their scores exactly this way; the GCN family itself only needs SpMM,
so this op is beyond-reference surface.

Layout: the SAME tile pack geometry as ops/pallas_bcsr.BCSR — the pattern's
nonempty tile_r×tile_c blocks, sorted by tile-row. Each grid step contracts
one row-block of ``a`` with one col-block of ``b`` on the MXU and writes one
dense score tile; masking to the exact edge pattern (tiles of a 0/1 pattern
pack multiply in) is the caller's choice, since edge-softmax style consumers
often want the full tile anyway.

The VJP reuses the SpMM: for a score cotangent G with the pattern's tiles,
    dA = (S ⊙ G) · B   — exactly bcsr_matmul with G as the tile data
    dB = (S ⊙ G)ᵀ · A  — the same, because the supported patterns here are
                         SYMMETRIC (the repo's graph invariant); asserted via
                         the pack's sym-pattern contract like bcsr_matmul's.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parallel_gcn_tpu.ops.pallas_bcsr import _INTERPRET, BCSR, _bcsr_matmul_impl


def _sddmm_kernel(rows_ref, cols_ref, a_ref, b_ref, o_ref):
    del rows_ref, cols_ref
    o_ref[0] = jnp.dot(
        a_ref[:], b_ref[:].T, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _sddmm_impl(tile_rows, tile_cols, a, b, tile_r, tile_c):
    T = tile_rows.shape[0]
    k = a.shape[1]
    return pl.pallas_call(
        _sddmm_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # tile_rows, tile_cols
            grid=(T,),
            in_specs=[
                pl.BlockSpec(
                    (tile_r, k), lambda t, rows, cols: (rows[t], 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (tile_c, k), lambda t, rows, cols: (cols[t], 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, tile_r, tile_c), lambda t, rows, cols: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((T, tile_r, tile_c), jnp.float32),
        interpret=_INTERPRET[0],
    )(tile_rows, tile_cols, a, b)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _sddmm(tile_rows, tile_cols, mirror_perm, a, b, tile_r, tile_c, n_nodes):
    return _sddmm_impl(tile_rows, tile_cols, a, b, tile_r, tile_c)


def _sddmm_fwd(tile_rows, tile_cols, mirror_perm, a, b, tile_r, tile_c,
               n_nodes):
    out = _sddmm_impl(tile_rows, tile_cols, a, b, tile_r, tile_c)
    return out, (tile_rows, tile_cols, mirror_perm, a, b)


def _sddmm_bwd(tile_r, tile_c, n_nodes, res, g):
    tile_rows, tile_cols, mirror_perm, a, b = res
    # dA = (S ⊙ G)·B — G's tiles ARE BCSR data at the pack's positions, so
    # this is exactly the SpMM kernel. dB = (S ⊙ G)ᵀ·A: the transposed matrix
    # has block (r, c) = G-block (c, r)ᵀ; via the build-time mirror
    # permutation the transposed pack reuses the SAME row-sorted traversal
    # (the SpMM kernel's accumulator reset requires sorted tile rows).
    g = g.astype(jnp.float32)
    da = _bcsr_matmul_impl(
        g.astype(b.dtype), tile_rows, tile_cols, b, n_nodes
    ).astype(a.dtype)
    gt = jnp.transpose(g[mirror_perm], (0, 2, 1)).astype(a.dtype)
    db = _bcsr_matmul_impl(gt, tile_rows, tile_cols, a, n_nodes).astype(b.dtype)
    return None, None, None, da, db


_sddmm.defvjp(_sddmm_fwd, _sddmm_bwd)


def sddmm_bcsr(pack: BCSR, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per-tile score blocks ``out[t] = a[rows_t·R:(rows_t+1)·R] @ b[...].T``
    for every tile position of ``pack`` (only the pattern's tile geometry is
    used, not its values). a, b: [n_nodes, K] with n_nodes == pack.n_nodes.

    Returns [T, tile_r, tile_c] float32 score tiles in pack order — multiply
    elementwise with a 0/1 pattern pack's tiles to mask to the exact edges.

    Differentiable in a and b; the backward reuses the SpMM kernel and
    requires a SYMMETRIC tile-position set with square tiles (the repo's
    graph packs satisfy both; see module docstring)."""
    assert a.shape[0] == pack.n_nodes and b.shape[0] == pack.n_nodes
    assert a.shape[1] == b.shape[1]
    assert pack.tile_r == pack.tile_c, (
        "sddmm backward needs square tiles (symmetric transpose shortcut)"
    )
    assert pack.mirror_perm is not None, (
        "sddmm backward needs a symmetric tile-position set (mirror_perm is "
        "computed by build_bcsr when the pattern is symmetric)"
    )
    return _sddmm(
        pack.tile_rows, pack.tile_cols, pack.mirror_perm, a, b,
        pack.tile_r, pack.tile_c, pack.n_nodes,
    )
