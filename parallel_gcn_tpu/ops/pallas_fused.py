"""Fused dropout + matmul Pallas kernel: ``Y = (mask ⊙ X) @ W / keep``.

The per-epoch cost of the unfused pair is three X-sized HBM passes (dropout
read + dropout write + matmul read); this kernel generates the keep-mask from
the TPU hardware PRNG inside the matmul's k-loop, so X is read ONCE and the
masked intermediate never exists in HBM. It is the fusion of the reference's
two hand-written kernels (dropout src/module.cu:16-63 + tiled GEMM
src/module.cu:274-328) that CUDA's module boundaries prevented.

Mask reproducibility: the mask for block (i, j) is a pure function of
``seed + i * nj + j`` over fixed (BM, BK) block geometry. The backward kernels
re-seed identically and regenerate the same bits — the reference's
re-walk-the-Philox-stream trick (src/module.cu:80-99), applied across an op
boundary.

Out-of-bounds: Pallas pads non-dividing edge blocks with unspecified values;
the in-bounds row/col predicates are folded into the keep-mask so any padding
garbage is multiplied by zero. No host-side padding of X or W is required.

VJP (all with regenerated masks, no saved mask):
    dW = (mask ⊙ X)ᵀ @ g / keep      (grid transposed: dW block revisited)
    dX = mask ⊙ (g @ Wᵀ) / keep
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = [False]


def _keep_mask(i, j, nj, seed_ref, shape, threshold, n_rows, n_cols):
    """Regenerate block (i, j)'s keep-mask ∧ in-bounds predicate."""
    pltpu.prng_seed(seed_ref[0] + i * nj + j)
    bits = pltpu.prng_random_bits(shape).astype(jnp.uint32)
    keep = bits < jnp.uint32(threshold)
    row_ids = i * shape[0] + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    col_ids = j * shape[1] + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    inbounds = (row_ids < n_rows) & (col_ids < n_cols)
    return keep & inbounds


def _fwd_kernel(seed_ref, x_ref, w_ref, o_ref, *, threshold, inv_keep, nj,
                n_rows, n_cols, precision):
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when(j == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    mask = _keep_mask(i, j, nj, seed_ref, x_ref.shape, threshold, n_rows, n_cols)
    x = x_ref[:]
    xm = jnp.where(mask, x * jnp.asarray(inv_keep, x.dtype), 0)
    # zero W's out-of-bounds contraction rows: edge-block padding is
    # unspecified, and 0 (from xm) x garbage is NaN-prone
    w = w_ref[:]
    k_ids = j * w.shape[0] + jax.lax.broadcasted_iota(jnp.int32, w.shape, 0)
    w = jnp.where(k_ids < n_cols, w, 0)
    o_ref[:] += jnp.dot(xm, w.astype(xm.dtype),
                        preferred_element_type=jnp.float32,
                        precision=precision)


def _dw_kernel(seed_ref, x_ref, g_ref, o_ref, *, threshold, inv_keep, nj,
               n_rows, n_cols, precision):
    # grid is (J, I): the dW block (j) is revisited across the inner i steps
    j, i = pl.program_id(0), pl.program_id(1)

    @pl.when(i == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    mask = _keep_mask(i, j, nj, seed_ref, x_ref.shape, threshold, n_rows, n_cols)
    x = x_ref[:]
    xm = jnp.where(mask, x * jnp.asarray(inv_keep, x.dtype), 0)
    # zero g's out-of-bounds contraction rows (same NaN hazard as in forward)
    g = g_ref[:]
    r_ids = i * g.shape[0] + jax.lax.broadcasted_iota(jnp.int32, g.shape, 0)
    g = jnp.where(r_ids < n_rows, g, 0)
    # xmᵀ @ g: contract the row (bm) axis
    o_ref[:] += jax.lax.dot_general(
        xm, g.astype(xm.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )


def _dx_kernel(seed_ref, g_ref, w_ref, o_ref, *, threshold, inv_keep, nj,
               n_rows, n_cols, precision):
    i, j = pl.program_id(0), pl.program_id(1)
    mask = _keep_mask(i, j, nj, seed_ref, o_ref.shape, threshold, n_rows, n_cols)
    g = g_ref[:]
    # g @ Wᵀ: contract the output (N) axis
    gw = jax.lax.dot_general(
        g, w_ref[:].astype(g.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    o_ref[:] = jnp.where(mask, gw * inv_keep, 0).astype(o_ref.dtype)


def _common(x, rate):
    n, k = x.shape
    # mask block geometry — MUST be identical in forward and backward
    # kernels, and IS identical to the standalone dropout kernel's
    # (pallas_dropout.mask_block_geometry): the fused and unfused paths
    # generate bit-identical masks from the same seed, so flipping
    # fuse_dropout_matmul never changes a training trajectory (tuned seeds
    # keep their accuracy). Bonus: ~4× fewer grid steps than the old fixed
    # 256×512 blocks (the step overhead was the measured slowdown).
    from parallel_gcn_tpu.ops.pallas_dropout import mask_block_geometry

    bm, bk = mask_block_geometry(n, k)
    grid_i = pl.cdiv(n, bm)
    grid_j = pl.cdiv(k, bk)
    keep = 1.0 - rate
    threshold = min(int(round(keep * 2.0**32)), 2**32 - 1)
    return n, k, bm, bk, grid_i, grid_j, threshold, 1.0 / keep


def _prec(highest: bool):
    return jax.lax.Precision.HIGHEST if highest else None


def _run_fwd(x, w, seed, rate, highest=False):
    n, k, bm, bk, gi, gj, threshold, inv_keep = _common(x, rate)
    nout = w.shape[1]
    kernel = functools.partial(
        _fwd_kernel, threshold=threshold, inv_keep=inv_keep, nj=gj,
        n_rows=n, n_cols=k, precision=_prec(highest),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(gi, gj),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, s: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bk, nout), lambda i, j, s: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, nout), lambda i, j, s: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n, nout), jnp.float32),
        interpret=_INTERPRET[0],
    )(seed.reshape(1).astype(jnp.int32), x, w)


def _run_dw(x, g, seed, rate, highest=False):
    n, k, bm, bk, gi, gj, threshold, inv_keep = _common(x, rate)
    nout = g.shape[1]
    kernel = functools.partial(
        _dw_kernel, threshold=threshold, inv_keep=inv_keep, nj=gj,
        n_rows=n, n_cols=k, precision=_prec(highest),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(gj, gi),  # dW block outer, row blocks inner (revisiting)
            in_specs=[
                pl.BlockSpec((bm, bk), lambda j, i, s: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, nout), lambda j, i, s: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bk, nout), lambda j, i, s: (j, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((k, nout), jnp.float32),
        interpret=_INTERPRET[0],
    )(seed.reshape(1).astype(jnp.int32), x, g)


def _run_dx(g, w, seed, rate, n, k, x_dtype, highest=False):
    _, _, bm, bk, gi, gj, threshold, inv_keep = _common(
        jax.ShapeDtypeStruct((n, k), x_dtype), rate
    )
    nout = w.shape[1]
    kernel = functools.partial(
        _dx_kernel, threshold=threshold, inv_keep=inv_keep, nj=gj,
        n_rows=n, n_cols=k, precision=_prec(highest),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(gi, gj),
            in_specs=[
                pl.BlockSpec((bm, nout), lambda i, j, s: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bk, nout), lambda i, j, s: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bk), lambda i, j, s: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n, k), x_dtype),
        interpret=_INTERPRET[0],
    )(seed.reshape(1).astype(jnp.int32), g, w)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def dropout_matmul(x, w, seed, rate: float, highest: bool = False,
                   need_dx: bool = True):
    """``(inverted_dropout(x, rate) @ w)`` with the mask generated in-kernel.

    x: [N, K]; w: [K, M]; seed: int32 scalar array; rate: static in (0, 1);
    ``highest`` forces true-f32 MXU passes (parity mode). ``need_dx=False``
    skips the dX backward kernel and returns a zero cotangent — the
    first-layer call sites never differentiate w.r.t. the input (the
    reference's SparseMatmul likewise has a weight-grad-only backward,
    src/module.cu:136-152), and an unused N×K kernel output is not reliably
    dead-code-eliminated through a pallas_call.
    Returns float32 [N, M]. Rate 0 callers should use a plain matmul.
    """
    return _run_fwd(x, w, seed, rate, highest)


def _vjp_fwd(x, w, seed, rate, highest, need_dx):
    return _run_fwd(x, w, seed, rate, highest), (x, w, seed)


def _vjp_bwd(rate, highest, need_dx, res, g):
    x, w, seed = res
    g = g.astype(jnp.float32)
    dw = _run_dw(x, g, seed, rate, highest).astype(w.dtype)
    dx = (
        _run_dx(g, w, seed, rate, x.shape[0], x.shape[1], x.dtype, highest)
        if need_dx else jnp.zeros(x.shape, x.dtype)
    )
    return dx, dw, None


dropout_matmul.defvjp(_vjp_fwd, _vjp_bwd)
