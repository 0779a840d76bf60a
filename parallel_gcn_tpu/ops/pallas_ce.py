"""Fused masked softmax cross-entropy Pallas kernel.

The direct TPU analog of the reference's fused CE kernel
(src/module.cu:484-524): ONE pass over the logits computes, per labeled row,
the max-subtracted log-sum-exp loss, the accuracy count (truth logit == row
max after max-subtraction, src/gcn.cu:264-289), and — when training — the
softmax gradient ``(prob − onehot)·mask / num_samples`` written alongside,
exactly like the reference writes the gradient from the loss kernel
(src/module.cu:516-521). The backward is then a scalar rescale of that saved
gradient.

The XLA expression in ops/loss.py stays the reference/golden path (exact,
differentiable, any backend); this kernel exists because at reddit scale the
unfused chain costs ~8 separate [N, C]-sized passes per epoch (~2.9 ms of a
19 ms epoch) where one read + one grad write suffice.

Each grid step reduces its row block to per-block partials (one [1, 128] lane
vector: lane 0 = loss sum, lane 1 = correct count); the tiny [G, 128] partial
array is summed outside the kernel — no cross-step accumulation ordering.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# row-block per grid step; the [512, C] f32 block is small in VMEM and well
# over the DMA efficiency floor
_BLOCK_ROWS = 512
_LANES = 128

# module-level switch so CPU tests can run the kernel in TPU-interpret mode
# (same convention as ops/pallas_bcsr.py)
_INTERPRET = [False]


def _ce_body(logits_ref, labels_ref, mask_ref):
    # everything stays 2-D ([B, C] or [B, 1]) — Mosaic's 1-D vector
    # reductions/layouts are partial ("Offset change" lowering errors)
    logits = logits_ref[:].astype(jnp.float32)  # [B, C]
    labels = labels_ref[:]  # [B, 1] int32
    maskf = mask_ref[:].astype(jnp.float32)  # [B, 1]

    lmax = jnp.max(logits, axis=-1, keepdims=True)
    shifted = logits - lmax
    ex = jnp.exp(shifted)
    sumexp = jnp.sum(ex, axis=-1, keepdims=True)  # [B, 1]
    lse = jnp.log(sumexp)  # [B, 1]

    c = logits.shape[-1]
    safe = jnp.clip(labels, 0, c - 1)
    onehot = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) == safe
    truth = jnp.sum(jnp.where(onehot, shifted, 0.0), axis=-1, keepdims=True)

    loss_part = jnp.sum(maskf * (lse - truth))
    acc_part = jnp.sum(maskf * (truth >= 0.0).astype(jnp.float32))
    # (8, 128) partial block — Mosaic needs sublane multiples of 8; only
    # [0, 0] (loss) and [0, 1] (correct count) are nonzero
    row = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 1)
    partial_row = jnp.where(
        (row == 0) & (lane == 0),
        loss_part,
        jnp.where((row == 0) & (lane == 1), acc_part, 0.0),
    )
    return partial_row, ex, sumexp, onehot, maskf


def _ce_kernel_eval(logits_ref, labels_ref, mask_ref, part_ref):
    part_ref[:], *_ = _ce_body(logits_ref, labels_ref, mask_ref)


def _ce_kernel_train(logits_ref, labels_ref, mask_ref, part_ref, grad_ref, *,
                     inv_num):
    partial_row, ex, sumexp, onehot, maskf = _ce_body(
        logits_ref, labels_ref, mask_ref
    )
    part_ref[:] = partial_row
    grad = (ex / sumexp - onehot.astype(jnp.float32)) * (maskf * inv_num)
    grad_ref[:] = grad.astype(grad_ref.dtype)


def _ce_call(logits, labels, mask, num_samples, write_grad):
    n0, c = logits.shape
    # pad to a whole number of row blocks with mask=0 rows: Pallas edge-block
    # loads are not guaranteed zero-filled, and a garbage mask bit would leak
    # a garbage row into the loss. No-op (XLA elides) when already aligned.
    n = ((n0 + _BLOCK_ROWS - 1) // _BLOCK_ROWS) * _BLOCK_ROWS
    if n != n0:
        logits = jnp.pad(logits, ((0, n - n0), (0, 0)))
        labels = jnp.pad(labels, (0, n - n0))
        mask = jnp.pad(mask, (0, n - n0))
    grid = (n // _BLOCK_ROWS,)
    labels2 = labels.reshape(n, 1)
    mask2 = mask.reshape(n, 1).astype(jnp.int32)

    in_specs = [
        pl.BlockSpec((_BLOCK_ROWS, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((_BLOCK_ROWS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((_BLOCK_ROWS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    part_shape = jax.ShapeDtypeStruct((grid[0] * 8, _LANES), jnp.float32)
    part_spec = pl.BlockSpec((8, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)

    if not write_grad:
        parts = pl.pallas_call(
            _ce_kernel_eval,
            grid=grid,
            in_specs=in_specs,
            out_specs=part_spec,
            out_shape=part_shape,
            interpret=_INTERPRET[0],
        )(logits, labels2, mask2)
        return parts, None

    parts, grad = pl.pallas_call(
        partial(_ce_kernel_train, inv_num=1.0 / float(num_samples)),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            part_spec,
            pl.BlockSpec((_BLOCK_ROWS, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[part_shape, jax.ShapeDtypeStruct((n, c), jnp.float32)],
        interpret=_INTERPRET[0],
    )(logits, labels2, mask2)
    return parts, (grad if n == n0 else grad[:n0])


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def masked_softmax_xent_fused(logits, labels, mask, num_samples):
    """Fused (mean CE loss, accuracy) over the masked rows — drop-in for
    ops.loss.masked_softmax_xent on TPU. Accuracy uses the truth == row-max
    test — safe HERE because the kernel reads one VMEM materialization of the
    block (unlike the XLA graph, where recomputation makes the trick unsound;
    see ops.loss). Differs from the XLA path's argmax only on exact logit
    ties. Padded rows must carry mask=False (split
    padding is 0). ``num_samples`` is a static Python int (per-split count)."""
    parts, _ = _ce_call(logits, labels, mask, num_samples, write_grad=False)
    denom = jnp.float32(num_samples)
    return parts[:, 0].sum() / denom, parts[:, 1].sum() / denom


def _fused_fwd(logits, labels, mask, num_samples):
    parts, grad = _ce_call(logits, labels, mask, num_samples, write_grad=True)
    denom = jnp.float32(num_samples)
    return (parts[:, 0].sum() / denom, parts[:, 1].sum() / denom), grad


def _fused_bwd(num_samples, grad, g):
    g_loss, _ = g  # accuracy gets a zero cotangent (not differentiable)
    return (grad * g_loss, None, None)


masked_softmax_xent_fused.defvjp(_fused_fwd, _fused_bwd)
