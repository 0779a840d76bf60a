"""Fused masked softmax cross-entropy with accuracy.

Reference: the fused kernel src/module.cu:484-524 computes, per labeled node,
max-subtracted logits, log-sum-exp loss, and (when training) the softmax
gradient in one pass; accuracy re-uses the max-subtraction ("truth logit == row
max ⇒ correct", src/gcn.cu:264-289); finalize divides by the split's sample
count and adds wd·||W0||²/2 (src/gcn.cu:440-455).

Here the same fusion is expressed as one differentiable function — XLA fuses
the elementwise chain, and autograd of this exact expression reproduces the
reference's hand-written gradient ``(prob − onehot)·mask / num_samples``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Opt-in switch for the lane-packed CE path — MEASURED NEGATIVE on v5e at
# BOTH scales (synth-pubmed epoch 644 → 757 µs; synth-reddit 17.6 →
# 33.2 ms): the boundary relayouts across the lane dimension lower as
# transposes that cost more than the padded-stream HBM traffic they
# remove, and at C=41 the g=64 group still wastes 36% of each lane row.
# Kept in-tree with the same status as ops/pallas_ce.py (the first CE
# experiment that lost): the packed and plain paths compute the identical
# expression (grads bit-exact, loss sums differ only in reduction order),
# so the harness can re-test on future hardware/compilers where relayouts
# get cheaper.
_PACKED = [False]

# Large-negative pad for unused class lanes: exp(pad − max) underflows to
# exactly 0 and max/argmax never select it, so padded lanes are inert.
_PAD_NEG = -3.0e38


def _packed_group(n_classes: int) -> int:
    """Lane-group width for the packed CE: the smallest divisor of 128 that
    holds C classes. None when C > 64 (a full 128-lane row per node — the
    plain layout is already dense)."""
    for g in (8, 16, 32, 64):
        if n_classes <= g:
            return g
    return 0


def masked_softmax_xent_sums(
    logits: jnp.ndarray,  # [N, C] float
    labels: jnp.ndarray,  # [N] int32, -1 (or anything) on unlabeled rows
    mask: jnp.ndarray,  # [N] bool — nodes of the current split
):
    """Local (loss_sum, correct_count) over the masked rows — the shared core
    of the single-chip CE and the multi-chip psum'd CE (one source of truth
    for the numerically-sensitive expression).

    TPU layout note: a [N, C] f32 array is physically (8, 128)-tiled, so at
    C=3 (pubmed) every elementwise op in the CE chain streams 42× its
    logical bytes through HBM (measured: the softmax/metric fusions were
    ~130 µs of a 644 µs synth-pubmed epoch). The packed path reshapes the
    node dim into the padding lanes (groups of g = next divisor of 128 ≥ C
    classes per node, 128/g nodes per lane row), pays two boundary
    relayouts, and runs the whole chain on a g/128-dense array. The
    expression is identical: pad lanes hold −3e38, whose exp underflows to
    exactly 0 and which max/argmax never select."""
    logits = logits.astype(jnp.float32)
    g = _packed_group(logits.shape[-1])
    if _PACKED[0] and g:
        return _masked_softmax_xent_sums_packed(logits, labels, mask, g)
    lmax = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    shifted = logits - lmax
    lse = jnp.log(jnp.sum(jnp.exp(shifted), axis=-1))
    safe_labels = jnp.clip(labels, 0, logits.shape[-1] - 1)
    # truth logit via one-hot multiply-reduce, NOT take_along_axis: XLA lowers
    # the row gather to ~15 ns/row on TPU (it was the 2nd-largest op in the
    # reddit epoch at 3.5 ms); the streamed select+reduce over [N, C] costs
    # bandwidth only (~0.05 ms). Numerically identical (selects one element).
    class_ids = jax.lax.broadcasted_iota(jnp.int32, shifted.shape, 1)
    onehot = class_ids == safe_labels[:, None]
    truth = jnp.sum(jnp.where(onehot, shifted, 0.0), axis=-1)

    maskf = mask.astype(jnp.float32)
    loss_sum = jnp.sum(maskf * (lse - truth))
    # Accuracy: prediction = argmax, correct iff it equals the label. The
    # reference instead tests truth_logit - max >= 0 on its STORED logits
    # (src/gcn.cu:271-278) — that exact-cancellation trick is unsound under
    # XLA, which may duplicate the logits computation into the max-reduce and
    # the subtract with different fusion/rounding (observed on the sharded
    # int8 path: truth - max = -2e-9 on correctly-classified rows, and
    # lax.optimization_barrier does NOT prevent the duplication). argmax is a
    # single reduction over ONE evaluation of the row, and the == label test
    # is integer — immune to recomputation noise. Semantics differ from the
    # reference only on EXACT logit ties (argmax takes the first max; the
    # reference counts any tied truth as correct), which do not occur with
    # trained float logits.
    pred = jnp.argmax(jax.lax.stop_gradient(logits), axis=-1)
    correct = jnp.sum(maskf * (pred == safe_labels))
    return loss_sum, correct


def _masked_softmax_xent_sums_packed(
    logits: jnp.ndarray,  # [N, C] float32
    labels: jnp.ndarray,  # [N] int32
    mask: jnp.ndarray,  # [N] bool
    g: int,  # lane-group width (divides 128, ≥ C)
):
    """The packed-layout evaluation of masked_softmax_xent_sums — same math,
    node dim folded into the padding lanes (see the caller's docstring)."""
    n, c = logits.shape
    rows_per_lane_row = 128 // g
    n_pad = -(-n // rows_per_lane_row) * rows_per_lane_row
    safe_labels = jnp.clip(labels, 0, c - 1)
    # boundary relayout 1: [N, C] (lane-padded) -> [N_pad*g/128, 128] dense.
    # Row-pad with the inert value; mask pads are False so they contribute 0.
    packed = jnp.pad(
        logits, ((0, n_pad - n), (0, g - c)), constant_values=_PAD_NEG
    ).reshape(n_pad // rows_per_lane_row, rows_per_lane_row, g)
    lab3 = jnp.pad(safe_labels, (0, n_pad - n)).reshape(
        n_pad // rows_per_lane_row, rows_per_lane_row
    )
    maskf = jnp.pad(mask.astype(jnp.float32), (0, n_pad - n)).reshape(
        n_pad // rows_per_lane_row, rows_per_lane_row
    )
    lmax = jax.lax.stop_gradient(jnp.max(packed, axis=-1, keepdims=True))
    shifted = packed - lmax
    lse = jnp.log(jnp.sum(jnp.exp(shifted), axis=-1))
    class_ids = jax.lax.broadcasted_iota(jnp.int32, shifted.shape, 2)
    truth = jnp.sum(
        jnp.where(class_ids == lab3[..., None], shifted, 0.0), axis=-1
    )
    loss_sum = jnp.sum(maskf * (lse - truth))
    pred = jnp.argmax(jax.lax.stop_gradient(packed), axis=-1)
    correct = jnp.sum(maskf * (pred == lab3))
    return loss_sum, correct


def masked_softmax_xent(
    logits: jnp.ndarray,  # [N, C] float
    labels: jnp.ndarray,  # [N] int32, -1 (or anything) on unlabeled rows
    mask: jnp.ndarray,  # [N] bool — nodes of the current split
    num_samples: jnp.ndarray | int,  # scalar: size of the split
):
    """Returns (mean_ce_loss, accuracy) over the masked nodes.

    ``num_samples`` is passed separately (rather than ``mask.sum()``) to mirror
    the reference's per-split sample counts (src/module.cu:552-562) and to keep
    it a compile-time-friendly scalar under jit.
    """
    loss_sum, correct = masked_softmax_xent_sums(logits, labels, mask)
    denom = jnp.asarray(num_samples, dtype=jnp.float32)
    return loss_sum / denom, correct / denom


def l2_penalty(w: jnp.ndarray) -> jnp.ndarray:
    """Σw² (reference: get_l2_penalty warp-reduce, src/gcn.cu:230-260)."""
    w = w.astype(jnp.float32)
    return jnp.sum(w * w)
