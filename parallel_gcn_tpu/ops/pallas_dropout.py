"""Hand-written Pallas dropout kernel using the TPU hardware PRNG.

The reference implements dropout as a hand-written CUDA kernel over a Philox
state pool (src/module.cu:16-63, 4 uniforms per thread). The XLA default
(threefry bits + mask) costs ~100 µs/epoch on cora's 2708×1433 input — the
single largest fusion in the compiled epoch. This kernel replaces it with
`pltpu.prng_random_bits` (the on-core hardware PRNG), generating the keep mask
in VMEM right next to the data.

Backward: inverted dropout's VJP is the same masking applied to the cotangent
(reference: src/module.cu:80-99). The mask is never materialized to HBM — the
backward kernel re-seeds the PRNG with the same per-block seed and regenerates
identical bits (the same trick the reference uses by re-walking the Philox
stream).
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_ROWS = 512


def _dropout_kernel(seed_ref, x_ref, o_ref, *, threshold: int, inv_keep: float):
    # distinct stream per grid block: fold the flat block id into the seed
    block_id = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    pltpu.prng_seed(seed_ref[0] + block_id)
    bits = pltpu.prng_random_bits(x_ref.shape)
    keep = bits.astype(jnp.uint32) < jnp.uint32(threshold)
    x = x_ref[:]
    o_ref[:] = jnp.where(keep, x * jnp.asarray(inv_keep, x.dtype), 0)


# per-buffer VMEM budget in elements (x block + out block + bits must fit in
# ~16 MB VMEM with double buffering)
_BLOCK_ELEMS = 512 * 1024
_MAX_FEAT_TILE = 2048


def mask_block_geometry(n: int, f: int) -> tuple[int, int]:
    """The (rows, cols) mask-block geometry for an [n, f] operand — ONE
    function shared by this kernel and the fused dropout⊗matmul
    (ops.pallas_fused), so both generate bit-identical keep masks from the
    same seed: swapping between them preserves training trajectories."""
    f_tile = min(f, _MAX_FEAT_TILE)
    rows = max(8, min(_BLOCK_ROWS, _BLOCK_ELEMS // f_tile))
    rows = max(8, rows // 8 * 8)  # sublane-aligned block rows
    rows = min(rows, n)
    return rows, f_tile


def _run_kernel(x, seed, rate: float, interpret: bool):
    keep = 1.0 - rate
    # uint32 threshold: P(bits < threshold) = keep
    threshold = min(int(round(keep * 2.0**32)), 2**32 - 1)
    n, f = x.shape
    rows, f_tile = mask_block_geometry(n, f)
    grid = (pl.cdiv(n, rows), pl.cdiv(f, f_tile))
    kernel = functools.partial(
        _dropout_kernel, threshold=threshold, inv_keep=1.0 / keep
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (rows, f_tile),
                    lambda i, j, seed_ref: (i, j),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (rows, f_tile),
                lambda i, j, seed_ref: (i, j),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(seed.reshape(1).astype(jnp.int32), x)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def dropout_pallas(x, seed, rate: float, interpret: bool = False):
    """Inverted dropout via the TPU hardware PRNG.

    x: [N, F]; seed: int32 scalar array (derive from a jax PRNG key);
    rate: static drop probability in [0, 1).
    """
    return _run_kernel(x, seed, rate, interpret)


def _fwd(x, seed, rate, interpret):
    return _run_kernel(x, seed, rate, interpret), seed


def _bwd(rate, interpret, seed, g):
    # identical bits → identical mask; apply to the cotangent
    return _run_kernel(g, seed, rate, interpret), None


dropout_pallas.defvjp(_fwd, _bwd)


def key_to_seed(key: jax.Array) -> jax.Array:
    """Cheap int32 seed from a threefry key (no RNG invocation)."""
    data = jax.random.key_data(key)
    return (data[-1] & 0x7FFFFFFF).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Fused ReLU → dropout
# ---------------------------------------------------------------------------
# Every inner GCN layer ends `… → Â·(·) → ReLU` and the next layer starts
# with dropout (reference: src/gcn.cu:47-142) — so at training time the pair
# ReLU→dropout always runs back-to-back on a full [N, H] activation. Fusing
# the ReLU into the dropout kernel is trajectory-IDENTICAL to the unfused
# pair (mask ∈ {0, 1/keep} is nonnegative, so mask·max(z,0) ≡ max(mask·z,0);
# the kernel reuses _dropout_kernel's exact seeding and block geometry, hence
# the exact bits) and pays twice:
#
#   * forward: the separate ReLU pass over [N, H] (a read+write that XLA
#     cannot fuse into the Pallas dropout call — a custom call is a fusion
#     boundary) disappears; max(z, 0) rides the VPU inside the kernel.
#   * backward: d/dz [mask·relu(z)] = mask·1[z>0] = 1[out>0]/keep — the
#     saved OUTPUT alone reconstructs the combined mask (out > 0 iff the
#     element was kept AND positive), so the backward needs neither the
#     Philox re-walk kernel nor a separate ReLU-backward pass: it is one
#     plain-XLA elementwise (g · 1[out>0] · 1/keep) that fuses into its
#     neighbors. `out` is free to save — autograd already keeps it as the
#     residual for the following matmul's weight gradient.


def _relu_dropout_kernel(seed_ref, x_ref, o_ref, *, threshold: int, inv_keep: float):
    # identical seeding/bit-walk to _dropout_kernel: same seed → same mask
    block_id = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    pltpu.prng_seed(seed_ref[0] + block_id)
    bits = pltpu.prng_random_bits(x_ref.shape)
    keep = bits.astype(jnp.uint32) < jnp.uint32(threshold)
    x = x_ref[:]
    x = jnp.maximum(x, jnp.asarray(0, x.dtype))
    o_ref[:] = jnp.where(keep, x * jnp.asarray(inv_keep, x.dtype), 0)


def _run_relu_kernel(x, seed, rate: float, interpret):
    keep = 1.0 - rate
    threshold = min(int(round(keep * 2.0**32)), 2**32 - 1)
    n, f = x.shape
    rows, f_tile = mask_block_geometry(n, f)
    grid = (pl.cdiv(n, rows), pl.cdiv(f, f_tile))
    kernel = functools.partial(
        _relu_dropout_kernel, threshold=threshold, inv_keep=1.0 / keep
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (rows, f_tile),
                    lambda i, j, seed_ref: (i, j),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (rows, f_tile),
                lambda i, j, seed_ref: (i, j),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(seed.reshape(1).astype(jnp.int32), x)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def relu_dropout_pallas(x, seed, rate: float, interpret: bool = False):
    """``dropout(relu(x))`` in one kernel pass, bit-identical in distribution
    AND trajectory to ``dropout_pallas(relu(x), seed, rate)``."""
    return _run_relu_kernel(x, seed, rate, interpret)


def _relu_fwd(x, seed, rate, interpret):
    out = _run_relu_kernel(x, seed, rate, interpret)
    return out, out


def _relu_bwd(rate, interpret, out, g):
    # kept-and-positive mask recovered from the saved output; fusible XLA
    # elementwise — no PRNG re-walk, no separate ReLU backward pass
    inv_keep = jnp.asarray(1.0 / (1.0 - rate), g.dtype)
    return (jnp.where(out > 0, g * inv_keep, jnp.asarray(0, g.dtype)), None)


relu_dropout_pallas.defvjp(_relu_fwd, _relu_bwd)
