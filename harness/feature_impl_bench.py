"""Dense vs sparse input-layer chain on the real chip — the SparseMatmul question.

The cora/citeseer per-op floors (PERFORMANCE.md) show the epoch dominated by
HBM traffic over the DENSE feature matrix: the input-dropout write of X', the
X'@W0 forward read, and the dW0 = X'^T@g backward read — yet the real
citation feature matrices are ~1% dense (cora 49K nnz of 3.9M cells,
citeseer 105K of 12.3M), and the reference keeps X sparse for exactly this
reason (SparseMatmul, src/module.cu:101-163). This bench measures the
TPU-native sparse alternative end-to-end at training semantics:

  dense  chain: X' = pallas_dropout(X) ; Y = X'@W ; dW = X'^T @ g
  sparse chain: v' = vals * bernoulli(key)/keep        (mask over nnz only —
                  dropout on zero entries is a no-op, so the distribution is
                  identical to dense dropout)
                Y  = segment_sum(v'[:,None] * W[cols], rows)
                dW = autograd (gather-transpose scatter over cols)

plus ablations that price each indexed stage, and an E-minor variant (per-nnz
data in the lane dim, CLAUDE.md's layout rule for per-edge tensors).

MEASURED (v5e, 2026-08-20, output/feature_impl_{cora,citeseer}.txt): the
sparse chain loses 5-6x at citation scale — citeseer 1121 vs 175 us/step,
cora 581 vs 108 — and BOTH layouts (naive [nnz, H] and E-minor [H, nnz])
land on the same floor, because the binding term is the per-index cost of
the indexed stages: the segment_sum scatter-add prices at ~8-9 ns/index
(abl-fwd-segsum minus abl-gather ≈ 880 us / 105K nnz) and even the fused
gather+mul at ~2-3 ns/index, so 105K nnz x several passes ≈ 1 ms against
the dense chain's ~175 us of MXU+HBM streams. The MXU does all 12.3M dense
cells inside a ~31 us pass (~0.003 ns/cell): index-chasing carries a
>1000x per-element penalty, so sparse SpMM on this chip pays only below
~0.1% density — citation features at 0.85-1.3% are ~10x too dense. Dense
is the right TPU design for every dataset the reference ships; the sparse
path in ops/sparse_matmul.py stays what it is — a memory-constrained
escape hatch and a parity oracle, not a performance path.

Usage: python harness/feature_impl_bench.py [cora citeseer] [--steps K]
Writes output/feature_impl_<dataset>.txt
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONFIGS = {
    # dataset: (hidden, input_dropout, compute_dtype, binarize)
    "cora": (72, 0.4, "float32", True),
    "citeseer": (16, 0.6, "bfloat16", False),
}


def bench(name: str, steps: int, reps: int) -> None:
    import jax
    import jax.numpy as jnp

    from parallel_gcn_tpu.data.parser import load_dataset
    from parallel_gcn_tpu.ops.pallas_dropout import dropout_pallas, key_to_seed
    from parallel_gcn_tpu.ops.sparse_matmul import feature_transform

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    hidden, p, cdtype, binarize = CONFIGS[name]
    ds = load_dataset(name, binarize_features=binarize)
    fc = ds.feature_csr
    dtype = jnp.dtype(cdtype)
    n, f = fc.n_rows, fc.n_cols
    nnz = fc.nnz

    rng = np.random.default_rng(0)
    w0 = jnp.asarray(rng.normal(0, 0.05, (f, hidden)).astype(np.float32))
    g_dev = jnp.asarray(rng.normal(0, 1.0, (n, hidden)).astype(np.float32))
    x_dense = jnp.asarray(fc.to_dense(), dtype=dtype)
    rows = jnp.asarray(fc.row_ids())
    cols = jnp.asarray(fc.indices.astype(np.int32))
    vals = jnp.asarray(fc.values.astype(np.float32))
    keep = 1.0 - p

    def dense_chain(w, payload, gg, key):
        x = payload

        def loss_fn(w):
            xp = dropout_pallas(x, key_to_seed(key), p)
            y = feature_transform(xp, w, precision=None, out_dtype=dtype)
            return jnp.sum(y.astype(jnp.float32) * gg)

        return jax.grad(loss_fn)(w)

    def sparse_chain(w, payload, gg, key):
        r, c, v = payload

        def loss_fn(w):
            mask = jax.random.bernoulli(key, keep, (v.shape[0],))
            vp = jnp.where(mask, v / keep, 0.0)
            gathered = vp[:, None] * w[c]  # f32 accumulate like the MXU
            y = jax.ops.segment_sum(
                gathered, r, num_segments=n, indices_are_sorted=True
            )
            return jnp.sum(y * gg)

        return jax.grad(loss_fn)(w)

    def sparse_chain_eminor(w, payload, gg, key):
        # per-nnz tensors in the LANE dim (no [nnz, H]->[nnz, 128] padding)
        r, c, v = payload

        def loss_fn(w):
            mask = jax.random.bernoulli(key, keep, (v.shape[0],))
            vp = jnp.where(mask, v / keep, 0.0)
            gath = w.T[:, c] * vp[None, :]  # [H, nnz]
            out_t = jnp.zeros((hidden, n), jnp.float32).at[:, r].add(gath)
            return jnp.sum(out_t * gg.T)

        return jax.grad(loss_fn)(w)

    # ablations pricing each indexed stage of the sparse chain
    def abl_mask(w, payload, gg, key):
        r, c, v = payload
        mask = jax.random.bernoulli(key, keep, (v.shape[0],))
        return w + jnp.sum(jnp.where(mask, v / keep, 0.0)) * 1e-12

    def abl_gather(w, payload, gg, key):
        r, c, v = payload
        return w + jnp.sum(v[:, None] * w[c]) * 1e-12

    def abl_fwd(w, payload, gg, key):
        r, c, v = payload
        y = jax.ops.segment_sum(
            v[:, None] * w[c], r, num_segments=n, indices_are_sorted=True
        )
        return w + jnp.sum(y * gg) * 1e-12

    def abl_dw(w, payload, gg, key):
        r, c, v = payload
        return w - 1e-6 * jax.ops.segment_sum(
            v[:, None] * gg[r], c, num_segments=f
        )

    def make_run(step):
        def run(w, payload, gg, key0):
            def body(carry, i):
                w, key = carry
                key = jax.random.fold_in(key, i)
                dw = step(w, payload, gg, key)
                w = w - 1e-6 * dw if dw.shape == w.shape else dw
                return (w, key), ()

            (w, _), _ = jax.lax.scan(
                body, (w, key0), jnp.arange(steps), length=steps
            )
            return w

        return jax.jit(run)

    variants = [
        ("dense-chain", dense_chain, x_dense),
        ("sparse-chain", sparse_chain, (rows, cols, vals)),
        ("sparse-eminor", sparse_chain_eminor, (rows, cols, vals)),
        ("abl-mask", abl_mask, (rows, cols, vals)),
        ("abl-gather", abl_gather, (rows, cols, vals)),
        ("abl-fwd-segsum", abl_fwd, (rows, cols, vals)),
        ("abl-dw-scatter", abl_dw, (rows, cols, vals)),
    ]
    lines = []
    for label, step, payload in variants:
        run = make_run(step)
        key0 = jax.random.PRNGKey(7)
        np.asarray(run(w0, payload, g_dev, key0))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(run(w0, payload, g_dev, key0))
            best = min(best, (time.perf_counter() - t0) / steps)
        line = (
            f"{name} {label} us_per_step={best * 1e6:.2f} nnz={nnz} "
            f"cells={n * f} H={hidden} p={p} dtype={cdtype}"
        )
        lines.append(line)
        print(line, flush=True)
    import jax as _jax

    dev = _jax.devices()[0]
    out_path = os.path.join(REPO, "output", f"feature_impl_{name}.txt")
    with open(out_path, "w") as fh:
        fh.write(f"# device={dev.platform}/{dev.device_kind} steps={steps}\n")
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out_path}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("datasets", nargs="*", default=None)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    for name in args.datasets or ["cora", "citeseer"]:
        bench(name, args.steps, args.reps)


if __name__ == "__main__":
    main()
