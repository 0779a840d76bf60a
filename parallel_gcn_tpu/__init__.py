"""parallel_gcn_tpu — a TPU-native framework for training Graph Convolutional Networks.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference CUDA
framework davide-gurrieri/parallel-GCN (surveyed in SURVEY.md):

- data layer: `.graph/.svmlight/.split` readers, CSR with implicit self-loops,
  symmetric-normalized adjacency precompute (reference: src/parser.cpp).
- ops: neighborhood aggregation ``graphsum`` (Â·X) with a symmetric-Â custom VJP,
  sparse/dense feature transform, inverted dropout, fused masked softmax
  cross-entropy with loss + accuracy (reference: src/module.cu).
- models: N-layer GCN with per-layer dropout, selective L2 decay on the first
  weight only (reference: src/gcn.cu).
- optim: Adam with bias-corrected step size matching the reference math
  (reference: src/optim.cu).
- parallel: node-partitioned multi-chip aggregation over a `jax.sharding.Mesh`
  (the TPU-native analog of the reference's single-GPU stream overlap).

The compute path is pure-functional JAX: the reference's manual CUDA streams and
events (src/smart_object.cu, src/gcn.cu:5-11) are replaced by XLA's async
dispatch; its in-place dropout / set_input restore dance (src/gcn.cu:181-200)
vanishes under functional purity.
"""

__version__ = "0.1.0"

from parallel_gcn_tpu.config import AdamConfig, Config, GCNConfig, load_config
from parallel_gcn_tpu.data.graph import Graph
from parallel_gcn_tpu.data.parser import load_dataset

__all__ = [
    "AdamConfig",
    "Config",
    "GCNConfig",
    "Graph",
    "load_config",
    "load_dataset",
    "__version__",
]
