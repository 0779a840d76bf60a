from parallel_gcn_tpu.models.gat import GATModel, init_gat_params
from parallel_gcn_tpu.models.gcn import GCNModel, init_params

__all__ = ["GATModel", "GCNModel", "init_gat_params", "init_params"]
