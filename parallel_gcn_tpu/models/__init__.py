from parallel_gcn_tpu.models.gcn import GCNModel, init_params

__all__ = ["GCNModel", "init_params"]
