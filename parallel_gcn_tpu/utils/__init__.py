from parallel_gcn_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from parallel_gcn_tpu.utils.timer import Timer

__all__ = ["Timer", "load_checkpoint", "save_checkpoint"]
