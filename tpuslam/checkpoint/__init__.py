from tpuslam.checkpoint.io import latest_checkpoint, load_checkpoint, save_checkpoint
from tpuslam.checkpoint.torch_import import import_reference_checkpoint

__all__ = [
    "import_reference_checkpoint",
    "latest_checkpoint",
    "load_checkpoint",
    "save_checkpoint",
]
