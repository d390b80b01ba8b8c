from .checkpoint import load_checkpoint, save_checkpoint
from .image import load_image_array, save_image, save_image_grid
from .logging import Experiment, LogPrinter, LossMeter, Throughput, git_code_id, resolve_path
