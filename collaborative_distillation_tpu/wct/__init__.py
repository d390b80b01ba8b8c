from .engine import WCTEngine, stylize_cascade_fn
from .slab import SlabCascade, receptive_radius
