from .mesh import make_mesh
from .spatial import build_tiled_stylize_fn, conv3x3_halo, feature_stats_psum
