from .conv import (
    conv1x1, conv2d, conv3x3, max_pool_2x2, max_pool_2x2_with_argmax,
    max_unpool_2x2, reflect_pad, upsample_nearest_2x,
)
from .wct_transform import (
    coloring_matrix, feature_stats, matrix_isqrt_sqrt_eigh,
    matrix_isqrt_sqrt_newton, wct_transform,
)
