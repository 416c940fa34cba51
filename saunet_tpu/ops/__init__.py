from .resize import resize_bilinear, resize_nearest
from .edge import canny_edges, image_to_gray255
from .pooling import adaptive_pool2d, pooling_factor
from .filters import (
    conv2d_same,
    conv_tri,
    gradient_central_diff,
    gradient_magnitude_and_normal,
)
