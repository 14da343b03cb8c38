from .bits import encode_bits, decode_bits, encode_bits_np, decode_bits_np
from .grid_sample import grid_sample, point_sample
from .uncertainty import (
    get_uncertain_point_coords,
    uncertainty_sigmoid,
    uncertainty_top2,
)
from .color import color_map, colorize_panoptic_np
from .panoptic import panoptic_post_process

__all__ = [
    "encode_bits",
    "decode_bits",
    "encode_bits_np",
    "decode_bits_np",
    "grid_sample",
    "point_sample",
    "get_uncertain_point_coords",
    "uncertainty_sigmoid",
    "uncertainty_top2",
    "color_map",
    "colorize_panoptic_np",
    "panoptic_post_process",
]
