from .math import lower_bound, ste_round
from .mask_pyramid import mask_pyramid
from .morphology import constraint_rgb, constraint_mask
from .window import (
    window_partition,
    window_reverse,
    swin_attention_bias,
    window_alive,
)
