from .bottleneck import EntropyBottleneck
from .gaussian import GaussianConditional, get_scale_table
from .cdf import pmf_to_quantized_cdf
