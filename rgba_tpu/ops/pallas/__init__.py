from .win_attn import fused_window_attention
