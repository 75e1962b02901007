from .attention import multi_head_attention
from .pnp import inject_source_rows, injection_step_mask
from .rotary import apply_rotary, rotary_angles, rotary_freqs, rotate_queries_or_keys
from .relpos import relative_position_bias, relative_position_bucket
from .freeinit import FILTERS, freq_mix_3d

__all__ = [
    "FILTERS",
    "apply_rotary",
    "freq_mix_3d",
    "inject_source_rows",
    "injection_step_mask",
    "multi_head_attention",
    "relative_position_bias",
    "relative_position_bucket",
    "rotary_angles",
    "rotary_freqs",
    "rotate_queries_or_keys",
]
