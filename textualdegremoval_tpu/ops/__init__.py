"""Shared numeric ops for the restoration backbones.

All ops operate on NHWC tensors (TPU-native conv layout).  Each op documents
the reference-semantics file:line it provides parity with (see SURVEY.md §2).
"""

from textualdegremoval_tpu.ops.norm import (
    bias_free_layer_norm,
    with_bias_layer_norm,
    layer_norm_2d,
)
from textualdegremoval_tpu.ops.resize import (
    pixel_shuffle,
    pixel_unshuffle,
    pad_to_multiple,
)
from textualdegremoval_tpu.ops.ffn import simple_gate
from textualdegremoval_tpu.ops.attention import mdta_attention, tksa_attention
from textualdegremoval_tpu.ops.tlc import local_avg_pool
from textualdegremoval_tpu.ops.masa import (
    unfold_nhwc,
    fold_overlap_add,
    masa_coarse_search,
    masa_fine_search,
    masa_gather_windows,
    masa_transfer,
    masa_match_and_warp,
)

__all__ = [
    "bias_free_layer_norm",
    "with_bias_layer_norm",
    "layer_norm_2d",
    "pixel_shuffle",
    "pixel_unshuffle",
    "pad_to_multiple",
    "simple_gate",
    "mdta_attention",
    "tksa_attention",
    "local_avg_pool",
    "unfold_nhwc",
    "fold_overlap_add",
    "masa_coarse_search",
    "masa_fine_search",
    "masa_gather_windows",
    "masa_transfer",
    "masa_match_and_warp",
]
