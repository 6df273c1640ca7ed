from .batching import (
    concat_pair,
    deinterleave_pair,
    interleave_pair,
    pair_fns,
    resolve_pair_mode,
    split_pair,
)
from .coords import (
    blend,
    colorize_point_maps,
    heatmaps_to_keypoints,
    render_gaussian_maps,
    soft_argmax_1d,
)
from .resize import upsample2x

__all__ = [
    "blend",
    "concat_pair",
    "deinterleave_pair",
    "interleave_pair",
    "pair_fns",
    "resolve_pair_mode",
    "split_pair",
    "colorize_point_maps",
    "heatmaps_to_keypoints",
    "render_gaussian_maps",
    "soft_argmax_1d",
    "upsample2x",
]
