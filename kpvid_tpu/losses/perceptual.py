"""Frozen VGG19 perceptual loss.

Parity: reference models/networks/vgg.py:7-61 and
models/detector_translator_model.py:262-289 —
- inputs are images in [0, 255] (the reference rescales from [-1,1] BEFORE
  the VGG; quirk Q7),
- RGB -> BGR with per-channel mean subtraction [103.939, 116.779, 123.68],
- conv/relu stack with 2x2 SAME max-pools,
- features tapped at conv1_2, conv2_2, conv3_4, conv4_4, conv5_4 (post-relu),
- loss = mean over the 5 layers of mean |feat_gt - feat_pred|.

TPU-first: the weights are a frozen pytree passed INTO the jitted loss (not
module params), so they are never touched by the optimizer and XLA treats
them as ordinary device buffers; gt and pred run as one 2B batch like the
reference's concat (detector_translator_model.py:267). Compute dtype is
configurable (bf16 halves the bandwidth of what is ~half of stage-1 FLOPs;
the L1 reduction is always f32).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as flax_nn

from ..ops import pair_fns

# (name, out_channels, followed_by_pool)
VGG19_LAYOUT = (
    ("conv1_1", 64, False),
    ("conv1_2", 64, True),
    ("conv2_1", 128, False),
    ("conv2_2", 128, True),
    ("conv3_1", 256, False),
    ("conv3_2", 256, False),
    ("conv3_3", 256, False),
    ("conv3_4", 256, True),
    ("conv4_1", 512, False),
    ("conv4_2", 512, False),
    ("conv4_3", 512, False),
    ("conv4_4", 512, True),
    ("conv5_1", 512, False),
    ("conv5_2", 512, False),
    ("conv5_3", 512, False),
    ("conv5_4", 512, False),  # pool5 is after the last tap; never needed
)

VGG_FEATURE_LAYERS = ("conv1_2", "conv2_2", "conv3_4", "conv4_4", "conv5_4")

_VGG_MEAN_BGR = (103.939, 116.779, 123.68)


def load_vgg19_params(path: str) -> dict[str, dict[str, np.ndarray]]:
    """Load the reference's vgg19.npy dict (name -> [kernel HWIO, bias])."""
    data = np.load(path, encoding="latin1", allow_pickle=True).item()
    return {
        name: {"kernel": np.asarray(data[name][0]), "bias": np.asarray(data[name][1])}
        for name, _, _ in VGG19_LAYOUT
    }


def synthesize_vgg19_params(
    seed: int = 0, max_width: int | None = None
) -> dict[str, dict[str, np.ndarray]]:
    """Deterministic random VGG19 weights for environments without
    vgg19.npy (tests, benches). Shapes identical to the real file; He-scaled
    so activations neither explode nor vanish.

    max_width clamps every layer's channel count (vgg19_features derives
    widths from the param shapes, so the tower stays structurally VGG19) —
    used by size-constrained smoke paths like the multichip dryrun, where
    the full-width tower would dominate the tiny-step runtime."""
    rng = np.random.default_rng(seed)
    params = {}
    in_ch = 3
    for name, out_ch, _ in VGG19_LAYOUT:
        if max_width is not None:
            out_ch = min(out_ch, max_width)
        fan_in = 3 * 3 * in_ch
        params[name] = {
            "kernel": rng.normal(0, np.sqrt(2.0 / fan_in), (3, 3, in_ch, out_ch)).astype(
                np.float32
            ),
            "bias": np.zeros((out_ch,), np.float32),
        }
        in_ch = out_ch
    return params


def vgg19_features(
    params: dict,
    rgb_0_255: jax.Array,
    dtype: Any = jnp.float32,
) -> list[jax.Array]:
    """Run the frozen VGG19 stack; returns the 5 tap activations."""
    r, g, b = jnp.split(rgb_0_255.astype(jnp.float32), 3, axis=3)
    x = jnp.concatenate(
        [b - _VGG_MEAN_BGR[0], g - _VGG_MEAN_BGR[1], r - _VGG_MEAN_BGR[2]], axis=3
    ).astype(dtype)
    taps = []
    for name, _, pool in VGG19_LAYOUT:
        k = jnp.asarray(params[name]["kernel"], dtype)
        bias = jnp.asarray(params[name]["bias"], dtype)
        # output in the compute dtype (MXU accumulates f32 internally);
        # requesting preferred_element_type=f32 here breaks the VJP, which
        # would mix f32 cotangents with bf16 kernels in the transpose conv
        x = jax.lax.conv_general_dilated(
            x,
            k,
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias
        x = jax.nn.relu(x)
        if name in VGG_FEATURE_LAYERS:
            taps.append(x)
            if len(taps) == len(VGG_FEATURE_LAYERS):
                break
        if pool:
            # flax max_pool: dtype-preserving and autodiff-friendly
            x = flax_nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")
    return taps


def perceptual_loss(
    params: dict,
    gt_0_255: jax.Array,
    pred_0_255: jax.Array,
    dtype: Any = jnp.float32,
    pair_mode: str = "interleave",
) -> jax.Array:
    """Mean over 5 tap layers of mean |feat_gt - feat_pred| (f32).

    pair_mode lays out the 2B VGG batch (ops/batching.py): 'interleave' is
    shard-aligned under a batch-sharded mesh, 'concat' is single-chip
    fastest; VGG is row-independent so taps are bit-identical either way."""
    pair, unpair = pair_fns(pair_mode)
    both = pair(gt_0_255, pred_0_255)
    feats = vgg19_features(params, both, dtype=dtype)
    losses = []
    for f in feats:
        f_gt, f_pred = unpair(f.astype(jnp.float32))
        losses.append(jnp.mean(jnp.abs(f_gt - f_pred)))
    return jnp.mean(jnp.stack(losses))
