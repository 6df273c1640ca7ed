"""Whole-region Mosaic chain for the serving translator.

Round-2/3 measurements (docs/PERF.md "Pallas kernels") showed the
per-layer Pallas backend loses end-to-end despite winning per-layer:
every XLA-conv <-> Mosaic boundary materializes a GB-scale
layout-conversion copy of the activations. The fix is to keep the ENTIRE
translator decode in Mosaic so the big feature maps never cross back:

  oct0a BN+relu      XLA elementwise (fuses into the producer)
  oct0b..oct0d       conv3x3_affine           32^2 x 256   (MXU-deep)
  oct1a              up2_conv3_affine         -> 64^2 x 128
  oct1b..oct1d       conv3x3_affine           64^2 x 128
  oct2a              up2_conv3_affine packed  -> [128, 64, 2*64] lanes=128
  oct2b              conv3x3_affine on the W-packed view (pack_w_kernel)
  crude+mask heads   conv3x3_affine relu=False, packed [.., 64, 8]
  unpack + sigmoid + blend   XLA (tiny 4-channel tensor)

The only XLA<->Mosaic boundaries on full-size tensors are the entry
(32^2 embedding — 16x smaller per pixel than the output) and the
8-channel head product; the 128^2 x 64 feature maps stay in Mosaic
layouts throughout. The final octave rides the FREE W-packed view
([H, W, C] -> [H, W/2, 2C] is a row-major reshape) so its C=64 layers
fill all 128 lanes (unpacked C=64 measured x0.59 vs XLA).

Computes exactly Translator.__call__(train=False, precomputed_first=...,
fused_heads=...) — reference parity models/networks/__init__.py:75-102
via the same folded parameters (see ops/pallas_conv.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .pallas_conv import (
    conv3x3_affine,
    fold_bn,
    pack_w_kernel,
    up2_conv3_affine,
)


def chain_eligible(first_shape: tuple, final_res: int) -> bool:
    """Shape gate for translator_chain: the embedding resolution must
    strip-decompose (H % 8 == 0, W even) and the decode must be the
    standard two-up-octave pyramid (final_res = 4 * embed res) so the
    packed final octave keeps >= 8 packed columns."""
    h, w = first_shape[-3], first_shape[-2]
    return (
        h >= 8
        and h % 8 == 0
        and w == h
        and final_res == 4 * h
        and first_shape[-1] % 2 == 0
    )


def translator_chain(
    params: dict,
    batch_stats: dict,
    first_preact: jax.Array,
    fused_k: jax.Array,
    fused_b: jax.Array,
    final_res: int,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """(crude f32, mask f32) for the translator decode, all-Mosaic.

    params / batch_stats: the Translator module's own collections
    (params['oct{o}{x}_conv']['Conv_0'], ...). first_preact: [N, h, w, F]
    pre-activation output of oct0a (bias included) as built by
    eval/final.py::_split_first_conv. fused_k/fused_b: the concatenated
    crude+mask head kernel/bias ([3,3,C,4], [4])."""
    dt = first_preact.dtype

    def folded(name):
        cp = params[f"{name}_conv"]["Conv_0"]
        bnp = params[f"{name}_bn"]["BatchNorm_0"]
        bns = batch_stats[f"{name}_bn"]["BatchNorm_0"]
        scale, shift = fold_bn(
            cp["bias"], bnp["scale"], bnp["bias"], bns["mean"], bns["var"]
        )
        return cp["kernel"].astype(dt), scale, shift

    # oct0a: conv already done (first_preact, bias included) — BN + relu
    # as XLA elementwise, fused into whatever produced first_preact.
    bnp = params["oct0a_bn"]["BatchNorm_0"]
    bns = batch_stats["oct0a_bn"]["BatchNorm_0"]
    s0, t0 = fold_bn(None, bnp["scale"], bnp["bias"], bns["mean"], bns["var"])
    x = jnp.maximum(first_preact.astype(jnp.float32) * s0 + t0, 0.0).astype(dt)

    n_oct = 2  # enforced by chain_eligible: final_res == 4 * embed res
    for o in range(n_oct + 1):
        last = o == n_oct
        if o > 0:
            k, s, t = folded(f"oct{o}a")
            x = up2_conv3_affine(x, k, s, t, pack_w_out=last, interpret=interpret)
        k, s, t = folded(f"oct{o}b")
        if last:
            x = conv3x3_affine(
                x, pack_w_kernel(k), jnp.tile(s, 2), jnp.tile(t, 2),
                interpret=interpret,
            )
            break
        x = conv3x3_affine(x, k, s, t, interpret=interpret)
        for layer in ("c", "d"):
            k, s, t = folded(f"oct{o}{layer}")
            x = conv3x3_affine(x, k, s, t, interpret=interpret)

    # fused crude+mask heads on the packed view: scale=1, shift=bias.
    ones = jnp.ones((4,), jnp.float32)
    y = conv3x3_affine(
        x, pack_w_kernel(fused_k.astype(dt)),
        jnp.tile(ones, 2), jnp.tile(fused_b.astype(jnp.float32), 2),
        relu=False, interpret=interpret,
    )  # [N, R, R/2, 8] packed
    n = y.shape[0]
    y = y.reshape(n, final_res, final_res, 4)  # free row-major W-unpack
    crude = y[..., :3].astype(jnp.float32)
    mask = jax.nn.sigmoid(y[..., 3:4].astype(jnp.float32))
    return crude, mask
