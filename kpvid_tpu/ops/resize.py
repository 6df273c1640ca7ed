"""2x bilinear upsampling with TF1-legacy sampling.

The reference upsamples decoder features with `tf.image.resize_images`
(reference models/networks/__init__.py:64,97), whose TF1 default is bilinear
with align_corners=False and *legacy* (non-half-pixel) centers: the source
coordinate for output index i at scale 2 is i/2. For an exact 2x upsample
this collapses to

    out[2i]   = in[i]
    out[2i+1] = (in[i] + in[i+1]) / 2     (edge-clamped)

which we implement directly with shifts and averages — cheaper than a
gather-based resize and bit-exact with the reference. `mode='half'` gives
modern half-pixel bilinear via jax.image.resize for users who prefer it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _up2_axis_tf1(x: jax.Array, axis: int) -> jax.Array:
    n = x.shape[axis]
    nxt = jnp.concatenate(
        [
            jax.lax.slice_in_dim(x, 1, n, axis=axis),
            jax.lax.slice_in_dim(x, n - 1, n, axis=axis),
        ],
        axis=axis,
    )
    mid = (x + nxt) * 0.5
    stacked = jnp.stack([x, mid], axis=axis + 1)  # interleave x, mid
    new_shape = list(x.shape)
    new_shape[axis] = 2 * n
    return stacked.reshape(new_shape)


def upsample2x(x: jax.Array, mode: str = "tf1") -> jax.Array:
    """Upsample NHWC features 2x in H and W."""
    if mode == "tf1":
        x = _up2_axis_tf1(x, 1)
        x = _up2_axis_tf1(x, 2)
        return x
    if mode == "half":
        b, h, w, c = x.shape
        return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")
    raise ValueError(f"unknown resize mode {mode!r}")
