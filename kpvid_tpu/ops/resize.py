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


def _up2_matrix(n: int) -> jax.Array:
    """[n, 2n] matrix M with out = M^T x: out[2i] = x[i],
    out[2i+1] = (x[i] + x[i+1]) / 2, edge-clamped — the same TF1-legacy
    stencil as _up2_axis_tf1, expressed as a matmul."""
    import numpy as np

    m = np.zeros((n, 2 * n), np.float32)
    idx = np.arange(n)
    m[idx, 2 * idx] = 1.0
    m[idx, 2 * idx + 1] += 0.5
    m[np.minimum(idx + 1, n - 1), 2 * idx + 1] += 0.5
    return jnp.asarray(m)


def upsample2x(x: jax.Array, mode: str = "tf1") -> jax.Array:
    """Upsample NHWC features 2x in H and W.

    mode='tf1'    — shift/average interleave (training default; bit-exact
                    per-element formulation of the legacy stencil).
    mode='matmul' — the SAME stencil as two small dense matmuls on the MXU.
                    The interleave formulation runs at ~9% of HBM peak on
                    v5e (layout-hostile scatter; docs/PERF.md round-2
                    profile), while the matmul form rides the MXU. Values
                    agree to 1 bf16 ulp (weights are exactly 1 and 0.5;
                    only the accumulation dtype differs) — used by the
                    serving path.
    mode='half'   — modern half-pixel bilinear, for users who prefer it.
    """
    if mode == "tf1":
        x = _up2_axis_tf1(x, 1)
        x = _up2_axis_tf1(x, 2)
        return x
    if mode == "matmul":
        _, h, w, _ = x.shape
        mh = _up2_matrix(h).astype(x.dtype)
        mw = _up2_matrix(w).astype(x.dtype)
        hi = jnp.einsum(
            "hH,bhwc->bHwc", mh, x, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        out = jnp.einsum(
            "wW,bhwc->bhWc", mw, hi.astype(x.dtype),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        return out.astype(x.dtype)
    if mode == "half":
        b, h, w, c = x.shape
        return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")
    raise ValueError(f"unknown resize mode {mode!r}")
