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


def _up2_conv3_compose_matrix() -> jax.Array:
    """[5, 3] per-axis composition B[m, d] = bu[m - d], bu = [.5, 1, .5]:
    the 2x-upsample stencil correlated into a following 3-tap kernel."""
    import numpy as np

    bu = [0.5, 1.0, 0.5]
    b = np.zeros((5, 3), np.float32)
    for d in range(3):
        for a in range(3):
            b[d + a, d] += bu[a]
    return jnp.asarray(b)


def _conv1d_w(band: jax.Array, k: jax.Array) -> jax.Array:
    """VALID 3-tap correlation along axis 1. band: [B, L+2, C]; k:
    [3, C, F] -> [B, L, F]."""
    return jax.lax.conv_general_dilated(
        band[:, None], k[None], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[:, 0]


def up2_conv3(x: jax.Array, k3: jax.Array, bias: jax.Array | None = None) -> jax.Array:
    """conv3x3_SAME(upsample2x(x)) as ONE 5x5 input-dilated conv — exact.

    Derivation (each axis): the TF1-legacy 2x upsample is a stride-2
    transposed conv with stencil bu = [0.5, 1, 0.5] applied to x with its
    high edge replicate-padded (that reproduces the edge-clamped last mid);
    a SAME 3x3 conv then zero-pads the upsampled lattice. The correlations
    compose into one correlation of the dilated padded input with
    K5[m] = sum_d k3[d] * bu[m - d], padding (2, 1) per axis — except on
    the one-pixel output border: the composite also picks up the upsample
    stencil's out-of-crop sites (row/col -1 and 2H/2W), which the two-step
    computation zeroes. Those sites have closed forms from x's border
    rows/cols (row -1 = 0.5 x_row0 upsampled along W; row 2H = x_row{H-1}
    upsampled; corners scale by the crossed factors), so four thin VALID
    convs subtract them. XLA phase-decomposes the input-dilated main conv
    (4 stride-1 subkernels, ~6.25 effective taps per output vs 9), so this
    runs ~2.5x FASTER than materializing the upsample and convolving
    (docs/PERF.md round-2 profile) — and the 4x-bytes upsampled activation
    never exists.

    x: [B, H, W, C]; k3: [3, 3, C, F] -> [B, 2H, 2W, F].
    """
    comp = _up2_conv3_compose_matrix().astype(k3.dtype)
    k5 = jnp.einsum("yxcf,ay,bx->abcf", k3, comp, comp)
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
    y = jax.lax.conv_general_dilated(
        xp, k5,
        window_strides=(1, 1),
        padding=((2, 1), (2, 1)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )

    def up_w(row):  # [B, W, C] -> [B, 2W, C] (W-axis tf1 upsample)
        return _up2_axis_tf1(row, 1)

    # out-of-crop U rows (length 2W + 2 including the corner sites):
    #   U[-1, c] = 0.5 * up(x[0]);  U[2H, c] = up(x[H-1])
    #   corners: U[., -1] = 0.5 * row[0], U[., 2W] = row[2W-1] (clamped mid)
    def band_row(row, scale):
        u = up_w(row) * scale  # [B, 2W, C]
        return jnp.concatenate([0.5 * u[:, :1], u, u[:, -1:]], axis=1)

    top = band_row(x[:, 0], 0.5)
    bot = band_row(x[:, -1], 1.0)
    y = y.at[:, 0].add(-_conv1d_w(top, k3[0]))
    y = y.at[:, -1].add(-_conv1d_w(bot, k3[2]))
    # out-of-crop U cols, r in [0, 2H-1] ONLY (corner sites already
    # subtracted by the row bands): zero-pad the band ends
    def band_col(col, scale):
        u = _up2_axis_tf1(col, 1) * scale  # [B, 2H, C]
        z = jnp.zeros_like(u[:, :1])
        return jnp.concatenate([z, u, z], axis=1)

    left = band_col(x[:, :, 0], 0.5)
    right = band_col(x[:, :, -1], 1.0)
    y = y.at[:, :, 0].add(-_conv1d_w(left, k3[:, 0]))
    y = y.at[:, :, -1].add(-_conv1d_w(right, k3[:, 2]))
    if bias is not None:
        y = y + bias
    return y
