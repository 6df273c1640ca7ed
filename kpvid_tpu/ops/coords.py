"""Keypoint coordinate ops: spatial soft-argmax and Gaussian re-rendering.

These pin the coordinate convention of the whole system: keypoints live in
[-1, 1]^2 with `linspace(-1, 1, size)` grids INCLUSIVE of both endpoints,
and a keypoint is stored as (x, y).

Numerics match the reference exactly:
- soft-argmax: reference utils/model.py:63-70 (`get_coord`) — marginal mean
  over the other spatial axis, softmax along the axis, expectation against
  the linspace grid.
- Gaussian renderer: reference utils/model.py:49-60 (`get_gaussian_maps`) —
  isotropic exp(-((x-mu_x)^2 + (y-mu_y)^2) * inv_std^2), inv_std=14.3.

TPU-first design notes:
- the renderer exploits separability: exp(-(gy+gx)) = exp(-gy) * exp(-gx),
  so we compute K*(H+W) exponentials and one tiny batched outer product on
  the MXU instead of K*H*W exponentials on the VPU. Same math, ~H*W/(H+W)x
  fewer transcendentals than the reference formulation.
- everything is shape-static and fusion-friendly; a fully fused Pallas
  version of the round-trip (raw heatmap -> coords -> re-rendered maps)
  lives in ops/pallas_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _grid(size: int, dtype) -> jax.Array:
    return jnp.linspace(-1.0, 1.0, size, dtype=dtype)


def soft_argmax_1d(logits: jax.Array, axis: int = -1) -> jax.Array:
    """Expectation of softmax(logits) against a [-1,1] linspace along `axis`.

    Parity: reference utils/model.py:63-70.
    """
    axis = axis % logits.ndim
    size = logits.shape[axis]
    probs = jax.nn.softmax(logits, axis=axis)
    grid_shape = [1] * logits.ndim
    grid_shape[axis] = size
    grid = _grid(size, probs.dtype).reshape(grid_shape)
    return jnp.sum(probs * grid, axis=axis)


def heatmaps_to_keypoints(raw_maps: jax.Array) -> jax.Array:
    """Spatial soft-argmax: raw heatmaps [B, H, W, K] -> keypoints [B, K, 2].

    Keypoint layout is (x, y), both in [-1, 1]. The x coordinate is the
    soft-argmax of the height-meaned marginal (reference
    models/networks/__init__.py:68-71: `get_coord(x, 1, W)` then
    `get_coord(x, 2, H)`, stacked as (x, y)).
    """
    # marginals: mean over the *other* spatial axis
    marg_w = jnp.mean(raw_maps, axis=1)  # [B, W, K] -> x
    marg_h = jnp.mean(raw_maps, axis=2)  # [B, H, K] -> y
    x = soft_argmax_1d(marg_w, axis=1)  # [B, K]
    y = soft_argmax_1d(marg_h, axis=1)  # [B, K]
    return jnp.stack([x, y], axis=-1)


@functools.partial(jax.jit, static_argnames=("height", "width"))
def render_gaussian_maps(
    mu: jax.Array,
    height: int,
    width: int,
    inv_std: float = 14.3,
) -> jax.Array:
    """Render keypoints [..., K, 2] (x, y) to Gaussian maps [..., H, W, K].

    exp(-((gy - mu_y)^2 + (gx - mu_x)^2) * inv_std^2) on inclusive [-1, 1]
    grids — numerically identical to reference utils/model.py:49-60, but
    computed separably (see module docstring).
    """
    batch_shape = mu.shape[:-2]
    k = mu.shape[-2]
    mu2 = mu.reshape((-1, k, 2))
    mu_x = mu2[..., 0][..., None]  # [B, K, 1]
    mu_y = mu2[..., 1][..., None]
    c2 = jnp.asarray(inv_std, mu.dtype) ** 2
    gy = _grid(height, mu.dtype)[None, None, :]  # [1, 1, H]
    gx = _grid(width, mu.dtype)[None, None, :]
    ey = jnp.exp(-jnp.square(gy - mu_y) * c2)  # [B, K, H]
    ex = jnp.exp(-jnp.square(gx - mu_x) * c2)  # [B, K, W]
    # outer product over (H, W), contraction-free einsum -> [B, K, H, W]
    maps = jnp.einsum("bkh,bkw->bkhw", ey, ex)
    maps = jnp.transpose(maps, (0, 2, 3, 1))  # [B, H, W, K]
    return maps.reshape(batch_shape + (height, width, k))


def blend(background: jax.Array, crude: jax.Array, mask: jax.Array) -> jax.Array:
    """Masked blend: mask keeps the background, (1-mask) takes the crude
    prediction (reference models/detector_translator_model.py:174)."""
    return background * mask + crude * (1.0 - mask)


def colorize_point_maps(maps: jax.Array, colors: jax.Array) -> jax.Array:
    """Visualization: tint each keypoint map with its color, max-reduce.

    maps: [..., H, W, K]; colors: [K, 3] -> [..., H, W, 3].
    Parity: reference utils/model.py:42-46.
    """
    colors = jnp.asarray(colors, maps.dtype)
    tinted = maps[..., None] * colors  # [..., H, W, K, 3]
    return jnp.max(tinted, axis=-2)
