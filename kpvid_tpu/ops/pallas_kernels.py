"""Pallas TPU kernels for the keypoint pose head.

Two bandwidth-bound fusions (the FLOP-heavy convs/matmuls stay on XLA's
MXU path, which is already optimal for them):

- `pose_head_pallas`: raw heatmaps [B, H, W, K] -> keypoints [B, K, 2].
  One VMEM pass computes BOTH spatial marginals, their softmaxes, and the
  expectation against the [-1, 1] grid — the jnp path reads the heatmap
  tensor twice (once per marginal) and materializes both marginal arrays
  in HBM.
- `gaussian_render_pallas`: keypoints [B, K, 2] -> maps [B, H, W, K],
  written DIRECTLY in NHWC layout. The jnp separable path produces
  [B, K, H, W] and transposes, costing a full extra HBM round-trip of the
  output tensor.

VMEM budget: K (the lane dim) pads to 128, so a full 128x128xK block would
be 8.4 MB; both kernels therefore tile over H (grid = (B, H/TILE_H)) with
small scratch accumulators, staying well inside the ~16 MB of VMEM with
double buffering. Numerics are identical to ops/coords.py (same inclusive
linspace grids, same exp/softmax math); tests compare against the jnp
implementations in interpret mode.

MEASURED (v5e, 2026-08-16): at K=40 the lane padding (40 -> 128) makes
these kernels move ~3.2x the bytes of XLA's packed-layout fusion of the
jnp path, and they lose: pose_head 3.3 ms vs 1.7 ms jnp
([32,128,128,40]); render 3.4 ms vs 2.6 ms ([512]@32x32). The model code
therefore DEFAULTS to the jnp implementations; these kernels remain the
drop-in alternative for K >= 128 workloads (where the padding tax
vanishes) and as the fused-pose-head reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_H = 32


def _grid_values(size: int, start: int = 0, count: int | None = None):
    """Inclusive [-1, 1] grid values for rows [start, start+count) as a
    [count, 1] f32 column (TPU iota must be >= 2D and integer)."""
    count = size if count is None else count
    idx = jax.lax.broadcasted_iota(jnp.int32, (count, 1), 0).astype(jnp.float32)
    step = 2.0 / (size - 1) if size > 1 else 0.0
    return (idx + float(start)) * step - 1.0


def _soft_expect(logits: jax.Array, size: int) -> jax.Array:
    """softmax over axis 0, expectation against the [-1,1] grid -> [K]."""
    m = jnp.max(logits, axis=0, keepdims=True)
    e = jnp.exp(logits - m)
    probs = e / jnp.sum(e, axis=0, keepdims=True)
    return jnp.sum(probs * _grid_values(size), axis=0)


# --------------------------------------------------------------- pose head
def _pose_head_kernel(raw_ref, out_ref, sumw_ref, margh_ref, *, height, width, tile_h):
    ti = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    x = raw_ref[0].astype(jnp.float32)  # [tile_h, W, K]

    @pl.when(ti == 0)
    def _():
        sumw_ref[...] = jnp.zeros_like(sumw_ref)

    sumw_ref[...] += jnp.sum(x, axis=0)  # accumulate over H -> [W, K]
    margh_ref[pl.ds(ti * tile_h, tile_h), :] = jnp.mean(x, axis=1)  # [tile_h, K]

    @pl.when(ti == n_tiles - 1)
    def _():
        marg_w = sumw_ref[...] / jnp.float32(height)  # mean over H -> [W, K]
        out_ref[0, :, 0] = _soft_expect(marg_w, width)
        out_ref[0, :, 1] = _soft_expect(margh_ref[...], height)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pose_head_pallas(raw_maps: jax.Array, interpret: bool = False) -> jax.Array:
    """Spatial soft-argmax, fused: [B, H, W, K] -> [B, K, 2] (x, y).

    Numerics parity: ops/coords.heatmaps_to_keypoints (reference
    utils/model.py:63-70 + networks/__init__.py:68-71).
    """
    b, h, w, k = raw_maps.shape
    tile_h = min(_TILE_H, h)
    assert h % tile_h == 0, f"H={h} must be divisible by {tile_h}"
    kernel = functools.partial(_pose_head_kernel, height=h, width=w, tile_h=tile_h)
    return pl.pallas_call(
        kernel,
        grid=(b, h // tile_h),
        in_specs=[
            pl.BlockSpec(
                (1, tile_h, w, k), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec((1, k, 2), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k, 2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((w, k), jnp.float32),  # running sum over H
            pltpu.VMEM((h, k), jnp.float32),  # per-row W-marginal
        ],
        interpret=interpret,
    )(raw_maps)


# --------------------------------------------------------- gaussian render
def _gaussian_render_kernel(mu_ref, out_ref, *, height, width, inv_std, tile_h):
    ti = pl.program_id(1)
    mu = mu_ref[0].astype(jnp.float32)  # [K, 2]
    c2 = jnp.float32(inv_std) ** 2
    row0 = ti * tile_h
    gy = _grid_values(height, 0, tile_h) + row0 * (2.0 / (height - 1) if height > 1 else 0.0)
    gx = _grid_values(width)  # [W, 1]
    ey = jnp.exp(-jnp.square(gy - mu[:, 1][None, :]) * c2)  # [TILE_H, K]
    ex = jnp.exp(-jnp.square(gx - mu[:, 0][None, :]) * c2)  # [W, K]
    out_ref[0] = (ey[:, None, :] * ex[None, :, :]).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("height", "width", "inv_std", "interpret", "dtype")
)
def gaussian_render_pallas(
    mu: jax.Array,
    height: int,
    width: int,
    inv_std: float = 14.3,
    dtype=jnp.float32,
    interpret: bool = False,
) -> jax.Array:
    """Gaussian heatmaps rendered straight into NHWC: [B, K, 2] ->
    [B, H, W, K].

    Numerics parity: ops/coords.render_gaussian_maps (reference
    utils/model.py:49-60, inv_std=14.3).
    """
    b, k, _ = mu.shape
    tile_h = min(_TILE_H, height)
    assert height % tile_h == 0, f"H={height} must be divisible by {tile_h}"
    kernel = functools.partial(
        _gaussian_render_kernel, height=height, width=width, inv_std=inv_std, tile_h=tile_h
    )
    return pl.pallas_call(
        kernel,
        grid=(b, height // tile_h),
        in_specs=[
            pl.BlockSpec((1, k, 2), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, width, k), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, height, width, k), dtype),
        interpret=interpret,
    )(mu)
