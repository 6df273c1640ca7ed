"""Pallas kernels vs their jnp references (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from kpvid_tpu.ops import heatmaps_to_keypoints, render_gaussian_maps
from kpvid_tpu.ops.pallas_conv import (
    conv3x3_affine,
    conv3x3_affine_packed,
    fold_bn,
    up2_conv3_affine,
)
from kpvid_tpu.ops.pallas_kernels import gaussian_render_pallas, pose_head_pallas
from kpvid_tpu.ops.resize import up2_conv3


def test_pose_head_matches_jnp(rng):
    raw = jnp.asarray(rng.normal(size=(2, 32, 24, 8)), jnp.float32)
    got = np.asarray(pose_head_pallas(raw, interpret=True))
    want = np.asarray(heatmaps_to_keypoints(raw))
    assert got.shape == (2, 8, 2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_gaussian_render_matches_jnp(rng):
    mu = jnp.asarray(rng.uniform(-1, 1, (3, 8, 2)), jnp.float32)
    got = np.asarray(gaussian_render_pallas(mu, 32, 16, interpret=True))
    want = np.asarray(render_gaussian_maps(mu, 32, 16))
    assert got.shape == (3, 32, 16, 8)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pose_head_small_heatmap(rng):
    """H < the 32-row tile: the kernel must size its tile to H (regression
    for the round-1 advisor finding on the fixed _TILE_H scratch slice)."""
    raw = jnp.asarray(rng.normal(size=(2, 16, 16, 8)), jnp.float32)
    got = np.asarray(pose_head_pallas(raw, interpret=True))
    want = np.asarray(heatmaps_to_keypoints(raw))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_gaussian_render_small_height(rng):
    mu = jnp.asarray(rng.uniform(-1, 1, (2, 8, 2)), jnp.float32)
    got = np.asarray(gaussian_render_pallas(mu, 8, 16, interpret=True))
    want = np.asarray(render_gaussian_maps(mu, 8, 16))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_roundtrip_pallas(rng):
    mu = jnp.asarray(rng.uniform(-0.6, 0.6, (1, 4, 2)), jnp.float32)
    maps = gaussian_render_pallas(mu, 64, 64, interpret=True)
    kp = np.asarray(pose_head_pallas(maps * 2000.0, interpret=True))
    np.testing.assert_allclose(kp, np.asarray(mu), atol=0.02)


def _conv3x3_ref(x, k, scale, shift, relu=True):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    y = y * scale + shift
    return jnp.maximum(y, 0) if relu else y


def test_conv3x3_affine_matches_xla(rng):
    """SAME 3x3 conv + affine + relu vs lax.conv at f32: the folded
    dx-in-contraction / dy-in-output formulation must reproduce the conv
    including all four zero-padded edges."""
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 8, 8)) * 0.2, jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (8,)), jnp.float32)
    shift = jnp.asarray(rng.normal(size=(8,)) * 0.1, jnp.float32)
    got = np.asarray(conv3x3_affine(x, k, scale, shift, interpret=True))
    want = np.asarray(_conv3x3_ref(x, k, scale, shift))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_conv3x3_affine_strips_and_rect(rng):
    """Multi-strip grid (strip < H) and a rectangular Cin != Cout layer
    agree with the single-strip full conv; relu=False path covered."""
    x = jnp.asarray(rng.normal(size=(1, 16, 8, 4)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 4, 12)) * 0.2, jnp.float32)
    one = jnp.ones((12,), jnp.float32)
    zero = jnp.zeros((12,), jnp.float32)
    want = np.asarray(_conv3x3_ref(x, k, one, zero, relu=False))
    for strip in (4, 8, 16):
        got = np.asarray(
            conv3x3_affine(x, k, one, zero, relu=False, strip=strip, interpret=True)
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_conv3x3_affine_packed_matches_xla(rng):
    """The W-packed variant (free [H,W,C]->[H,W/2,2C] reshape + sparse
    pack_w_kernel remap) computes the identical op, edges included."""
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 4)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 4, 6)) * 0.2, jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (6,)), jnp.float32)
    shift = jnp.asarray(rng.normal(size=(6,)) * 0.1, jnp.float32)
    got = np.asarray(conv3x3_affine_packed(x, k, scale, shift, interpret=True))
    want = np.asarray(_conv3x3_ref(x, k, scale, shift))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def _up2_ref(x, k, scale, shift, relu):
    y = up2_conv3(x, k) * scale + shift
    return jnp.maximum(y, 0) if relu else y


def test_up2_conv3_affine_matches_two_step(rng):
    """One-kernel fused upsample2x+conv3x3+affine vs the two-step XLA
    reference (ops/resize.up2_conv3), all phase/border splices exact, in
    both relu settings and both output layouts."""
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 4, 6)) * 0.2, jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (6,)), jnp.float32)
    shift = jnp.asarray(rng.normal(size=(6,)) * 0.1, jnp.float32)
    for relu in (True, False):
        want = np.asarray(_up2_ref(x, k, scale, shift, relu))
        got = np.asarray(
            up2_conv3_affine(x, k, scale, shift, relu=relu, interpret=True)
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
        packed = np.asarray(
            up2_conv3_affine(
                x, k, scale, shift, relu=relu, pack_w_out=True, interpret=True
            )
        )
        # packed col w2 holds [out[2*w2] | out[2*w2+1]] on the channel axis
        unpacked = packed.reshape(2, 16, 16, 6)
        np.testing.assert_allclose(unpacked, want, rtol=1e-4, atol=1e-5)


def test_up2_conv3_affine_multi_strip(rng):
    """strip < H exercises the cross-strip border splices (first/last
    grid steps own the exact border rows)."""
    x = jnp.asarray(rng.normal(size=(1, 16, 8, 4)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 4, 4)) * 0.2, jnp.float32)
    one = jnp.ones((4,), jnp.float32)
    zero = jnp.zeros((4,), jnp.float32)
    want = np.asarray(_up2_ref(x, k, one, zero, True))
    for strip in (4, 8, 16):
        got = np.asarray(
            up2_conv3_affine(x, k, one, zero, strip=strip, interpret=True)
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fold_bn_matches_bn_inference(rng):
    """fold_bn's (scale, shift) reproduce inference BatchNorm (eps 1e-5)
    applied to conv(x) + bias."""
    y = jnp.asarray(rng.normal(size=(2, 4, 4, 6)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(6,)), jnp.float32)
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, (6,)), jnp.float32)
    beta = jnp.asarray(rng.normal(size=(6,)), jnp.float32)
    mean = jnp.asarray(rng.normal(size=(6,)), jnp.float32)
    var = jnp.asarray(rng.uniform(0.1, 2.0, (6,)), jnp.float32)
    scale, shift = fold_bn(bias, gamma, beta, mean, var)
    want = (y + bias - mean) * gamma / jnp.sqrt(var + 1e-5) + beta
    got = y * scale + shift
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)
