"""Pallas kernels vs their jnp references (interpret mode on CPU)."""

import numpy as np

import jax.numpy as jnp

from kpvid_tpu.ops import heatmaps_to_keypoints, render_gaussian_maps
from kpvid_tpu.ops.pallas_kernels import gaussian_render_pallas, pose_head_pallas


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
