"""Golden-value tests for the numeric core (ops/).

The numpy oracles below transcribe the reference TF math
(reference utils/model.py:49-70) independently of the JAX implementation.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from kpvid_tpu.ops import (
    blend,
    colorize_point_maps,
    heatmaps_to_keypoints,
    render_gaussian_maps,
    soft_argmax_1d,
    upsample2x,
)


def np_softmax(x, axis):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def np_get_coord(x, other_axis, axis_size):
    # oracle for reference utils/model.py:63-70
    g_c_prob = x.mean(axis=other_axis)  # [B, S, K]
    g_c_prob = np_softmax(g_c_prob, axis=1)
    coord_pt = np.linspace(-1.0, 1.0, axis_size).reshape(1, axis_size, 1)
    return (g_c_prob * coord_pt).sum(axis=1)


def np_gaussian_maps(mu, shape_hw, inv_std=14.3):
    # oracle for reference utils/model.py:49-60
    mu_x = mu[:, :, 0][:, :, None, None]
    mu_y = mu[:, :, 1][:, :, None, None]
    y = np.linspace(-1.0, 1.0, shape_hw[0]).reshape(1, 1, shape_hw[0], 1)
    x = np.linspace(-1.0, 1.0, shape_hw[1]).reshape(1, 1, 1, shape_hw[1])
    dist = ((y - mu_y) ** 2 + (x - mu_x) ** 2) * inv_std**2
    return np.exp(-dist).transpose(0, 2, 3, 1)  # [B, H, W, K]


class TestSoftArgmax:
    def test_uniform_is_zero(self):
        out = soft_argmax_1d(jnp.zeros((2, 17, 3)), axis=1)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

    def test_peak_recovers_grid_point(self):
        logits = np.full((1, 9, 1), -50.0, np.float32)
        logits[0, 6, 0] = 50.0
        out = soft_argmax_1d(jnp.asarray(logits), axis=1)
        grid = np.linspace(-1, 1, 9)
        np.testing.assert_allclose(np.asarray(out)[0, 0], grid[6], atol=1e-5)

    def test_matches_reference_get_coord(self, rng):
        raw = rng.normal(size=(2, 16, 12, 5)).astype(np.float32)
        kp = np.asarray(heatmaps_to_keypoints(jnp.asarray(raw)))
        gx = np_get_coord(raw, 1, 12)  # x: mean over H, softmax over W
        gy = np_get_coord(raw, 2, 16)  # y: mean over W, softmax over H
        np.testing.assert_allclose(kp[..., 0], gx, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(kp[..., 1], gy, rtol=1e-5, atol=1e-6)


class TestGaussianMaps:
    def test_matches_reference(self, rng):
        mu = rng.uniform(-1, 1, size=(3, 7, 2)).astype(np.float32)
        out = np.asarray(render_gaussian_maps(jnp.asarray(mu), 32, 32))
        ref = np_gaussian_maps(mu, (32, 32))
        assert out.shape == (3, 32, 32, 7)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-6)

    def test_peak_value_on_grid(self):
        # keypoint exactly on a grid node -> map value 1 there
        g = np.linspace(-1, 1, 16)
        mu = jnp.asarray([[[g[5], g[9]]]], jnp.float32)
        out = np.asarray(render_gaussian_maps(mu, 16, 16))
        assert out[0, 9, 5, 0] == pytest.approx(1.0, abs=1e-6)
        assert out.max() == pytest.approx(1.0, abs=1e-6)

    def test_rectangular(self, rng):
        mu = rng.uniform(-1, 1, size=(2, 4, 2)).astype(np.float32)
        out = np.asarray(render_gaussian_maps(jnp.asarray(mu), 64, 32))
        ref = np_gaussian_maps(mu, (64, 32))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-6)

    def test_batch_dims(self, rng):
        mu = rng.uniform(-1, 1, size=(2, 5, 4, 2)).astype(np.float32)
        out = np.asarray(render_gaussian_maps(jnp.asarray(mu), 8, 8))
        assert out.shape == (2, 5, 8, 8, 4)
        flat = np.asarray(render_gaussian_maps(jnp.asarray(mu.reshape(10, 4, 2)), 8, 8))
        np.testing.assert_allclose(out.reshape(10, 8, 8, 4), flat, rtol=1e-6)


class TestRoundTrip:
    def test_render_then_detect_recovers_keypoints(self, rng):
        """Gaussian maps of keypoints, soft-argmaxed, return the keypoints.

        This validates the joint coordinate convention (the property stage-1
        training relies on). Sharp peaks away from the border recover well.
        """
        mu = rng.uniform(-0.6, 0.6, size=(2, 6, 2)).astype(np.float32)
        maps = render_gaussian_maps(jnp.asarray(mu), 128, 128)
        # scale to act like logits with a sharp softmax (the marginal mean
        # dilutes the peak by ~the gaussian width, so scale generously)
        kp = np.asarray(heatmaps_to_keypoints(maps * 2000.0))
        np.testing.assert_allclose(kp, mu, atol=0.02)


class TestBlendColorize:
    def test_blend(self, rng):
        im = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
        crude = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
        mask = rng.uniform(size=(2, 8, 8, 1)).astype(np.float32)
        out = np.asarray(blend(jnp.asarray(im), jnp.asarray(crude), jnp.asarray(mask)))
        np.testing.assert_allclose(out, im * mask + crude * (1 - mask), rtol=1e-6)

    def test_colorize(self, rng):
        maps = rng.uniform(size=(2, 4, 4, 3)).astype(np.float32)
        colors = rng.uniform(size=(3, 3)).astype(np.float32)
        out = np.asarray(colorize_point_maps(jnp.asarray(maps), jnp.asarray(colors)))
        ref = np.max(maps[..., None] * colors.reshape(1, 1, 1, 3, 3), axis=-2)
        assert out.shape == (2, 4, 4, 3)
        np.testing.assert_allclose(out, ref, rtol=1e-6)


class TestUpsample:
    def test_tf1_semantics(self):
        x = np.arange(8, dtype=np.float32).reshape(1, 2, 4, 1)
        out = np.asarray(upsample2x(jnp.asarray(x)))
        assert out.shape == (1, 4, 8, 1)
        row = x[0, 0, :, 0]
        # even columns copy, odd columns average with next (edge clamp)
        np.testing.assert_allclose(out[0, 0, 0::2, 0], row)
        np.testing.assert_allclose(
            out[0, 0, 1::2, 0],
            [(row[0] + row[1]) / 2, (row[1] + row[2]) / 2, (row[2] + row[3]) / 2, row[3]],
        )
        # rows: out row1 = average of input rows 0 and 1
        np.testing.assert_allclose(out[0, 1, 0::2, 0], (x[0, 0, :, 0] + x[0, 1, :, 0]) / 2)
        # last row clamps
        np.testing.assert_allclose(out[0, 3, 0::2, 0], x[0, 1, :, 0])

    def test_half_mode_shape(self, rng):
        x = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
        out = upsample2x(jnp.asarray(x), mode="half")
        assert out.shape == (2, 16, 16, 4)

    def test_up2_conv3_fused_exact(self, rng):
        """conv3x3_SAME(upsample2x(x)) == the single input-dilated 5x5
        conv, including the output border ring (the out-of-crop stencil
        sites are subtracted by the band corrections)."""
        import jax

        from kpvid_tpu.ops.resize import up2_conv3

        for (b, h, w, c, f) in [(2, 8, 8, 4, 6), (1, 5, 7, 3, 2), (3, 16, 4, 2, 5)]:
            x = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
            k = jnp.asarray((rng.normal(size=(3, 3, c, f)) * 0.2).astype(np.float32))
            bias = jnp.asarray(rng.normal(size=(f,)).astype(np.float32))
            # jit both paths: cacheable whole programs, not eager per-op
            want = jax.jit(lambda x, k, b: jax.lax.conv_general_dilated(
                upsample2x(x), k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b)(x, k, bias)
            got = jax.jit(up2_conv3)(x, k, bias)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
            )

    def test_up2_conv3_gradients_match(self, rng):
        """d/dx and d/dk of the fused op equal the two-step path's (the
        'fused' mode is selectable for TRAINING via config, so its VJP
        must be right, borders included)."""
        import jax

        from kpvid_tpu.ops.resize import up2_conv3

        x = jnp.asarray(rng.normal(size=(2, 6, 5, 3)).astype(np.float32))
        k = jnp.asarray((rng.normal(size=(3, 3, 3, 4)) * 0.3).astype(np.float32))

        def two_step(x, k):
            y = jax.lax.conv_general_dilated(
                upsample2x(x), k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return jnp.sum(jnp.sin(y))

        def fused(x, k):
            return jnp.sum(jnp.sin(up2_conv3(x, k)))

        for argnum in (0, 1):
            g_ref = jax.jit(jax.grad(two_step, argnums=argnum))(x, k)
            g_fused = jax.jit(jax.grad(fused, argnums=argnum))(x, k)
            np.testing.assert_allclose(
                np.asarray(g_fused), np.asarray(g_ref), rtol=1e-4, atol=1e-5
            )

    def test_matmul_mode_matches_tf1(self, rng):
        """The MXU-form upsample (serving path) computes the same stencil:
        exact in f32, <= 1 ulp in bf16 (only accumulation dtype differs)."""
        import jax

        for shape in [(2, 8, 8, 5), (1, 32, 16, 3), (3, 7, 9, 4)]:
            x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
            np.testing.assert_allclose(
                np.asarray(jax.jit(lambda x: upsample2x(x, mode="matmul"))(x)),
                np.asarray(jax.jit(lambda x: upsample2x(x, mode="tf1"))(x)),
                rtol=1e-6, atol=1e-6,
            )
            xb = x.astype(jnp.bfloat16)
            a = np.asarray(upsample2x(xb, mode="tf1"), np.float32)
            b = np.asarray(upsample2x(xb, mode="matmul"), np.float32)
            np.testing.assert_allclose(a, b, rtol=1e-2, atol=1e-2)
