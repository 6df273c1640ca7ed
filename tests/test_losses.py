"""Tests for losses: GAN BCE, VAE KL (raw-sigma), VGG19 perceptual."""

import numpy as np
import pytest

import jax.numpy as jnp

from kpvid_tpu.losses import (
    VGG_FEATURE_LAYERS,
    bce_logits,
    discriminator_loss,
    generator_adv_loss,
    kl_raw_sigma,
    perceptual_loss,
    seq_recon_loss,
    synthesize_vgg19_params,
    vgg19_features,
)


class TestGan:
    def test_bce_matches_tf_formula(self, rng):
        x32 = rng.normal(size=(4, 3)).astype(np.float32)
        x = x32.astype(np.float64)  # f64 oracle, f32-tolerance comparison
        for z in (0.0, 1.0):
            ref = np.mean(np.maximum(x, 0) - x * z + np.log1p(np.exp(-np.abs(x))))
            got = float(bce_logits(jnp.asarray(x32), z))
            # XLA CPU's exp/log1p approximations carry ~1e-5 rel error
            assert got == pytest.approx(ref, rel=1e-4)

    def test_d_and_g(self, rng):
        real = jnp.asarray(rng.normal(size=(2, 4, 4, 1)), jnp.float32)
        fake = jnp.asarray(rng.normal(size=(2, 4, 4, 1)), jnp.float32)
        total, r, f = discriminator_loss(real, fake)
        assert float(total) == pytest.approx(float(r) + float(f), rel=1e-6)
        assert float(generator_adv_loss(fake)) == pytest.approx(
            float(bce_logits(fake, 1.0)), rel=1e-6
        )


class TestVae:
    def test_recon_scale_1000(self, rng):
        a = rng.normal(size=(2, 5, 6)).astype(np.float32)
        b = rng.normal(size=(2, 5, 6)).astype(np.float32)
        got = float(seq_recon_loss(jnp.asarray(a), jnp.asarray(b)))
        assert got == pytest.approx(1000.0 * np.mean(np.abs(a - b)), rel=1e-5)

    def test_kl_golden(self):
        # hand-computed: mu=[1,0], sigma=[1,2] ->
        # 0.5*((1+1-log(1+eps)-1) + (0+4-log(4+eps)-1)) = 0.5*(1 + 3 - log4)
        mu = jnp.asarray([[1.0, 0.0]])
        sd = jnp.asarray([[1.0, 2.0]])
        expect = 0.5 * (1.0 + 3.0 - np.log(4.0 + 1e-8) - np.log(1 + 1e-8))
        assert float(kl_raw_sigma(mu, sd)) == pytest.approx(expect, rel=1e-6)

    def test_kl_sigma_zero_guard(self):
        # relu can emit exactly 0; the 1e-8 guard keeps it finite
        val = float(kl_raw_sigma(jnp.zeros((1, 2)), jnp.zeros((1, 2))))
        assert np.isfinite(val)
        assert val == pytest.approx(0.5 * (-np.log(1e-8) - 1) * 2, rel=1e-4)


class TestVgg:
    def test_tap_shapes(self, rng):
        params = synthesize_vgg19_params()
        x = jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3)), jnp.float32)
        taps = vgg19_features(params, x)
        assert len(taps) == len(VGG_FEATURE_LAYERS)
        assert [t.shape for t in taps] == [
            (1, 64, 64, 64),
            (1, 32, 32, 128),
            (1, 16, 16, 256),
            (1, 8, 8, 512),
            (1, 4, 4, 512),
        ]

    def test_identical_images_zero_loss(self, rng):
        params = synthesize_vgg19_params()
        x = jnp.asarray(rng.uniform(0, 255, (2, 64, 64, 3)), jnp.float32)
        assert float(perceptual_loss(params, x, x)) == pytest.approx(0.0, abs=1e-5)

    def test_different_images_positive(self, rng):
        params = synthesize_vgg19_params()
        x = jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3)), jnp.float32)
        y = jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3)), jnp.float32)
        assert float(perceptual_loss(params, x, y)) > 0.0
