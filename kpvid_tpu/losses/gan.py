"""GAN losses: mean sigmoid cross-entropy with logits.

Parity: reference models/detector_translator_model.py:246-272 and
models/motion_generator_model.py:277-308 (vanilla non-saturating BCE GAN,
D = BCE(real,1) + BCE(fake,0), G_adv = BCE(fake,1))."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_logits(logits: jax.Array, target: float) -> jax.Array:
    """Numerically-stable mean BCE-with-logits against a constant target.

    Same form as tf.nn.sigmoid_cross_entropy_with_logits:
    max(x, 0) - x*z + log(1 + exp(-|x|)).
    """
    x = logits.astype(jnp.float32)
    per = jnp.maximum(x, 0.0) - x * target + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.mean(per)


def discriminator_loss(real_logits: jax.Array, fake_logits: jax.Array):
    real_loss = bce_logits(real_logits, 1.0)
    fake_loss = bce_logits(fake_logits, 0.0)
    return real_loss + fake_loss, real_loss, fake_loss


def generator_adv_loss(fake_logits: jax.Array) -> jax.Array:
    return bce_logits(fake_logits, 1.0)
