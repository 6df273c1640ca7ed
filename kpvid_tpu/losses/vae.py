"""VAE losses for the motion generator.

Parity: reference models/motion_generator_model.py:296-308 —
recon = mean(1000 * |pred - real|);
KL   = mean_B( 0.5 * sum_d( mu^2 + sigma^2 - log(1e-8 + sigma^2) - 1 ) )
with sigma the network's RELU output used directly (no softplus/exp; the
1e-8 guards sigma == 0)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def seq_recon_loss(pred_seq: jax.Array, real_seq: jax.Array) -> jax.Array:
    return jnp.mean(1000.0 * jnp.abs(pred_seq.astype(jnp.float32) - real_seq.astype(jnp.float32)))


def kl_raw_sigma(mu: jax.Array, stddev: jax.Array) -> jax.Array:
    mu = mu.astype(jnp.float32)
    var = jnp.square(stddev.astype(jnp.float32))
    per_example = 0.5 * jnp.sum(jnp.square(mu) + var - jnp.log(1e-8 + var) - 1.0, axis=1)
    return jnp.mean(per_example)
