"""Train state for two-optimizer GAN training.

The reference keeps TF global variables plus two AdamOptimizers whose var
lists are split by scope-name matching ('img_discr' / 'discr' in the name;
reference models/detector_translator_model.py:190-202,
models/motion_generator_model.py:203-214). Here the split is STRUCTURAL:
generator and discriminator are separate param pytrees with separate optax
states — no name matching, no way to silently train the wrong subset.

lr schedule parity: tf.train.exponential_decay(start, step, 20000, 0.95)
with staircase=False (continuous decay), i.e. lr = start * decay^(step/N)
(reference configs/penn.yaml:13-16). Adam(beta1=0.5, beta2=0.999, eps=1e-8)
matches tf.train.AdamOptimizer defaults + the reference betas. The step
counter increments once per train step (the reference passes global_step
only to the G optimizer; detector_translator_model.py:199-202).
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
import optax
from flax import struct

from ..configs import LRConfig


@struct.dataclass
class GANTrainState:
    step: jnp.ndarray
    g_params: Any
    d_params: Any
    batch_stats: Any
    g_opt_state: Any
    d_opt_state: Any


def make_lr_schedule(lr_cfg: LRConfig) -> Callable:
    return optax.exponential_decay(
        init_value=lr_cfg.start_val,
        transition_steps=lr_cfg.step,
        decay_rate=lr_cfg.decay,
        staircase=False,
    )


def make_optimizer(lr_cfg: LRConfig) -> optax.GradientTransformation:
    return optax.adam(make_lr_schedule(lr_cfg), b1=0.5, b2=0.999, eps=1e-8)
