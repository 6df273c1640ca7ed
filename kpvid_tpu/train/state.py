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
    """Reference schedule x the DP batch-scaling knobs.

    Base: tf.train.exponential_decay(start*scale, 20000, 0.95,
    staircase=False). `warmup_steps` multiplies the base by
    min(1, (step+1)/warmup) — a linear ramp to the scaled value with the
    decay clock running on the full step count (the Goyal et al. linear
    scaling + warmup recipe for large-batch DP; configs/config.py
    LRConfig). Defaults (scale=1, warmup=0) reproduce the reference
    schedule bit-for-bit."""
    base = optax.exponential_decay(
        init_value=lr_cfg.start_val * lr_cfg.scale,
        transition_steps=lr_cfg.step,
        decay_rate=lr_cfg.decay,
        staircase=False,
    )
    if lr_cfg.warmup_steps <= 0:
        return base
    warmup = float(lr_cfg.warmup_steps)

    def schedule(step):
        ramp = jnp.minimum(1.0, (jnp.asarray(step, jnp.float32) + 1.0) / warmup)
        return base(step) * ramp

    return schedule


def make_optimizer(lr_cfg: LRConfig) -> optax.GradientTransformation:
    return optax.adam(make_lr_schedule(lr_cfg), b1=0.5, b2=0.999, eps=1e-8)


def make_reduce_hooks(reduce_axis: str | None, grad_dtype: str):
    """(reduce_grads, reduce_metrics) for shard_map data parallelism.

    With `reduce_axis=None` both are identity (the ordinary jit-SPMD step:
    XLA inserts the collectives itself). With an axis name — the trainers'
    step functions then run INSIDE shard_map (parallel/dp_step.py) — the
    per-shard gradients are explicitly cross-replica averaged in
    `grad_dtype` ('bfloat16' halves the all-reduce payload, the dominant
    ICI cost; docs/PERF.md "Multi-chip scaling") and cast back to the
    param dtype for the replicated f32 Adam update; scalar metrics (local
    batch means) are pmean'd in f32."""
    if reduce_axis is None:
        return (lambda g: g), (lambda m: m)
    import jax

    rdt = jnp.bfloat16 if grad_dtype == "bfloat16" else jnp.float32

    def reduce_grads(grads):
        return jax.tree.map(
            lambda g: jax.lax.pmean(g.astype(rdt), reduce_axis).astype(g.dtype),
            grads,
        )

    def reduce_metrics(metrics):
        return {k: jax.lax.pmean(v, reduce_axis) for k, v in metrics.items()}

    return reduce_grads, reduce_metrics
