#!/usr/bin/env python
"""Stage-1 train-step component breakdown (TPU, production config).

Times jitted sub-programs of the stage-1 step in isolation — generator
forward (inference), generator forward+backward with and without the VGG
perceptual term, discriminator update — to show where the 38 ms/step goes.
Isolated programs exclude cross-component fusion; ratios matter.
Results table: docs/PERF.md "Training throughput".
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from kpvid_tpu.utils.cache import enable_compilation_cache


@partial(jax.jit, static_argnums=(1,))
def _rand(key, shape):
    return jax.random.uniform(key, shape, jnp.float32, -1.0, 1.0)


def sync(x):
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def timeit(fn, *args, iters=20):
    for _ in range(2):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    enable_compilation_cache()
    from kpvid_tpu.configs import Config
    from kpvid_tpu.losses import (
        generator_adv_loss,
        perceptual_loss,
        synthesize_vgg19_params,
    )
    from kpvid_tpu.train.stage1 import Stage1Trainer, _to_0_255

    cfg = Config()
    bs, s = cfg.training.batch_size, cfg.model.image_size
    tr = Stage1Trainer(cfg, synthesize_vgg19_params())
    state = tr.init_state(jax.random.PRNGKey(0))
    sync(state.g_params)
    im = _rand(jax.random.PRNGKey(1), (bs, s, s, 3))
    fut = _rand(jax.random.PRNGKey(2), (bs, s, s, 3))
    sync(fut)

    rows = []

    # full step (the production program)
    rows.append(("train_step (D+G, full)", timeit(
        jax.jit(tr.train_step), state, {"image": im, "future_image": fut})))

    # G forward only (inference mode, no grads)
    fwd = jax.jit(lambda p, b, a, c: tr._g_forward(p, b, a, c, False)[0])
    rows.append(("G forward (inference)", timeit(
        fwd, state.g_params, state.batch_stats, im, fut)))

    # G forward+backward, recon(VGG)+adv loss (the g_update core, no optax)
    def g_fb(g_params, batch_stats, d_params, a, c):
        def loss_fn(p):
            out, _ = tr._g_forward(p, batch_stats, a, c, True)
            fake = out["final"]
            logit = tr.discriminator.apply({"params": d_params}, fake)
            recon = perceptual_loss(
                tr.vgg_params, _to_0_255(c), _to_0_255(fake), dtype=tr.dtype
            )
            return recon + generator_adv_loss(logit)

        return jax.grad(loss_fn)(g_params)

    rows.append(("G fwd+bwd (VGG recon + adv)", timeit(
        jax.jit(g_fb), state.g_params, state.batch_stats, state.d_params, im, fut)))

    # same but L1 pixel loss instead of VGG -> isolates the VGG share
    def g_fb_l1(g_params, batch_stats, d_params, a, c):
        def loss_fn(p):
            out, _ = tr._g_forward(p, batch_stats, a, c, True)
            fake = out["final"]
            logit = tr.discriminator.apply({"params": d_params}, fake)
            return jnp.mean(jnp.abs(fake - c)) + generator_adv_loss(logit)

        return jax.grad(loss_fn)(g_params)

    rows.append(("G fwd+bwd (L1 instead of VGG)", timeit(
        jax.jit(g_fb_l1), state.g_params, state.batch_stats, state.d_params, im, fut)))

    # D update alone
    rows.append(("D update (PatchGAN fwd+bwd+adam)", timeit(
        jax.jit(lambda st, r, f: tr._d_update(st, r, f)[0].d_params),
        state, fut, im)))

    print(f"\nstage-1 components at batch {bs}, {s}^2, "
          f"{cfg.training.compute_dtype}:")
    for name, dt in rows:
        print(f"{name:36s} {dt*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
