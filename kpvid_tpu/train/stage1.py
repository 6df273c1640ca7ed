"""Stage-1 trainer: detector + translator with VGG-perceptual + GAN losses.

Counterpart of reference models/detector_translator_model.py. TPU-first
differences:

- ONE jitted step performs both the D and G updates ('fused' mode): the
  generator forward runs once under value_and_grad; the discriminator sees
  the same batch. Update ORDER in 'fused' is G-then-D, i.e. a simultaneous
  update — BOTH players' gradients are taken against the pre-update
  opponent. This deliberately flips the reference's D-then-G order
  (detector_translator_model.py:92-94) to reuse the single G forward for
  both updates (cheapest step; docs/PERF.md). Two reference-ordered
  alternatives exist:
  * 'fused_dg' — one batch, D updates first from a no-grad G forward,
    then G trains against the UPDATED D (reference dynamics, one batch;
    costs one extra G forward).
  * 'two_batch' — full quirk Q2: the step takes two batches, updates D
    on batch one (with a no-grad G forward), then G on batch two against
    the updated D.
- BN statistics update only in the G gradient pass, mirroring the
  reference's UPDATE_OPS placement on the G op only
  (detector_translator_model.py:199-202).
- real+fake go through the PatchGAN as one 2B batch (no BN in D, so this
  is exact) instead of two separate calls.
- everything is donate-able pure state-in/state-out; sharding is applied by
  the caller (parallel/).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..configs import Config
from ..losses import (
    discriminator_loss,
    generator_adv_loss,
    perceptual_loss,
)
from ..models import ImageDiscriminator, Stage1Generator
from ..ops import pair_fns, resolve_pair_mode
from .state import GANTrainState, make_lr_schedule, make_optimizer, make_reduce_hooks


def _to_0_255(x: jax.Array) -> jax.Array:
    # reference computes the perceptual loss on [0,255] images (quirk Q7;
    # detector_translator_model.py:262-263)
    return (x + 1.0) * 127.5


class Stage1Trainer:
    """Owns the module definitions, optimizers, and pure step functions.

    `reduce_axis`: when set (by parallel/dp_step.py, which runs the step
    INSIDE shard_map over that mesh axis), the step computes per-shard
    gradients and explicitly pmean's them over the axis — in
    config.training.dp_grad_dtype, so 'bfloat16' halves the ICI payload —
    while BN runs as sync-BN over the same axis (global-batch statistics,
    matching the jit-SPMD semantics) and metrics are pmean'd. None
    (default): the ordinary whole-array step; XLA inserts any collectives.
    Parameter trees and checkpoints are identical either way."""

    def __init__(self, config: Config, vgg_params: dict, reduce_axis: str | None = None):
        self.config = config
        self.reduce_axis = reduce_axis
        m = config.model
        self.dtype = (
            jnp.bfloat16 if config.training.compute_dtype == "bfloat16" else jnp.float32
        )
        # pair-batching layout for the 4 shared-weight pair forwards:
        # 'auto' resolves by visible device count (ops/batching.py)
        self.pair_mode = resolve_pair_mode(config.training.pair_batching)
        self._pair, self._unpair = pair_fns(self.pair_mode)
        self.generator = Stage1Generator(
            n_pts=m.n_pts,
            heatmap_size=m.heatmap_size,
            heatmap_inv_std=m.heatmap_inv_std,
            encoder_filters=m.encoder_filters,
            translator_filters=m.translator_filters,
            pose_decoder_filters=m.pose_decoder_filters,
            dtype=self.dtype,
            upsample_mode=m.upsample_mode,
            pair_batching=self.pair_mode,
            bn_axis=reduce_axis,
        )
        self.discriminator = ImageDiscriminator(
            filters=m.discriminator_filters, dtype=self.dtype
        )
        self.vgg_params = jax.tree.map(jnp.asarray, vgg_params)
        self.g_opt = make_optimizer(config.training.lr)
        self.d_opt = make_optimizer(config.training.lr)
        self.lr_schedule = make_lr_schedule(config.training.lr)
        # quirk Q5 bug-compat switch: 'train' evaluates with batch-statistics
        # BN like the reference's in-training test sweeps (see configs)
        self.bn_eval_train = config.training.bn_eval_mode == "train"
        # optional remat of the frozen-VGG tower (training.remat_vgg):
        # recompute its 16 conv activations in the backward instead of
        # keeping them live (memory for FLOPs; measured in docs/PERF.md)
        def _recon(p, gt, pred):
            return perceptual_loss(
                p, gt, pred, dtype=self.dtype, pair_mode=self.pair_mode
            )

        self._recon_loss = (
            jax.checkpoint(_recon) if config.training.remat_vgg else _recon
        )
        # shard_map DP: explicit cross-replica grad/metric reduction
        # (identity when reduce_axis is None; see class docstring)
        self._reduce_grads, self._reduce_metrics = make_reduce_hooks(
            reduce_axis, config.training.dp_grad_dtype
        )

    # ---------------------------------------------------------------- init
    def init_state(self, rng: jax.Array) -> GANTrainState:
        s = self.config.model.image_size
        dummy = jnp.zeros((1, s, s, 3), jnp.float32)
        g_rng, d_rng = jax.random.split(rng)
        # init under jit: ONE compiled program instead of hundreds of eager
        # per-op compiles (order-of-magnitude faster cold start)
        g_vars = jax.jit(lambda r: self.generator.init(r, dummy, dummy, train=True))(g_rng)
        d_vars = jax.jit(lambda r: self.discriminator.init(r, dummy))(d_rng)
        return GANTrainState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_vars["params"],
            d_params=d_vars["params"],
            batch_stats=g_vars["batch_stats"],
            g_opt_state=self.g_opt.init(g_vars["params"]),
            d_opt_state=self.d_opt.init(d_vars["params"]),
        )

    # ------------------------------------------------------------- helpers
    def _g_forward(self, g_params, batch_stats, im, future_im, train: bool):
        variables = {"params": g_params, "batch_stats": batch_stats}
        if train:
            out, mutated = self.generator.apply(
                variables, im, future_im, train=True, mutable=["batch_stats"]
            )
            return out, mutated["batch_stats"]
        out = self.generator.apply(variables, im, future_im, train=False)
        return out, batch_stats

    def _d_logits(self, d_params, real, fake):
        # one 2B discriminator batch, row layout per self.pair_mode
        # (ops/batching.py); per-row logits identical in either form (no
        # cross-batch ops in the discriminator)
        both = self._pair(real, fake)
        logits = self.discriminator.apply({"params": d_params}, both)
        return self._unpair(logits)

    def _d_loss(self, d_params, real, fake):
        real_logit, fake_logit = self._d_logits(
            d_params, real, jax.lax.stop_gradient(fake)
        )
        loss, d_real, d_fake = discriminator_loss(real_logit, fake_logit)
        return loss, (d_real, d_fake)

    def _d_update(self, state: GANTrainState, real, fake):
        def d_loss_fn(d_params):
            return self._d_loss(d_params, real, fake)

        (loss_d, (d_real, d_fake)), grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params
        )
        grads = self._reduce_grads(grads)
        updates, d_opt_state = self.d_opt.update(grads, state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, updates)
        return state.replace(d_params=d_params, d_opt_state=d_opt_state), {
            "loss_D": loss_d,
            "D_real": d_real,
            "D_fake": d_fake,
        }

    def _g_loss(self, g_params, d_params, batch_stats, im, future_im):
        out, new_stats = self._g_forward(g_params, batch_stats, im, future_im, train=True)
        fake = out["final"]
        fake_logit = self.discriminator.apply({"params": d_params}, fake)
        recon = self._recon_loss(
            self.vgg_params, _to_0_255(future_im), _to_0_255(fake)
        )
        adv = generator_adv_loss(fake_logit)
        return recon + adv, (fake, new_stats, recon, adv)

    def _g_update(self, state: GANTrainState, im, future_im):
        def g_loss_fn(g_params):
            return self._g_loss(g_params, state.d_params, state.batch_stats, im, future_im)

        (loss_g, (fake, new_stats, recon, adv)), grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.g_params)
        # sync-BN (bn_axis=reduce_axis) already makes new_stats identical
        # across shards; only grads need the explicit cross-replica mean
        grads = self._reduce_grads(grads)
        updates, g_opt_state = self.g_opt.update(grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, updates)
        state = state.replace(
            g_params=g_params,
            g_opt_state=g_opt_state,
            batch_stats=new_stats,
        )
        return state, fake, {"loss_G": loss_g, "reconstruction_metric": recon, "G_adv_loss": adv}

    # ---------------------------------------------------------- train steps
    def train_step(self, state: GANTrainState, batch: dict) -> tuple[GANTrainState, dict]:
        """Fused D+G update on one batch (gan_step_mode='fused')."""
        im, future_im = batch["image"], batch["future_image"]
        state, fake, g_metrics = self._g_update(state, im, future_im)
        state, d_metrics = self._d_update(state, future_im, fake)
        state = state.replace(step=state.step + 1)
        metrics = {**d_metrics, **g_metrics, "lr": self.lr_schedule(state.step)}
        return state, self._reduce_metrics(metrics)

    def train_step_dg(self, state: GANTrainState, batch: dict) -> tuple[GANTrainState, dict]:
        """One-batch step in the reference's D-then-G order
        (gan_step_mode='fused_dg'): D updates from a no-grad G forward
        (mutated BN stats discarded, mirroring UPDATE_OPS on the G op only),
        then G trains against the UPDATED D."""
        im, future_im = batch["image"], batch["future_image"]
        out, _ = self._g_forward(state.g_params, state.batch_stats, im, future_im, True)
        state, d_metrics = self._d_update(state, future_im, out["final"])
        state, _, g_metrics = self._g_update(state, im, future_im)
        state = state.replace(step=state.step + 1)
        metrics = {**d_metrics, **g_metrics, "lr": self.lr_schedule(state.step)}
        return state, self._reduce_metrics(metrics)

    def train_step_two_batch(
        self, state: GANTrainState, batch_d: dict, batch_g: dict
    ) -> tuple[GANTrainState, dict]:
        """Reference-faithful two-batch semantics (quirk Q2): D sees batch_d
        with a no-grad G forward; G then trains on batch_g against the
        updated D."""
        out_d, _ = self._g_forward(
            state.g_params, state.batch_stats, batch_d["image"], batch_d["future_image"], True
        )
        state, d_metrics = self._d_update(state, batch_d["future_image"], out_d["final"])
        state, _, g_metrics = self._g_update(state, batch_g["image"], batch_g["future_image"])
        state = state.replace(step=state.step + 1)
        metrics = {**d_metrics, **g_metrics, "lr": self.lr_schedule(state.step)}
        return state, self._reduce_metrics(metrics)

    def train_step_multi(
        self, state: GANTrainState, batches: dict
    ) -> tuple[GANTrainState, dict]:
        """K fused D+G steps in ONE dispatch: `lax.scan` of train_step over
        K pre-stacked batches (every array in `batches` is [K, B, ...]).
        Equivalent to K sequential train_step calls up to XLA fusion
        reassociation (the scanned body compiles with different conv/VGG
        fusions than the standalone step; losses match to 1e-5 relative and
        params stay inside the Adam update envelope — tested in
        test_train.py; stage-2's variant is exact in practice).
        Stage-1 analog of Stage2Trainer.train_step_multi:
        amortizes per-dispatch overhead at the cost of K-step logging /
        checkpoint granularity. The stage-1 step is compute-bound (39-170
        ms vs ~1.3 ms dispatch; docs/PERF.md "stage-1 multi-step"), so the
        win is small — opt-in API; train.py keeps the reference-faithful
        single-step loop. Metrics come back stacked [K]."""

        def body(st, one_batch):
            return self.train_step(st, one_batch)

        return jax.lax.scan(body, state, batches)

    def train_step_accum(
        self, state: GANTrainState, batch: dict
    ) -> tuple[GANTrainState, dict]:
        """Gradient accumulation: ONE fused D+G update from
        config.training.grad_accum microbatches of batch_size/K rows —
        activation memory of a K-times-smaller forward at the same global
        batch (no reference counterpart; single device, fixed batch).

        Semantics match train_step's 'fused' convention: every micro's G
        loss is taken against the PRE-update D and every micro's D loss
        against the PRE-update G's fakes; gradients are averaged over the
        micros (mean of per-micro means = the full-batch mean), then one
        Adam update each. Stage-2's variant is numerically the full-batch
        step (no BN; tested). Stage-1's BN differs by design: each micro
        normalizes with its OWN statistics and the running stats apply
        the EMA K times per step (the standard grad-accum BN behavior) —
        so K>1 is a deliberate approximation here, like everywhere else.
        Composes with the shard_map DP step: the explicit cross-replica
        reduction happens ONCE on the averaged grads, not per micro
        (parallel/dp_step.py routes 'fused' here when grad_accum > 1)."""
        K = self.config.training.grad_accum
        b = batch["image"].shape[0]
        if b % K:
            raise ValueError(
                f"batch ({b} rows) must be divisible by grad_accum={K}"
            )
        micros = jax.tree.map(lambda x: x.reshape(K, b // K, *x.shape[1:]), batch)

        g_vg = jax.value_and_grad(self._g_loss, has_aux=True)

        def g_body(carry, micro):
            acc, stats = carry
            (loss, (fake, new_stats, recon, adv)), grads = g_vg(
                state.g_params, state.d_params, stats,
                micro["image"], micro["future_image"],
            )
            acc = jax.tree.map(jnp.add, acc, grads)
            ms = {"loss_G": loss, "reconstruction_metric": recon, "G_adv_loss": adv}
            return (acc, new_stats), (fake, ms)

        zero_g = jax.tree.map(jnp.zeros_like, state.g_params)
        (g_acc, new_stats), (fakes, g_ms) = jax.lax.scan(
            g_body, (zero_g, state.batch_stats), micros
        )
        g_grads = self._reduce_grads(jax.tree.map(lambda a: a / K, g_acc))
        updates, g_opt_state = self.g_opt.update(g_grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, updates)

        d_vg = jax.value_and_grad(self._d_loss, has_aux=True)

        def d_body(acc, xs):
            micro, fake = xs
            (loss_d, (d_real, d_fake)), grads = d_vg(
                state.d_params, micro["future_image"], fake
            )
            ms = {"loss_D": loss_d, "D_real": d_real, "D_fake": d_fake}
            return jax.tree.map(jnp.add, acc, grads), ms

        zero_d = jax.tree.map(jnp.zeros_like, state.d_params)
        d_acc, d_ms = jax.lax.scan(d_body, zero_d, (micros, fakes))
        d_grads = self._reduce_grads(jax.tree.map(lambda a: a / K, d_acc))
        updates_d, d_opt_state = self.d_opt.update(d_grads, state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, updates_d)

        state = state.replace(
            step=state.step + 1,
            g_params=g_params,
            d_params=d_params,
            batch_stats=new_stats,
            g_opt_state=g_opt_state,
            d_opt_state=d_opt_state,
        )
        metrics = {k: jnp.mean(v) for k, v in {**d_ms, **g_ms}.items()}
        metrics["lr"] = self.lr_schedule(state.step)
        return state, self._reduce_metrics(metrics)

    # ----------------------------------------------------------- evaluation
    def eval_step(self, state: GANTrainState, batch: dict) -> dict:
        """Losses + fidelity metrics on a test batch. BN mode follows
        config.training.bn_eval_mode: 'inference' (default; a deliberate fix
        of reference quirk Q5) normalizes with the moving averages; 'train'
        replicates the reference's train-mode BN test sweeps for 1:1 loss
        comparison (mutated stats are discarded — eval never updates them,
        matching the reference's UPDATE_OPS-on-G-op-only placement)."""
        im, future_im = batch["image"], batch["future_image"]
        out, _ = self._g_forward(
            state.g_params, state.batch_stats, im, future_im, self.bn_eval_train
        )
        fake = out["final"]
        real_logit, fake_logit = self._d_logits(state.d_params, future_im, fake)
        loss_d, d_real, d_fake = discriminator_loss(real_logit, fake_logit)
        recon = perceptual_loss(
            self.vgg_params, _to_0_255(future_im), _to_0_255(fake),
            dtype=self.dtype, pair_mode=self.pair_mode,
        )
        adv = generator_adv_loss(fake_logit)
        mse = jnp.mean(jnp.square(jnp.clip(fake, -1, 1) - future_im))
        psnr = 10.0 * jnp.log10(4.0 / jnp.maximum(mse, 1e-10))
        return {
            "loss_D": loss_d,
            "D_real": d_real,
            "D_fake": d_fake,
            "loss_G": recon + adv,
            "reconstruction_metric": recon,
            "G_adv_loss": adv,
            "psnr": psnr,
        }

    # ------------------------------------------------------------ jit entry
    @functools.cached_property
    def jitted_train_step(self):
        return jax.jit(self.train_step, donate_argnums=(0,))

    @functools.cached_property
    def jitted_train_step_dg(self):
        return jax.jit(self.train_step_dg, donate_argnums=(0,))

    @functools.cached_property
    def jitted_train_step_two_batch(self):
        return jax.jit(self.train_step_two_batch, donate_argnums=(0,))

    @functools.cached_property
    def jitted_train_step_multi(self):
        return jax.jit(self.train_step_multi, donate_argnums=(0,))

    @functools.cached_property
    def jitted_train_step_accum(self):
        return jax.jit(self.train_step_accum, donate_argnums=(0,))

    @functools.cached_property
    def jitted_eval_step(self):
        return jax.jit(self.eval_step)

    @functools.cached_property
    def _jitted_infer_forward(self):
        # BN mode follows config.training.summary_bn_mode: 'train' renders
        # from the train-mode graph like the reference's image summaries
        # (detector_translator_model.py:205-244); mutated stats discarded.
        train = self.config.training.summary_bn_mode == "train"
        return jax.jit(
            lambda g_params, batch_stats, im, fut: self._g_forward(
                g_params, batch_stats, im, fut, train
            )[0]
        )

    def visualize(self, state: GANTrainState, batch: dict) -> dict[str, Any]:
        """Jitted forward returning image tensors for summaries
        (counterpart of reference _define_summary image grids). Must be
        jitted: an eager flax apply dispatches hundreds of individual ops,
        which is pathological through a remote-device tunnel."""
        return self._jitted_infer_forward(
            state.g_params, state.batch_stats, batch["image"], batch["future_image"]
        )
