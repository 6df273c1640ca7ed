"""Stage-2 trainer: class-conditional VAE-GAN over keypoint sequences.

Counterpart of reference models/motion_generator_model.py. Same fused /
two-batch GAN step semantics as stage-1 (see train/stage1.py docstring);
losses are recon (1000x L1) + KL (raw-relu-sigma convention) + adv BCE
(reference motion_generator_model.py:277-308). No BN anywhere in stage 2,
so batch_stats stays an empty dict.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from ..configs import Config
from ..losses import (
    discriminator_loss,
    generator_adv_loss,
    kl_raw_sigma,
    seq_recon_loss,
)
from ..models import MotionGenerator, SeqDiscriminator
from ..ops import pair_fns, resolve_pair_mode
from .state import GANTrainState, make_lr_schedule, make_optimizer, make_reduce_hooks


class Stage2Trainer:
    """`reduce_axis` / `reduce_axis_size`: set by parallel/dp_step.py when
    the step runs INSIDE shard_map over that mesh axis — per-shard
    gradients are explicitly pmean'd (in config.training.dp_grad_dtype;
    'bfloat16' halves the ICI payload), metrics are pmean'd, and the VAE
    noise is drawn for the GLOBAL batch then sliced by axis index, so the
    noise stream is IDENTICAL to the whole-array jit step's. Stage 2 has
    no BN, so this mode is exactly the jit-SPMD math up to grad rounding
    and float reassociation (tested in tests/test_dp_step.py)."""

    def __init__(
        self,
        config: Config,
        reduce_axis: str | None = None,
        reduce_axis_size: int = 1,
    ):
        self.config = config
        self.reduce_axis = reduce_axis
        self.reduce_axis_size = reduce_axis_size
        m = config.model
        self.dtype = (
            jnp.bfloat16 if config.training.compute_dtype == "bfloat16" else jnp.float32
        )
        self.n_pts = m.n_pts
        self.vae_dim = m.vae_dim
        self.n_future = m.n_future_frames
        self.generator = MotionGenerator(
            n_pts=m.n_pts,
            n_future=m.n_future_frames,
            cell_info=tuple(m.cell_info),
            vae_dim=m.vae_dim,
            dtype=self.dtype,
            lstm_unroll=m.lstm_unroll,
        )
        self.discriminator = SeqDiscriminator(
            cell_info=tuple(m.cell_info), dtype=self.dtype,
            lstm_unroll=m.lstm_unroll,
        )
        self.g_opt = make_optimizer(config.training.lr)
        self.d_opt = make_optimizer(config.training.lr)
        self.lr_schedule = make_lr_schedule(config.training.lr)
        # seq-discriminator pair layout ('auto' resolves by device count)
        self.pair_mode = resolve_pair_mode(config.training.pair_batching)
        self._pair, self._unpair = pair_fns(self.pair_mode)
        self._reduce_grads, self._reduce_metrics = make_reduce_hooks(
            reduce_axis, config.training.dp_grad_dtype
        )

    def _make_noise(self, rng: jax.Array, b_local: int) -> jax.Array:
        """VAE reparameterization noise for a (possibly per-shard) batch.

        Under shard_map DP (reduce_axis set) every shard draws the noise
        for the FULL global batch from the shared key and slices its own
        rows — byte-identical to what the whole-array jit step draws, so
        the two paths are numerically comparable (tests/test_dp_step.py).
        The redundant [global_B, vae_dim] draw is a few KB per shard."""
        if self.reduce_axis is None:
            return jax.random.normal(rng, (b_local, self.vae_dim), jnp.float32)
        full = jax.random.normal(
            rng, (b_local * self.reduce_axis_size, self.vae_dim), jnp.float32
        )
        start = jax.lax.axis_index(self.reduce_axis) * b_local
        return jax.lax.dynamic_slice_in_dim(full, start, b_local)

    # ---------------------------------------------------------------- init
    def init_state(self, rng: jax.Array) -> GANTrainState:
        b, t, k = 1, self.n_future, self.n_pts
        g_rng, d_rng = jax.random.split(rng)
        # init under jit (see stage1.init_state)
        g_vars = jax.jit(
            lambda r: self.generator.init(
                r,
                jnp.zeros((b, t, 2 * k)),
                jnp.zeros((b, 2 * k)),
                jnp.zeros((b, self.config.model.n_action)),
                jnp.zeros((b, self.vae_dim)),
            )
        )(g_rng)
        d_vars = jax.jit(
            lambda r: self.discriminator.init(r, jnp.zeros((b, t, 2 * k)))
        )(d_rng)
        return GANTrainState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_vars["params"],
            d_params=d_vars["params"],
            batch_stats={},
            g_opt_state=self.g_opt.init(g_vars["params"]),
            d_opt_state=self.d_opt.init(d_vars["params"]),
        )

    # ------------------------------------------------------------- helpers
    @staticmethod
    def _flatten_batch(batch: dict):
        """keypoints [B,K,2]->first_pt [B,2K]; real_seq [B,T,K,2]->[B,T,2K].

        Flattening matches the reference's reshape convention
        (motion_generator_model.py:166-170): last axis is
        (x0,y0,x1,y1,...)."""
        kp = batch["keypoints"]
        b = kp.shape[0]
        first_pt = kp.reshape(b, -1)
        real_seq = batch["real_seq"].reshape(b, batch["real_seq"].shape[1], -1)
        return first_pt, real_seq, batch["action_code"]

    def _d_loss(self, d_params, real_seq, pred_seq):
        # 2B rows, layout per self.pair_mode (ops/batching.py)
        both = self._pair(real_seq, jax.lax.stop_gradient(pred_seq))
        logits = self.discriminator.apply({"params": d_params}, both)
        real_logit, fake_logit = self._unpair(logits)
        loss, d_real, d_fake = discriminator_loss(real_logit, fake_logit)
        return loss, (d_real, d_fake)

    def _d_update(self, state: GANTrainState, real_seq, pred_seq):
        def d_loss_fn(d_params):
            return self._d_loss(d_params, real_seq, pred_seq)

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

    def _g_loss(self, g_params, d_params, first_pt, real_seq, act, noise):
        pred_seq, mu, stddev = self.generator.apply(
            {"params": g_params}, real_seq, first_pt, act, noise
        )
        fake_logit = self.discriminator.apply({"params": d_params}, pred_seq)
        recon = seq_recon_loss(pred_seq, real_seq)
        kl = kl_raw_sigma(mu, stddev)
        adv = generator_adv_loss(fake_logit)
        return kl + recon + adv, (pred_seq, recon, kl, adv)

    def _g_update(self, state: GANTrainState, first_pt, real_seq, act, noise):
        def g_loss_fn(g_params):
            return self._g_loss(g_params, state.d_params, first_pt, real_seq, act, noise)

        (loss_g, (pred_seq, recon, kl, adv)), grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.g_params)
        grads = self._reduce_grads(grads)
        updates, g_opt_state = self.g_opt.update(grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, updates)
        state = state.replace(g_params=g_params, g_opt_state=g_opt_state)
        return state, pred_seq, {
            "loss_G": loss_g,
            "recon_loss": recon,
            "kl_loss": kl,
            "G_adv_loss": adv,
        }

    # ---------------------------------------------------------- train steps
    def train_step(
        self, state: GANTrainState, batch: dict, rng: jax.Array
    ) -> tuple[GANTrainState, dict]:
        first_pt, real_seq, act = self._flatten_batch(batch)
        noise = self._make_noise(rng, first_pt.shape[0])
        state, pred_seq, g_metrics = self._g_update(state, first_pt, real_seq, act, noise)
        state, d_metrics = self._d_update(state, real_seq, pred_seq)
        state = state.replace(step=state.step + 1)
        metrics = {**d_metrics, **g_metrics, "lr": self.lr_schedule(state.step)}
        return state, self._reduce_metrics(metrics)

    def train_step_dg(
        self, state: GANTrainState, batch: dict, rng: jax.Array
    ) -> tuple[GANTrainState, dict]:
        """One-batch step in the reference's D-then-G order
        (gan_step_mode='fused_dg'; see train/stage1.py). Uses independent
        VAE noise for the D and G forwards, like two_batch does."""
        rng_d, rng_g = jax.random.split(rng)
        first_pt, real_seq, act = self._flatten_batch(batch)
        noise_d = self._make_noise(rng_d, first_pt.shape[0])
        pred_d, _, _ = self.generator.apply(
            {"params": state.g_params}, real_seq, first_pt, act, noise_d
        )
        state, d_metrics = self._d_update(state, real_seq, pred_d)
        noise_g = self._make_noise(rng_g, first_pt.shape[0])
        state, _, g_metrics = self._g_update(state, first_pt, real_seq, act, noise_g)
        state = state.replace(step=state.step + 1)
        metrics = {**d_metrics, **g_metrics, "lr": self.lr_schedule(state.step)}
        return state, self._reduce_metrics(metrics)

    def train_step_two_batch(
        self, state: GANTrainState, batch_d: dict, batch_g: dict, rng: jax.Array
    ) -> tuple[GANTrainState, dict]:
        rng_d, rng_g = jax.random.split(rng)
        first_d, real_d, act_d = self._flatten_batch(batch_d)
        noise_d = self._make_noise(rng_d, first_d.shape[0])
        pred_d, _, _ = self.generator.apply(
            {"params": state.g_params}, real_d, first_d, act_d, noise_d
        )
        state, d_metrics = self._d_update(state, real_d, pred_d)
        first_g, real_g, act_g = self._flatten_batch(batch_g)
        noise_g = self._make_noise(rng_g, first_g.shape[0])
        state, _, g_metrics = self._g_update(state, first_g, real_g, act_g, noise_g)
        state = state.replace(step=state.step + 1)
        metrics = {**d_metrics, **g_metrics, "lr": self.lr_schedule(state.step)}
        return state, self._reduce_metrics(metrics)

    def train_step_multi(
        self, state: GANTrainState, batches: dict, rngs: jax.Array
    ) -> tuple[GANTrainState, dict]:
        """K fused steps in ONE dispatch: `lax.scan` of train_step over K
        pre-stacked batches (every array in `batches` has leading [K, B,
        ...]; `rngs` is [K] stacked PRNG keys, one per step — the same
        stream the K-single-step driver would use, so the result is
        IDENTICAL to K sequential train_step calls; tested in
        test_train.py).

        Rationale: stage-2 is latency-bound on TPU (sequential LSTM matmul
        chain, <1% MFU; docs/PERF.md) — per-step dispatch+readback is a
        real fraction of step time, and scanning K steps amortizes it the
        same way the serving daemon's depth-1 pipeline does. Metrics come
        back stacked [K]; the logging driver unstacks them."""
        def body(st, xs):
            batch, key = xs
            st, metrics = self.train_step(st, batch, key)
            return st, metrics

        return jax.lax.scan(body, state, (batches, rngs))

    def train_step_accum(
        self, state: GANTrainState, batch: dict, rng: jax.Array
    ) -> tuple[GANTrainState, dict]:
        """Gradient accumulation over config.training.grad_accum
        microbatches (see Stage1Trainer.train_step_accum). Stage 2 has no
        BN and the noise is drawn once for the full batch then split, so
        this step is NUMERICALLY the full-batch fused step (mean of
        per-micro gradients = the full-batch gradient; tested in
        test_train.py::TestGradAccum to float-reassociation precision)."""
        K = self.config.training.grad_accum
        first_pt, real_seq, act = self._flatten_batch(batch)
        b = first_pt.shape[0]
        if b % K:
            raise ValueError(
                f"batch ({b} rows) must be divisible by grad_accum={K}"
            )
        noise = self._make_noise(rng, b)

        def resh(x):
            return x.reshape(K, b // K, *x.shape[1:])

        xs = tuple(map(resh, (first_pt, real_seq, act, noise)))
        g_vg = jax.value_and_grad(self._g_loss, has_aux=True)

        def g_body(acc, micro):
            first, real, a, nz = micro
            (loss, (pred, recon, kl, adv)), grads = g_vg(
                state.g_params, state.d_params, first, real, a, nz
            )
            ms = {"loss_G": loss, "recon_loss": recon, "kl_loss": kl, "G_adv_loss": adv}
            return jax.tree.map(jnp.add, acc, grads), (pred, ms)

        zero_g = jax.tree.map(jnp.zeros_like, state.g_params)
        g_acc, (preds, g_ms) = jax.lax.scan(g_body, zero_g, xs)
        g_grads = self._reduce_grads(jax.tree.map(lambda a: a / K, g_acc))
        updates, g_opt_state = self.g_opt.update(g_grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, updates)

        d_vg = jax.value_and_grad(self._d_loss, has_aux=True)

        def d_body(acc, micro):
            real, pred = micro
            (loss_d, (d_real, d_fake)), grads = d_vg(state.d_params, real, pred)
            ms = {"loss_D": loss_d, "D_real": d_real, "D_fake": d_fake}
            return jax.tree.map(jnp.add, acc, grads), ms

        zero_d = jax.tree.map(jnp.zeros_like, state.d_params)
        d_acc, d_ms = jax.lax.scan(d_body, zero_d, (xs[1], preds))
        d_grads = self._reduce_grads(jax.tree.map(lambda a: a / K, d_acc))
        updates_d, d_opt_state = self.d_opt.update(d_grads, state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, updates_d)

        state = state.replace(
            step=state.step + 1,
            g_params=g_params,
            d_params=d_params,
            g_opt_state=g_opt_state,
            d_opt_state=d_opt_state,
        )
        metrics = {k: jnp.mean(v) for k, v in {**d_ms, **g_ms}.items()}
        metrics["lr"] = self.lr_schedule(state.step)
        return state, self._reduce_metrics(metrics)

    # ----------------------------------------------------------- evaluation
    def eval_step(self, state: GANTrainState, batch: dict, rng: jax.Array) -> dict:
        first_pt, real_seq, act = self._flatten_batch(batch)
        noise = jax.random.normal(rng, (first_pt.shape[0], self.vae_dim), jnp.float32)
        pred_seq, mu, stddev = self.generator.apply(
            {"params": state.g_params}, real_seq, first_pt, act, noise
        )
        both = self._pair(real_seq, pred_seq)
        logits = self.discriminator.apply({"params": state.d_params}, both)
        real_logit, fake_logit = self._unpair(logits)
        loss_d, d_real, d_fake = discriminator_loss(real_logit, fake_logit)
        recon = seq_recon_loss(pred_seq, real_seq)
        kl = kl_raw_sigma(mu, stddev)
        adv = generator_adv_loss(fake_logit)
        return {
            "loss_D": loss_d,
            "D_real": d_real,
            "D_fake": d_fake,
            "loss_G": kl + recon + adv,
            "recon_loss": recon,
            "kl_loss": kl,
            "G_adv_loss": adv,
        }

    def sample(self, state: GANTrainState, first_pt, act, rng) -> jax.Array:
        """Inference: z ~ N(0,1) -> decode T future keypoint frames
        (reference motion_generator_model.py:182-190 eval branch)."""
        z = jax.random.normal(rng, (first_pt.shape[0], self.vae_dim), jnp.float32)
        return self.generator.apply(
            {"params": state.g_params}, z, first_pt, act, method=self.generator.decode
        )

    # ------------------------------------------------------------ jit entry
    @functools.cached_property
    def jitted_forward(self):
        """Jitted training-forward (for summaries; eager flax apply is
        pathological through a remote-device tunnel)."""
        return jax.jit(
            lambda g_params, real_seq, first_pt, act, noise: self.generator.apply(
                {"params": g_params}, real_seq, first_pt, act, noise
            )
        )

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
