"""End-to-end train-step tests on tiny configs (CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kpvid_tpu.configs import Config, ModelConfig, TrainingConfig
from kpvid_tpu.losses import synthesize_vgg19_params
from kpvid_tpu.train.stage1 import Stage1Trainer
from kpvid_tpu.train.stage2 import Stage2Trainer


def tiny_config(**model_kw) -> Config:
    # narrow widths (wired in round 4): same graph structure, ~100x less
    # FLOPs than the reference widths on the 1-core CI host
    model_kw.setdefault("encoder_filters", 8)
    model_kw.setdefault("translator_filters", 16)
    model_kw.setdefault("pose_decoder_filters", 16)
    model_kw.setdefault("discriminator_filters", 8)
    model = ModelConfig(
        n_pts=6,
        n_action=4,
        cell_info=(32, 32),
        vae_dim=8,
        image_size=32,
        heatmap_size=8,
        n_future_frames=8,
        **model_kw,
    )
    training = TrainingConfig(batch_size=2, compute_dtype="float32")
    return Config(model=model, training=training).validate()


def _tree_l2_diff(a, b):
    return sum(
        float(jnp.sum(jnp.square(x - y))) for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


@pytest.fixture(scope="module")
def s1():
    cfg = tiny_config()
    trainer = Stage1Trainer(cfg, synthesize_vgg19_params(max_width=16))
    state = trainer.init_state(jax.random.PRNGKey(0))
    return trainer, state


@pytest.fixture(scope="module")
def batch(rng_mod=np.random.default_rng(1)):
    return {
        "image": jnp.asarray(rng_mod.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32),
        "future_image": jnp.asarray(rng_mod.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32),
    }


class TestStage1:
    def test_fused_step_updates_everything(self, s1, batch):
        trainer, state = s1
        new_state, metrics = trainer.jitted_train_step(
            jax.tree.map(jnp.copy, state), batch
        )
        for k in ("loss_D", "loss_G", "reconstruction_metric", "G_adv_loss", "lr"):
            assert np.isfinite(float(metrics[k])), k
        assert int(new_state.step) == 1
        assert _tree_l2_diff(new_state.g_params, state.g_params) > 0
        assert _tree_l2_diff(new_state.d_params, state.d_params) > 0
        # BN stats updated in the G pass
        assert _tree_l2_diff(new_state.batch_stats, state.batch_stats) > 0

    def test_two_batch_mode(self, s1, batch):
        trainer, state = s1
        new_state, metrics = trainer.jitted_train_step_two_batch(
            jax.tree.map(jnp.copy, state), batch, batch
        )
        assert int(new_state.step) == 1
        assert np.isfinite(float(metrics["loss_G"]))

    def test_multi_step_matches_sequential(self, s1):
        """train_step_multi (lax.scan of K fused steps in ONE dispatch)
        matches K sequential train_step calls: losses to 1e-5 relative,
        params within the Adam update envelope (3*lr per step element-wise
        — the scanned body compiles with different conv/VGG fusions than
        the standalone step, and Adam amplifies ulp-level grad diffs where
        gradients are noise-dominated; stage-2's variant is exact). The
        stage-1 analog of the stage-2 dispatch-amortization program
        (docs/PERF.md "stage-1 multi-step")."""
        cfg = tiny_config()
        trainer = Stage1Trainer(cfg, synthesize_vgg19_params(max_width=16))
        state = trainer.init_state(jax.random.PRNGKey(2))
        K = 3
        gen = np.random.default_rng(5)
        batches = {
            "image": jnp.asarray(gen.uniform(-1, 1, (K, 2, 32, 32, 3)), jnp.float32),
            "future_image": jnp.asarray(
                gen.uniform(-1, 1, (K, 2, 32, 32, 3)), jnp.float32
            ),
        }

        seq_state = jax.tree.map(jnp.copy, state)
        seq_metrics = []
        for k in range(K):
            batch_k = jax.tree.map(lambda x: x[k], batches)
            seq_state, m = jax.jit(trainer.train_step)(seq_state, batch_k)
            seq_metrics.append(m)

        multi_state, multi_metrics = trainer.jitted_train_step_multi(
            jax.tree.map(jnp.copy, state), batches
        )
        assert int(multi_state.step) == K
        for k in range(K):
            for name in ("loss_D", "loss_G", "reconstruction_metric", "G_adv_loss"):
                np.testing.assert_allclose(
                    float(multi_metrics[name][k]), float(seq_metrics[k][name]),
                    rtol=1e-5, err_msg=f"step {k} {name}",
                )
        # Adam bias correction lets early |update| slightly exceed lr
        envelope = 3.0 * cfg.training.lr.start_val * K
        for name, a, b in (
            ("g_params", multi_state.g_params, seq_state.g_params),
            ("d_params", multi_state.d_params, seq_state.d_params),
            ("batch_stats", multi_state.batch_stats, seq_state.batch_stats),
        ):
            diff = max(
                float(jnp.max(jnp.abs(x - y)))
                for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
            )
            assert diff < envelope, (name, diff, envelope)

    @pytest.mark.slow
    def test_fused_dg_matches_two_batch_on_same_batch(self, s1, batch):
        """gan_step_mode='fused_dg' is the reference's D-then-G order on a
        single batch: feeding two_batch the SAME batch twice must produce
        the identical update (they are the same op sequence)."""
        trainer, state = s1
        st_dg, m_dg = jax.jit(trainer.train_step_dg)(
            jax.tree.map(jnp.copy, state), batch
        )
        st_tb, m_tb = jax.jit(trainer.train_step_two_batch)(
            jax.tree.map(jnp.copy, state), batch, batch
        )
        for k in ("loss_D", "loss_G", "D_real", "D_fake"):
            np.testing.assert_allclose(float(m_dg[k]), float(m_tb[k]), rtol=1e-6, err_msg=k)
        assert _tree_l2_diff(st_dg.g_params, st_tb.g_params) < 1e-10
        assert _tree_l2_diff(st_dg.d_params, st_tb.d_params) < 1e-10

    def test_fused_dg_g_trains_against_updated_d(self, s1, batch):
        """Order check: in 'fused_dg' the G update sees the post-update D,
        so its adv loss differs from 'fused' (where G sees pre-update D);
        the D update itself sees the same pre-update G either way."""
        trainer, state = s1
        _, m_dg = jax.jit(trainer.train_step_dg)(jax.tree.map(jnp.copy, state), batch)
        _, m_f = jax.jit(trainer.train_step)(jax.tree.map(jnp.copy, state), batch)
        assert not np.isclose(float(m_dg["G_adv_loss"]), float(m_f["G_adv_loss"]))
        # ...while D's update is against the pre-update G in both modes
        np.testing.assert_allclose(
            float(m_dg["loss_D"]), float(m_f["loss_D"]), rtol=1e-5
        )

    def test_eval_step(self, s1, batch):
        trainer, state = s1
        metrics = trainer.jitted_eval_step(state, batch)
        assert np.isfinite(float(metrics["psnr"]))
        assert float(metrics["reconstruction_metric"]) > 0

    @pytest.mark.slow
    def test_bn_eval_mode_train_matches_q5_semantics(self, s1, batch):
        """bn_eval_mode='train' (quirk Q5 bug-compat) evaluates with the
        batch's own BN statistics — different numbers from inference-mode
        BN, but identical to the train-mode forward's output."""
        from dataclasses import replace as dc_replace

        trainer, state = s1
        cfg_q5 = dc_replace(
            trainer.config,
            training=dc_replace(trainer.config.training, bn_eval_mode="train"),
        )
        trainer_q5 = Stage1Trainer(cfg_q5, synthesize_vgg19_params(max_width=16))
        m_inf = trainer.jitted_eval_step(state, batch)
        m_q5 = trainer_q5.jitted_eval_step(state, batch)
        assert not np.isclose(
            float(m_inf["reconstruction_metric"]), float(m_q5["reconstruction_metric"])
        )
        # the q5-mode recon equals what the train-mode forward produces
        out_train, _ = trainer._g_forward(
            state.g_params, state.batch_stats, batch["image"], batch["future_image"], True
        )
        from kpvid_tpu.losses import perceptual_loss
        from kpvid_tpu.train.stage1 import _to_0_255

        want = perceptual_loss(
            trainer.vgg_params,
            _to_0_255(batch["future_image"]),
            _to_0_255(out_train["final"]),
            dtype=trainer.dtype,
        )
        np.testing.assert_allclose(
            float(m_q5["reconstruction_metric"]), float(want), rtol=1e-5
        )

    @pytest.mark.slow
    def test_fused_upsample_mode_trains_equivalently(self, s1, batch):
        """model.upsample_mode='fused' is a config-selectable training
        formulation: one train step must produce metrics matching the
        default 'tf1' form (same params; only fp reassociation differs)."""
        trainer, state = s1
        cfg = tiny_config(upsample_mode="fused")
        tr_f = Stage1Trainer(cfg, synthesize_vgg19_params(max_width=16))
        _, m_ref = jax.jit(trainer.train_step)(jax.tree.map(jnp.copy, state), batch)
        _, m_fused = jax.jit(tr_f.train_step)(jax.tree.map(jnp.copy, state), batch)
        for k in ("loss_G", "loss_D", "reconstruction_metric"):
            np.testing.assert_allclose(
                float(m_fused[k]), float(m_ref[k]), rtol=1e-4, err_msg=k
            )

    @pytest.mark.slow
    def test_remat_vgg_trains_equivalently(self, s1, batch):
        """training.remat_vgg=True recomputes the VGG tower in the
        backward — identical math, different schedule."""
        trainer, state = s1
        cfg = tiny_config()
        cfg.training.remat_vgg = True
        tr_r = Stage1Trainer(cfg, synthesize_vgg19_params(max_width=16))
        _, m_ref = jax.jit(trainer.train_step)(jax.tree.map(jnp.copy, state), batch)
        _, m_r = jax.jit(tr_r.train_step)(jax.tree.map(jnp.copy, state), batch)
        for k in ("loss_G", "loss_D", "reconstruction_metric"):
            np.testing.assert_allclose(
                float(m_r[k]), float(m_ref[k]), rtol=1e-5, err_msg=k
            )

    @pytest.mark.slow
    def test_bf16_train_step(self, batch):
        """The bf16 compute path must differentiate end-to-end (regression:
        VGG max-pool init and conv preferred_element_type once broke its
        VJP)."""
        cfg = tiny_config()
        cfg.training.compute_dtype = "bfloat16"
        trainer = Stage1Trainer(cfg, synthesize_vgg19_params(max_width=16))
        state = trainer.init_state(jax.random.PRNGKey(0))
        new_state, metrics = trainer.jitted_train_step(
            jax.tree.map(jnp.copy, state), batch
        )
        assert np.isfinite(float(metrics["loss_G"]))
        assert _tree_l2_diff(new_state.g_params, state.g_params) > 0

    def test_lr_schedule_parity(self, s1):
        """lr = start * decay^(step/N), continuous (reference
        tf.train.exponential_decay staircase=False)."""
        trainer, _ = s1
        lr_cfg = trainer.config.training.lr
        for step in (0, 10_000, 20_000, 50_000):
            expect = lr_cfg.start_val * lr_cfg.decay ** (step / lr_cfg.step)
            assert float(trainer.lr_schedule(step)) == pytest.approx(expect, rel=1e-5)

    def test_lr_scale_and_warmup(self):
        """DP batch-scaling knobs (lr.scale / lr.warmup_steps; no reference
        equivalent): linear warmup to the k-scaled value, decay clock on
        the full step count; defaults reproduce the reference schedule."""
        from kpvid_tpu.configs import LRConfig
        from kpvid_tpu.train.state import make_lr_schedule

        base_cfg = LRConfig()
        scaled = make_lr_schedule(LRConfig(scale=8.0, warmup_steps=500))
        base = make_lr_schedule(base_cfg)
        # mid-warmup: ramp factor (step+1)/warmup on the scaled decay curve
        got = float(scaled(249))
        expect = 8.0 * float(base(249)) * (250 / 500)
        assert got == pytest.approx(expect, rel=1e-5)
        # past warmup: exactly k x the reference schedule
        for step in (500, 10_000, 50_000):
            assert float(scaled(step)) == pytest.approx(8.0 * float(base(step)), rel=1e-5)
        # warmup without scale ramps to the reference value
        w = make_lr_schedule(LRConfig(warmup_steps=100))
        assert float(w(0)) == pytest.approx(float(base(0)) / 100, rel=1e-5)
        assert float(w(1_000)) == pytest.approx(float(base(1_000)), rel=1e-5)
        # validation
        from kpvid_tpu.configs import Config, TrainingConfig

        with pytest.raises(ValueError, match="lr.scale"):
            Config(training=TrainingConfig(lr=LRConfig(scale=0.0))).validate()
        with pytest.raises(ValueError, match="warmup_steps"):
            Config(training=TrainingConfig(lr=LRConfig(warmup_steps=-1))).validate()


class TestStage2:
    @pytest.fixture(scope="class")
    def s2(self):
        cfg = tiny_config()
        trainer = Stage2Trainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        return trainer, state

    @pytest.fixture(scope="class")
    def seq_batch(self):
        rng = np.random.default_rng(2)
        return {
            "image": jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32),
            "keypoints": jnp.asarray(rng.uniform(-1, 1, (2, 6, 2)), jnp.float32),
            "real_seq": jnp.asarray(rng.uniform(-1, 1, (2, 8, 6, 2)), jnp.float32),
            "action_code": jax.nn.one_hot(jnp.asarray([0, 3]), 4),
        }

    def test_fused_step(self, s2, seq_batch):
        trainer, state = s2
        new_state, metrics = trainer.jitted_train_step(
            jax.tree.map(jnp.copy, state), seq_batch, jax.random.PRNGKey(1)
        )
        for k in ("loss_D", "loss_G", "recon_loss", "kl_loss", "G_adv_loss"):
            assert np.isfinite(float(metrics[k])), k
        assert _tree_l2_diff(new_state.g_params, state.g_params) > 0
        assert _tree_l2_diff(new_state.d_params, state.d_params) > 0

    def test_eval_and_sample(self, s2, seq_batch):
        trainer, state = s2
        metrics = trainer.jitted_eval_step(state, seq_batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["loss_G"]))
        first_pt = seq_batch["keypoints"].reshape(2, -1)
        pred = trainer.sample(state, first_pt, seq_batch["action_code"], jax.random.PRNGKey(3))
        assert pred.shape == (2, 8, 12)
        assert np.all(np.abs(np.asarray(pred)) < 1.0)

    def test_two_batch_step(self, s2, seq_batch):
        trainer, state = s2
        new_state, metrics = trainer.jitted_train_step_two_batch(
            jax.tree.map(jnp.copy, state), seq_batch, seq_batch, jax.random.PRNGKey(4)
        )
        assert int(new_state.step) == 1
        assert np.isfinite(float(metrics["loss_G"]))

    @pytest.mark.slow
    def test_multi_step_matches_sequential(self, s2, seq_batch):
        """train_step_multi (lax.scan of K steps in ONE dispatch) is
        IDENTICAL to K sequential train_step calls given the same per-step
        rng stream (the dispatch-amortization program; docs/PERF.md
        "stage-2 multi-step")."""
        trainer, state = s2
        K = 3
        rng = np.random.default_rng(7)
        batches = {
            "image": jnp.asarray(rng.uniform(-1, 1, (K, 2, 32, 32, 3)), jnp.float32),
            "keypoints": jnp.asarray(rng.uniform(-1, 1, (K, 2, 6, 2)), jnp.float32),
            "real_seq": jnp.asarray(rng.uniform(-1, 1, (K, 2, 8, 6, 2)), jnp.float32),
            "action_code": jax.nn.one_hot(jnp.asarray([[0, 3], [1, 2], [3, 0]]), 4),
        }
        keys = jax.random.split(jax.random.PRNGKey(11), K)

        seq_state = jax.tree.map(jnp.copy, state)
        seq_metrics = []
        for k in range(K):
            batch_k = jax.tree.map(lambda x: x[k], batches)
            seq_state, m = jax.jit(trainer.train_step)(seq_state, batch_k, keys[k])
            seq_metrics.append(m)

        multi_state, multi_metrics = trainer.jitted_train_step_multi(
            jax.tree.map(jnp.copy, state), batches, keys
        )
        assert int(multi_state.step) == K
        for k in range(K):
            for name in ("loss_D", "loss_G", "recon_loss", "kl_loss"):
                np.testing.assert_allclose(
                    float(multi_metrics[name][k]), float(seq_metrics[k][name]),
                    rtol=1e-5, err_msg=f"step {k} {name}",
                )
        assert _tree_l2_diff(multi_state.g_params, seq_state.g_params) < 1e-9
        assert _tree_l2_diff(multi_state.d_params, seq_state.d_params) < 1e-9

    @pytest.mark.slow
    def test_fused_dg_matches_two_batch_on_same_batch(self, s2, seq_batch):
        """Same-batch two_batch and fused_dg are the identical op sequence
        (including the rng split convention), so updates must agree."""
        trainer, state = s2
        key = jax.random.PRNGKey(5)
        st_dg, m_dg = jax.jit(trainer.train_step_dg)(
            jax.tree.map(jnp.copy, state), seq_batch, key
        )
        st_tb, m_tb = jax.jit(trainer.train_step_two_batch)(
            jax.tree.map(jnp.copy, state), seq_batch, seq_batch, key
        )
        for k in ("loss_D", "loss_G", "recon_loss", "kl_loss"):
            np.testing.assert_allclose(float(m_dg[k]), float(m_tb[k]), rtol=1e-6, err_msg=k)
        assert _tree_l2_diff(st_dg.g_params, st_tb.g_params) < 1e-10
        assert _tree_l2_diff(st_dg.d_params, st_tb.d_params) < 1e-10


class TestPairBatchingEquivalence:
    """training.pair_batching 'interleave' vs 'concat' are graph-level
    alternatives over identical per-row math (ops/batching.py): single-chip
    runs resolve 'auto' to the faster concat form, mesh runs to the
    shard-aligned interleave form — one step must agree to BN-summation-
    order tolerance, and init states must be structurally identical (so
    checkpoints are interchangeable across modes)."""

    def _trainers(self, mode_a, mode_b, stage):
        import dataclasses

        cfg = tiny_config()
        vgg = synthesize_vgg19_params(max_width=16)
        out = []
        for mode in (mode_a, mode_b):
            c = dataclasses.replace(
                cfg, training=dataclasses.replace(cfg.training, pair_batching=mode)
            ).validate()
            out.append(Stage1Trainer(c, vgg) if stage == 1 else Stage2Trainer(c))
        return out

    def test_stage1_step_matches(self, batch):
        ta, tb = self._trainers("interleave", "concat", stage=1)
        assert (ta.pair_mode, tb.pair_mode) == ("interleave", "concat")
        state = ta.init_state(jax.random.PRNGKey(0))
        state_b = tb.init_state(jax.random.PRNGKey(0))
        # same init: params/stats don't depend on the pair row order
        assert _tree_l2_diff(state, state_b) == 0.0
        sa, ma = jax.jit(ta.train_step)(jax.tree.map(jnp.copy, state), batch)
        sb, mb = jax.jit(tb.train_step)(state_b, batch)
        for k in sorted(ma):
            np.testing.assert_allclose(
                float(ma[k]), float(mb[k]), rtol=2e-5, atol=1e-7, err_msg=k
            )
        # pre-update math matches to summation order (metrics above); the
        # Adam update then amplifies ulp-level BN-order grad diffs on
        # sign-ambiguous (near-zero-grad) elements by up to ~2*lr — same
        # bound the mesh-equivalence tests use (test_parallel.py)
        lr = ta.config.training.lr.start_val
        self._assert_adam_close(sa.g_params, sb.g_params, lr)
        self._assert_adam_close(sa.d_params, sb.d_params, lr)
        assert _tree_l2_diff(sa.batch_stats, sb.batch_stats) < 1e-12

    @staticmethod
    def _assert_adam_close(a, b, lr):
        total, count = 0.0, 0
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            d = np.abs(np.asarray(x) - np.asarray(y))
            assert d.max() <= 2.05 * lr, d.max()
            total += float(d.sum())
            count += d.size
        assert total / count < 0.05 * lr, total / count

    def test_stage2_step_matches(self):
        ta, tb = self._trainers("interleave", "concat", stage=2)
        rng = np.random.default_rng(7)
        m = ta.config.model
        b = 2
        batch = {
            "image": jnp.asarray(rng.uniform(-1, 1, (b, 32, 32, 3)), jnp.float32),
            "keypoints": jnp.asarray(rng.uniform(-1, 1, (b, m.n_pts, 2)), jnp.float32),
            "real_seq": jnp.asarray(
                rng.uniform(-1, 1, (b, m.n_future_frames, m.n_pts, 2)), jnp.float32
            ),
            "action_code": jnp.asarray(np.eye(m.n_action, dtype=np.float32)[:b]),
        }
        key = jax.random.PRNGKey(3)
        state = ta.init_state(jax.random.PRNGKey(1))
        sa, ma = jax.jit(ta.train_step)(jax.tree.map(jnp.copy, state), batch, key)
        sb, mb = jax.jit(tb.train_step)(jax.tree.map(jnp.copy, state), batch, key)
        for k in sorted(ma):
            np.testing.assert_allclose(
                float(ma[k]), float(mb[k]), rtol=2e-5, atol=1e-7, err_msg=k
            )
        lr = ta.config.training.lr.start_val
        self._assert_adam_close(sa.g_params, sb.g_params, lr)
        self._assert_adam_close(sa.d_params, sb.d_params, lr)

    def test_auto_resolution_and_validation(self):
        from kpvid_tpu.ops import resolve_pair_mode

        # on the 8-virtual-device CI platform 'auto' must pick the
        # mesh-safe form; explicit modes pass through; junk raises
        assert resolve_pair_mode("auto") == "interleave"
        assert resolve_pair_mode("concat") == "concat"
        assert resolve_pair_mode("interleave") == "interleave"
        with pytest.raises(ValueError):
            resolve_pair_mode("blocked")
        import dataclasses

        cfg = tiny_config()
        bad = dataclasses.replace(
            cfg, training=dataclasses.replace(cfg.training, pair_batching="nope")
        )
        with pytest.raises(ValueError):
            bad.validate()


class TestGradAccum:
    """training.grad_accum: K-microbatch gradient accumulation of the
    fused update (train_step_accum). Stage 2 must equal the full-batch
    step (no BN; one noise draw split across micros); stage 1 is the
    standard approximate grad-accum-with-BN semantics."""

    def _assert_adam_envelope(self, a, b, lr):
        total, count = 0.0, 0
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            d = np.abs(np.asarray(x, np.float32) - np.asarray(y, np.float32))
            assert d.max() <= 2.05 * lr, d.max()
            total += float(d.sum())
            count += d.size
        assert total / count < 0.05 * lr, total / count

    def test_stage2_accum_matches_full_batch(self):
        import dataclasses

        cfg = tiny_config()
        cfg = dataclasses.replace(
            cfg,
            training=dataclasses.replace(cfg.training, batch_size=8, grad_accum=4),
        ).validate()
        trainer = Stage2Trainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(1))
        m = cfg.model
        rng = np.random.default_rng(5)
        batch = {
            "keypoints": jnp.asarray(rng.uniform(-1, 1, (8, m.n_pts, 2)), jnp.float32),
            "real_seq": jnp.asarray(
                rng.uniform(-1, 1, (8, m.n_future_frames, m.n_pts, 2)), jnp.float32
            ),
            "action_code": jnp.asarray(
                np.eye(m.n_action, dtype=np.float32)[rng.integers(0, m.n_action, 8)]
            ),
        }
        key = jax.random.PRNGKey(9)
        ref_state, ref_m = jax.jit(trainer.train_step)(
            jax.tree.map(jnp.copy, state), batch, key
        )
        acc_state, acc_m = jax.jit(trainer.train_step_accum)(
            jax.tree.map(jnp.copy, state), batch, key
        )
        for k in ref_m:
            # per-row losses are identical (same params, same noise rows);
            # mean of per-micro means == the full-batch mean
            np.testing.assert_allclose(
                np.asarray(acc_m[k]), np.asarray(ref_m[k]), rtol=2e-5, atol=1e-6,
                err_msg=k,
            )
        lr = cfg.training.lr.start_val
        self._assert_adam_envelope(acc_state.g_params, ref_state.g_params, lr)
        self._assert_adam_envelope(acc_state.d_params, ref_state.d_params, lr)
        assert int(acc_state.step) == 1

    def test_stage1_accum_runs_and_updates(self):
        import dataclasses

        cfg = tiny_config()
        cfg = dataclasses.replace(
            cfg,
            training=dataclasses.replace(cfg.training, batch_size=4, grad_accum=2),
        ).validate()
        trainer = Stage1Trainer(cfg, synthesize_vgg19_params(max_width=16))
        state = trainer.init_state(jax.random.PRNGKey(0))
        rng = np.random.default_rng(6)
        batch = {
            "image": jnp.asarray(rng.uniform(-1, 1, (4, 32, 32, 3)), jnp.float32),
            "future_image": jnp.asarray(rng.uniform(-1, 1, (4, 32, 32, 3)), jnp.float32),
        }
        new, metrics = jax.jit(trainer.train_step_accum)(
            jax.tree.map(jnp.copy, state), batch
        )
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k
        assert _tree_l2_diff(new.g_params, state.g_params) > 0
        assert _tree_l2_diff(new.d_params, state.d_params) > 0
        # the BN running stats advanced (EMA applied per micro, K times)
        assert _tree_l2_diff(new.batch_stats, state.batch_stats) > 0
        assert int(new.step) == 1

    def test_validation(self):
        import dataclasses

        cfg = tiny_config()
        with pytest.raises(ValueError, match="divide"):
            dataclasses.replace(
                cfg, training=dataclasses.replace(cfg.training, batch_size=6, grad_accum=4)
            ).validate()
        with pytest.raises(ValueError, match="fused"):
            dataclasses.replace(
                cfg,
                training=dataclasses.replace(
                    cfg.training, batch_size=8, grad_accum=2, gan_step_mode="two_batch"
                ),
            ).validate()
        with pytest.raises(ValueError, match="grad_accum"):
            dataclasses.replace(
                cfg, training=dataclasses.replace(cfg.training, grad_accum=0)
            ).validate()
