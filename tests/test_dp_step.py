"""shard_map DP train steps with explicit (bf16) gradient all-reduce.

parallel/dp_step.py runs the UNCHANGED trainer step functions inside
jax.shard_map with explicit cross-replica reductions: grads pmean'd in
training.dp_grad_dtype, sync-BN for stage-1, global-batch VAE noise for
stage-2, metrics pmean'd. These tests pin the equivalence story:

- 'float32' reduce == the whole-array jit step (same math, only float
  reassociation differs),
- 'bfloat16' reduce == the same step with the averaged grads rounded to
  bf16 (identical forward metrics; post-Adam params inside the update
  envelope),
- the wire dtype: on the TPU backend the gradient all-reduces carry bf16
  (HALF the ICI bytes). The CPU backend's all-reduce-promotion pass
  upcasts bf16 all-reduces to f32 accumulation (semantics preserved,
  bytes not), so the byte assertion compiles against a deviceless TPU
  topology (jax.experimental.topologies) and skips where libtpu can't
  provide one.

No reference counterpart (single-device reference, train.py:25-29).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from kpvid_tpu.configs import Config, ModelConfig, TrainingConfig
from kpvid_tpu.parallel import (
    batch_sharding,
    inventory_compiled,
    make_dp_reduce_step,
    make_mesh,
    shard_batch,
    shard_state,
)

LR = 1e-4


def _config(dp_grad_dtype="float32", **training_kw):
    return Config(
        model=ModelConfig(
            n_pts=6,
            n_action=4,
            cell_info=(64, 64),
            vae_dim=16,
            image_size=32,
            heatmap_size=8,
            n_future_frames=8,
            encoder_filters=8,
            translator_filters=16,
            pose_decoder_filters=16,
            discriminator_filters=8,
        ),
        training=TrainingConfig(
            batch_size=8,
            compute_dtype="float32",
            dp_grad_dtype=dp_grad_dtype,
            **training_kw,
        ),
    ).validate()


def _stage2_batch(rng, m, b=8):
    return {
        "keypoints": rng.uniform(-1, 1, (b, m.n_pts, 2)).astype(np.float32),
        "real_seq": rng.uniform(-1, 1, (b, m.n_future_frames, m.n_pts, 2)).astype(
            np.float32
        ),
        "action_code": np.eye(m.n_action, dtype=np.float32)[
            rng.integers(0, m.n_action, b)
        ],
    }


def _stage1_batch(rng, b=8):
    return {
        "image": rng.uniform(-1, 1, (b, 32, 32, 3)).astype(np.float32),
        "future_image": rng.uniform(-1, 1, (b, 32, 32, 3)).astype(np.float32),
    }


def _max_diff(a, b):
    return max(
        float(jnp.max(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32))))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def _assert_metrics_close(got, ref, atol):
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(got[k], np.float32),
            np.asarray(ref[k], np.float32),
            rtol=2e-4,
            atol=atol,
            err_msg=k,
        )


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8
    return make_mesh(n_data=8, n_model=1)


class TestValidation:
    def test_rejects_model_axis(self):
        cfg = _config()
        tp_mesh = make_mesh(n_data=4, n_model=2)
        with pytest.raises(ValueError, match="pure-DP"):
            make_dp_reduce_step(cfg, tp_mesh, stage=2)

    def test_rejects_bad_stage(self, mesh):
        with pytest.raises(ValueError, match="stage"):
            make_dp_reduce_step(_config(), mesh, stage=3)

    def test_stage1_needs_vgg(self, mesh):
        with pytest.raises(ValueError, match="vgg"):
            make_dp_reduce_step(_config(), mesh, stage=1)

    def test_config_rejects_bf16_with_tp(self):
        from kpvid_tpu.configs import ParallelConfig

        cfg = _config("bfloat16")
        cfg.parallel = ParallelConfig(mesh_model=2)
        with pytest.raises(ValueError, match="pure-DP"):
            cfg.validate()


class TestStage2DpStep:
    """Stage 2 has no BN and the dp noise stream is byte-identical to the
    jit step's, so 'float32' reduce must match the whole-array step to
    float-reassociation precision."""

    def _run(self, mesh, dp_grad_dtype, mode="fused"):
        from kpvid_tpu.train.stage2 import Stage2Trainer

        cfg = _config(dp_grad_dtype, gan_step_mode=mode)
        trainer = Stage2Trainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(1))
        rng = np.random.default_rng(4)
        batch = _stage2_batch(rng, cfg.model)
        step_rng = jax.random.PRNGKey(7)
        step_fn = {
            "fused": trainer.train_step,
            "fused_dg": trainer.train_step_dg,
        }[mode]
        ref_state, ref_metrics = jax.jit(step_fn)(
            jax.tree.map(jnp.copy, state), batch, step_rng
        )
        dp = make_dp_reduce_step(cfg, mesh, stage=2, mode=mode)
        new, metrics = dp(shard_state(mesh, state), shard_batch(mesh, batch), step_rng)
        return ref_state, ref_metrics, new, metrics

    def test_f32_reduce_matches_jit_step(self, mesh):
        ref_state, ref_metrics, new, metrics = self._run(mesh, "float32")
        _assert_metrics_close(metrics, ref_metrics, atol=1e-4)
        assert _max_diff(new.g_params, ref_state.g_params) < 1e-5
        assert _max_diff(new.d_params, ref_state.d_params) < 1e-5
        # the step really moved the params
        assert int(new.step) == int(ref_state.step)

    def test_bf16_reduce_forward_identical_params_in_envelope(self, mesh):
        ref_state, ref_metrics, new, metrics = self._run(mesh, "bfloat16")
        # metrics come from the forward pass, BEFORE any grad reduction:
        # the global-noise slice makes them identical to the jit step's
        _assert_metrics_close(metrics, ref_metrics, atol=1e-4)
        # post-Adam params: each run moves every element by ~lr, and bf16
        # grad rounding can flip near-zero elements' update sign -> 2*lr
        # hard bound, and flips must be rare
        for ref_p, new_p in (
            (ref_state.g_params, new.g_params),
            (ref_state.d_params, new.d_params),
        ):
            d = _max_diff(new_p, ref_p)
            assert d <= 2.05 * LR, d
        assert _max_diff(new.g_params, ref_state.g_params) > 0  # bf16 did round

    def test_fused_dg_mode(self, mesh):
        ref_state, ref_metrics, new, metrics = self._run(
            mesh, "float32", mode="fused_dg"
        )
        _assert_metrics_close(metrics, ref_metrics, atol=1e-4)
        assert _max_diff(new.g_params, ref_state.g_params) < 1e-5

    def test_grad_accum_composes(self, mesh):
        """grad_accum under the dp step: each shard accumulates K local
        micros, then ONE cross-replica reduction of the averaged grads.
        For stage 2 the total gradient is the full-batch mean under ANY
        (shard, micro) partition of the rows, and the noise is row-
        indexed, so the dp-accum step must match the single-device plain
        fused step on the same global batch."""
        import dataclasses

        from kpvid_tpu.train.stage2 import Stage2Trainer

        cfg = _config("float32")
        cfg = dataclasses.replace(
            cfg,
            training=dataclasses.replace(cfg.training, batch_size=16, grad_accum=2),
        ).validate()
        trainer = Stage2Trainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(1))
        rng = np.random.default_rng(8)
        batch = _stage2_batch(rng, cfg.model, b=16)
        key = jax.random.PRNGKey(3)
        ref_state, ref_m = jax.jit(trainer.train_step)(
            jax.tree.map(jnp.copy, state), batch, key
        )
        dp = make_dp_reduce_step(cfg, mesh, stage=2)
        new, m = dp(shard_state(mesh, state), shard_batch(mesh, batch), key)
        _assert_metrics_close(m, ref_m, atol=1e-4)
        for ref_p, new_p in (
            (ref_state.g_params, new.g_params),
            (ref_state.d_params, new.d_params),
        ):
            assert _max_diff(new_p, ref_p) <= 2.05 * LR


@pytest.mark.slow
class TestStage1DpStep:
    """Stage 1: sync-BN (flax axis_name over 'data') gives the per-shard
    forwards GLOBAL-batch statistics, so the f32-reduce step matches the
    jit-SPMD step within the same envelope the existing mesh-equivalence
    tests use (test_parallel.py::TestTrainerMeshEquivalence)."""

    def _run(self, mesh, dp_grad_dtype, mode="fused"):
        from kpvid_tpu.losses import synthesize_vgg19_params
        from kpvid_tpu.train.stage1 import Stage1Trainer

        cfg = _config(dp_grad_dtype, gan_step_mode=mode)
        vgg = synthesize_vgg19_params(max_width=16)
        trainer = Stage1Trainer(cfg, vgg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        rng = np.random.default_rng(3)
        if mode == "two_batch":
            args = (_stage1_batch(rng), _stage1_batch(rng))
            ref = jax.jit(trainer.train_step_two_batch)(
                jax.tree.map(jnp.copy, state), *args
            )
            dp = make_dp_reduce_step(cfg, mesh, stage=1, vgg_params=vgg, mode=mode)
            got = dp(shard_state(mesh, state), *(shard_batch(mesh, a) for a in args))
        else:
            batch = _stage1_batch(rng)
            ref = jax.jit(trainer.train_step)(jax.tree.map(jnp.copy, state), batch)
            dp = make_dp_reduce_step(cfg, mesh, stage=1, vgg_params=vgg, mode=mode)
            got = dp(shard_state(mesh, state), shard_batch(mesh, batch))
        return ref, got

    def test_f32_reduce_matches_jit_step(self, mesh):
        (ref_state, ref_metrics), (new, metrics) = self._run(mesh, "float32")
        _assert_metrics_close(metrics, ref_metrics, atol=5e-5)
        # sync-BN: the running stats must match the global-batch stats the
        # jit step computes (a per-shard-stats bug would miss by ~the
        # batch-to-shard variance, orders of magnitude above this)
        assert _max_diff(new.batch_stats, ref_state.batch_stats) < 1e-5
        for ref_p, new_p in (
            (ref_state.g_params, new.g_params),
            (ref_state.d_params, new.d_params),
        ):
            assert _max_diff(new_p, ref_p) <= 2.05 * LR  # near-zero-grad sign flips

    def test_bf16_reduce_params_in_envelope(self, mesh):
        (ref_state, ref_metrics), (new, metrics) = self._run(mesh, "bfloat16")
        _assert_metrics_close(metrics, ref_metrics, atol=5e-5)
        assert _max_diff(new.batch_stats, ref_state.batch_stats) < 1e-5
        assert _max_diff(new.g_params, ref_state.g_params) <= 2.05 * LR

    def test_two_batch_mode(self, mesh):
        (ref_state, ref_metrics), (new, metrics) = self._run(
            mesh, "float32", mode="two_batch"
        )
        _assert_metrics_close(metrics, ref_metrics, atol=5e-5)
        assert _max_diff(new.g_params, ref_state.g_params) <= 2.05 * LR


@pytest.mark.slow
class TestWireDtype:
    """The point of dp_grad_dtype='bfloat16': the gradient all-reduces put
    HALF the bytes on the interconnect. Asserted on the TPU backend via a
    deviceless topology compile (the CPU backend's all-reduce-promotion
    pass upcasts small-dtype all-reduces to f32 accumulation — semantics
    kept, bytes not — so CPU HLO can't witness the saving)."""

    def _tpu_mesh(self, n=8):
        from jax.experimental import topologies

        try:
            topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x4")
        except Exception as e:  # no libtpu / no TPU system on this host
            pytest.skip(f"TPU topology unavailable: {e}")
        from jax.sharding import Mesh

        return Mesh(np.array(topo.devices).reshape(n, 1), ("data", "model"))

    def _inventory(self, mesh, dp_grad_dtype):
        cfg = _config(dp_grad_dtype)
        from kpvid_tpu.train.stage2 import Stage2Trainer

        trainer = Stage2Trainer(cfg)
        state = jax.eval_shape(trainer.init_state, jax.random.PRNGKey(0))
        repl = NamedSharding(mesh, P())
        sds = jax.tree.map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=repl), state
        )
        bsh = batch_sharding(mesh)
        m = cfg.model
        batch = {
            "keypoints": jax.ShapeDtypeStruct((8, m.n_pts, 2), np.float32, sharding=bsh),
            "real_seq": jax.ShapeDtypeStruct(
                (8, m.n_future_frames, m.n_pts, 2), np.float32, sharding=bsh
            ),
            "action_code": jax.ShapeDtypeStruct((8, m.n_action), np.float32, sharding=bsh),
        }
        step = make_dp_reduce_step(cfg, mesh, stage=2, donate=False)
        compiled = step.lower(sds, batch, jax.random.PRNGKey(1)).compile()
        params_bytes = sum(
            int(np.prod(l.shape)) * l.dtype.itemsize
            for l in jax.tree.leaves((state.g_params, state.d_params))
        )
        return inventory_compiled(compiled), params_bytes

    def test_bf16_halves_allreduce_bytes_on_tpu(self):
        mesh = self._tpu_mesh()
        inv32, params_bytes = self._inventory(mesh, "float32")
        inv16, _ = self._inventory(mesh, "bfloat16")
        ar32 = inv32.bytes.get("all-reduce", 0)
        ar16 = inv16.bytes.get("all-reduce", 0)
        assert ar32 > 0 and ar16 > 0
        # f32 reduce carries ~the f32 grad bytes (+ scalar metrics)
        assert ar32 >= 0.9 * params_bytes
        # bf16 reduce: same grads at 2 bytes + the tiny f32 metric psums
        assert ar16 <= 0.55 * ar32, (ar16, ar32)
        assert ar16 >= 0.4 * ar32, (ar16, ar32)
        # no other collective sneaks in
        assert inv16.ops_other_than("all-reduce") == {}, inv16.counts
