"""Mesh + sharding tests on the 8-virtual-device CPU platform."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from kpvid_tpu.parallel import (
    batch_sharding,
    make_mesh,
    param_sharding_rules,
    replicate,
    shard_batch,
    shard_state,
)


def _tiny_config(batch_size: int = 8):
    from kpvid_tpu.configs import Config, ModelConfig, TrainingConfig

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
        training=TrainingConfig(batch_size=batch_size, compute_dtype="float32"),
    ).validate()


def _assert_tree_close(a, b, rtol, atol):
    flat_a, _ = jax.tree_util.tree_flatten_with_path(a)
    flat_b = jax.tree_util.tree_flatten(b)[0]
    assert len(flat_a) == len(flat_b)
    for (path, x), y in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(x, np.float32),
            np.asarray(y, np.float32),
            rtol=rtol,
            atol=atol,
            err_msg=jax.tree_util.keystr(path),
        )


def _assert_params_close_one_adam_step(a, b, lr):
    """Post-Adam params after ONE step: the update is ~lr*sign(grad), so a
    near-zero grad element whose sign flips under a different (but equally
    valid) cross-device reduction order moves the param by up to 2*lr.
    Assert (1) every element within that hard bound, and (2) the flips are
    rare — mean |diff| far below lr (a real sharding bug, e.g. a missing
    grad psum or per-shard batch stats, flips signs everywhere)."""
    flat_a, _ = jax.tree_util.tree_flatten_with_path(a)
    flat_b = jax.tree_util.tree_flatten(b)[0]
    assert len(flat_a) == len(flat_b)
    total = 0.0
    count = 0
    for (path, x), y in zip(flat_a, flat_b):
        d = np.abs(np.asarray(x, np.float32) - np.asarray(y, np.float32))
        assert d.max() <= 2.05 * lr, f"{jax.tree_util.keystr(path)}: {d.max()}"
        total += float(d.sum())
        count += d.size
    assert total / count < 0.05 * lr, f"mean param diff {total / count}"


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return make_mesh(n_data=4, n_model=2)


class TestMesh:
    def test_axis_names_and_shape(self, mesh8):
        assert mesh8.axis_names == ("data", "model")
        assert mesh8.shape == {"data": 4, "model": 2}

    def test_default_pure_dp(self):
        mesh = make_mesh()
        assert mesh.shape == {"data": 8, "model": 1}

    def test_bad_factorization(self):
        with pytest.raises(ValueError):
            make_mesh(n_data=3, n_model=2)


class TestShardingRules:
    def test_wide_kernels_tp_narrow_replicated(self, mesh8):
        params = {
            "lstm_kernel": jnp.zeros((80, 4096)),
            "small_conv": jnp.zeros((3, 3, 3, 40)),
            "scalar": jnp.zeros(()),
        }
        specs = param_sharding_rules(mesh8, params, min_shard_dim=1024)
        assert specs["lstm_kernel"] == P(None, "model")
        assert specs["small_conv"] == P()
        assert specs["scalar"] == P()

    def test_indivisible_stays_replicated(self, mesh8):
        specs = param_sharding_rules(
            mesh8, {"odd": jnp.zeros((8, 2049))}, min_shard_dim=1024
        )
        assert specs["odd"] == P()

    def test_shard_batch_layout(self, mesh8):
        batch = shard_batch(mesh8, {"x": np.zeros((8, 4), np.float32)})
        assert batch["x"].sharding == batch_sharding(mesh8)
        # 4-way data sharding -> each shard holds 2 rows
        assert batch["x"].addressable_shards[0].data.shape == (2, 4)


class TestDpTpExecution:
    def test_dp_grad_psum_equivalence(self, mesh8):
        """A data-sharded grad step equals the single-device computation."""
        w = jnp.asarray(np.random.default_rng(0).normal(size=(16, 8)), jnp.float32)
        x = jnp.asarray(np.random.default_rng(1).normal(size=(8, 16)), jnp.float32)

        def loss(w, x):
            return jnp.mean(jnp.square(x @ w))

        g_ref = jax.grad(loss)(w, x)
        w_sh = jax.device_put(w, NamedSharding(mesh8, P()))
        x_sh = jax.device_put(x, NamedSharding(mesh8, P("data")))
        g_dp = jax.jit(jax.grad(loss))(w_sh, x_sh)
        np.testing.assert_allclose(np.asarray(g_dp), np.asarray(g_ref), rtol=2e-5)

    def test_tp_matmul_equivalence(self, mesh8):
        """A model-sharded kernel matmul equals the replicated one."""
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(4, 64)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(64, 128)), jnp.float32)
        y_ref = x @ k
        k_sh = jax.device_put(k, NamedSharding(mesh8, P(None, "model")))
        x_sh = jax.device_put(x, NamedSharding(mesh8, P()))
        y = jax.jit(lambda a, b: a @ b)(x_sh, k_sh)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-5)

    def test_shard_state_tree(self, mesh8):
        state = {
            "g": {"wide": jnp.zeros((8, 2048)), "narrow": jnp.zeros((4,))},
            "step": jnp.zeros((), jnp.int32),
        }
        sharded = shard_state(mesh8, state, min_shard_dim=1024)
        wide_spec = sharded["g"]["wide"].sharding.spec
        assert tuple(wide_spec) == (None, "model")
        assert sharded["step"].sharding.spec == P()


class TestCollectiveInventory:
    """Unit tests of the HLO collective parser (parallel/inventory.py)."""

    def test_counts_bytes_and_groups(self):
        from kpvid_tpu.parallel import collective_inventory

        hlo = """
  %all-reduce.1 = f32[4,8]{1,0} all-reduce(f32[4,8]{1,0} %p0), channel_id=1, replica_groups={{0,1,2,3,4,5,6,7}}, to_apply=%add
  %ag = bf16[16]{0} all-gather(bf16[8]{0} %p1), replica_groups={{0,1},{2,3}}, dimensions={0}
  %t = (f32[2]{0}, f32[3]{0}) all-reduce(f32[2]{0} %a, f32[3]{0} %b), replica_groups={{0,1,2,3}}
  %noise = f32[4]{0} add(f32[4]{0} %x, f32[4]{0} %y)
"""
        inv = collective_inventory(hlo)
        assert inv.counts == {"all-reduce": 2, "all-gather": 1}
        assert inv.bytes["all-reduce"] == 4 * 8 * 4 + (2 + 3) * 4
        assert inv.bytes["all-gather"] == 16 * 2
        assert inv.group_sizes == {8: 1, 2: 1, 4: 1}
        assert inv.ops_other_than("all-reduce") == {"all-gather": 1}

    def test_async_pairs_count_once_and_iota_groups(self):
        from kpvid_tpu.parallel import collective_inventory

        hlo = """
  %ars = f32[128]{0} all-reduce-start(f32[128]{0} %g), replica_groups=[4,2]<=[8], channel_id=2
  %ard = f32[128]{0} all-reduce-done(f32[128]{0} %ars)
  %cp = f32[8]{0} collective-permute(f32[8]{0} %v), source_target_pairs={{0,1}}
"""
        inv = collective_inventory(hlo)
        assert inv.counts == {"all-reduce": 1, "collective-permute": 1}
        assert inv.bytes["all-reduce"] == 128 * 4
        assert inv.group_sizes.get(2) == 1  # iota [4,2]<=[8]: 2 per group

    def test_scalar_and_empty(self):
        from kpvid_tpu.parallel import collective_inventory

        inv = collective_inventory("%r = f32[] all-reduce(f32[] %x), replica_groups={{0,1}}")
        assert inv.counts == {"all-reduce": 1}
        assert inv.bytes["all-reduce"] == 4
        assert collective_inventory("").total_ops == 0

    def test_tpu_tuple_shape_with_layout_parens(self):
        """TPU optimized HLO fuses many gradients into ONE tuple-shaped
        all-reduce whose element layouts nest parens — e.g.
        {1,0:T(8,128)S(1)} — and carry /*index=N*/ comments. The parser
        must span the whole tuple, not stop at the first ')'."""
        from kpvid_tpu.parallel import collective_inventory

        hlo = (
            "  %all-reduce.36 = (f32[32]{0:T(128)S(1)}, "
            "f32[32,32]{1,0:T(8,128)S(1)}, /*index=2*/bf16[96,256]"
            "{1,0:T(8,128)(2,1)S(1)}) all-reduce(%a, %b, %c), "
            "channel_id=1, replica_groups={{0,1,2,3,4,5,6,7}}, "
            "use_global_device_ids=true, to_apply=%region_0.0\n"
        )
        inv = collective_inventory(hlo)
        assert inv.counts == {"all-reduce": 1}
        assert inv.bytes["all-reduce"] == 32 * 4 + 32 * 32 * 4 + 96 * 256 * 2
        assert inv.group_sizes == {8: 1}


@pytest.mark.slow
class TestProductionWidthCollectives:
    """Collective hygiene at PRODUCTION widths/sharding (VERDICT r4 #1):
    compile-only AOT over virtual meshes at min_shard_dim=1024, then read
    the SPMD-partitioned HLO (parallel/inventory.py). The production-scale
    version of the round-4 tiny-width table in docs/PERF.md."""

    def _compile(self, graphs, n_data, n_model, min_shard=1024):
        import sys as _sys
        from pathlib import Path as _Path

        _sys.path.insert(0, str(_Path(__file__).resolve().parent.parent / "tools"))
        from multichip_cost import build_cases

        from kpvid_tpu.configs import Config
        from kpvid_tpu.parallel import inventory_compiled

        config = Config()  # penn production widths, batch 16, bf16
        (name, make), = build_cases(config, graphs)
        mesh = make_mesh(n_data=n_data, n_model=n_model)
        fn, fn_args = make(mesh, min_shard)
        return config, inventory_compiled(fn.lower(*fn_args).compile())

    def test_stage1_pure_dp_grad_psums_only(self):
        """The production-width 8x1 pure-DP stage-1 train step contains NO
        collectives beyond the gradient psums: all-reduce only, every one
        spanning the full 8-wide data axis, total payload within the G+D
        gradient-byte envelope (shard-aligned interleaved pair batching,
        ops/batching.py, keeps every concat local)."""
        import numpy as np

        from kpvid_tpu.losses import synthesize_vgg19_params
        from kpvid_tpu.train.stage1 import Stage1Trainer

        config, inv = self._compile(["stage1"], n_data=8, n_model=1)
        assert inv.ops_other_than("all-reduce") == {}, inv.counts
        assert inv.counts.get("all-reduce", 0) > 0
        assert set(inv.group_sizes) == {8}, inv.group_sizes

        s1 = Stage1Trainer(config, synthesize_vgg19_params())
        state = jax.eval_shape(s1.init_state, jax.random.PRNGKey(0))
        param_bytes = sum(
            int(np.prod(l.shape)) * l.dtype.itemsize
            for l in jax.tree.leaves((state.g_params, state.d_params))
        )
        ar = inv.bytes["all-reduce"]
        # grad psums dominate: payload between 0.5x (if XLA reduces some
        # grads pre-f32-convert in bf16) and 1.1x (BN stats + metric
        # scalars on top) of the f32 G+D param bytes
        assert 0.5 * param_bytes <= ar <= 1.1 * param_bytes, (ar, param_bytes)

    def test_serving_dp_zero_collectives(self):
        """The fused production-width serving graph is ZERO-collective
        under pure-DP batch sharding — rows are independent end-to-end, so
        multi-chip serving scales linearly by construction."""
        _, inv = self._compile(["serving"], n_data=8, n_model=1)
        assert inv.total_ops == 0, inv.counts

    def test_stage1_dp_bf16_allreduce_only(self):
        """The shard_map bf16-grad-reduce stage-1 step (parallel/dp_step)
        at production widths: ALL-REDUCE ONLY — its collectives are the
        explicit grad/BN pmeans, so no resharding can sneak in at any
        width (vs the jit path, whose collective set is the partitioner's
        choice). Byte halving itself is asserted on the TPU backend in
        test_dp_step.py::TestWireDtype (the CPU backend promotes bf16
        all-reduces to f32, so only the op-set is checkable here)."""
        import sys as _sys
        from pathlib import Path as _Path

        _sys.path.insert(0, str(_Path(__file__).resolve().parent.parent / "tools"))
        from multichip_cost import build_cases

        from kpvid_tpu.configs import Config
        from kpvid_tpu.parallel import inventory_compiled

        config = Config()
        config.training.dp_grad_dtype = "bfloat16"
        (name, make), = build_cases(config, ["stage1_dp"])
        assert name == "stage1_dp_bf16"
        mesh = make_mesh(n_data=8, n_model=1)
        fn, fn_args = make(mesh, 1024)
        inv = inventory_compiled(fn.lower(*fn_args).compile())
        assert inv.ops_other_than("all-reduce") == {}, inv.counts
        assert inv.counts.get("all-reduce", 0) > 0
        assert set(inv.group_sizes) == {8}, inv.group_sizes


@pytest.mark.slow
class TestTrainerMeshEquivalence:
    """The REAL production train/eval/serve steps produce the same params
    and metrics on a 4x2 DP+TP mesh as on a single device (pjit preserves
    the single-program semantics; only reduction order may differ)."""

    def test_stage1_train_step(self, mesh8):
        from kpvid_tpu.losses import synthesize_vgg19_params
        from kpvid_tpu.train.stage1 import Stage1Trainer

        cfg = _tiny_config()
        trainer = Stage1Trainer(cfg, synthesize_vgg19_params(max_width=16))
        state = trainer.init_state(jax.random.PRNGKey(0))
        rng = np.random.default_rng(3)
        batch = {
            "image": rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32),
            "future_image": rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32),
        }
        ref_state, ref_metrics = jax.jit(trainer.train_step)(
            jax.tree.map(jnp.copy, state), batch
        )
        # min_shard_dim=16 makes the tiny nets' 16-256 wide kernels actually
        # exercise TP (stand-ins for the production 1024+ kernels)
        state_sh = shard_state(mesh8, state, min_shard_dim=16)
        new_sh, m_sh = jax.jit(trainer.train_step)(state_sh, shard_batch(mesh8, batch))
        lr = cfg.training.lr.start_val
        _assert_tree_close(m_sh, ref_metrics, rtol=1e-4, atol=1e-6)
        _assert_params_close_one_adam_step(new_sh.g_params, ref_state.g_params, lr)
        _assert_params_close_one_adam_step(new_sh.d_params, ref_state.d_params, lr)
        _assert_tree_close(
            new_sh.batch_stats, ref_state.batch_stats, rtol=1e-4, atol=1e-6
        )
        # eval step too (mesh vs single device, identical pre-step state)
        ev_ref = jax.jit(trainer.eval_step)(state, batch)
        ev_sh = jax.jit(trainer.eval_step)(state_sh, shard_batch(mesh8, batch))
        _assert_tree_close(ev_sh, ev_ref, rtol=1e-4, atol=1e-6)

    def test_stage2_train_step(self, mesh8):
        from kpvid_tpu.train.stage2 import Stage2Trainer

        cfg = _tiny_config()
        m = cfg.model
        trainer = Stage2Trainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(1))
        rng = np.random.default_rng(4)
        batch = {
            "image": rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32),
            "keypoints": rng.uniform(-1, 1, (8, m.n_pts, 2)).astype(np.float32),
            "real_seq": rng.uniform(
                -1, 1, (8, m.n_future_frames, m.n_pts, 2)
            ).astype(np.float32),
            "action_code": np.eye(m.n_action, dtype=np.float32)[
                rng.integers(0, m.n_action, 8)
            ],
        }
        step_rng = jax.random.PRNGKey(7)
        ref_state, ref_metrics = jax.jit(trainer.train_step)(
            jax.tree.map(jnp.copy, state), batch, step_rng
        )
        state_sh = shard_state(mesh8, state, min_shard_dim=16)
        new_sh, m_sh = jax.jit(trainer.train_step)(
            state_sh, shard_batch(mesh8, batch), step_rng
        )
        lr = cfg.training.lr.start_val
        _assert_tree_close(m_sh, ref_metrics, rtol=1e-4, atol=1e-6)
        _assert_params_close_one_adam_step(new_sh.g_params, ref_state.g_params, lr)
        _assert_params_close_one_adam_step(new_sh.d_params, ref_state.d_params, lr)

    def test_serving_generate_dp(self, mesh8):
        """Multi-chip serving: FinalGenerator.generate with the batch
        sharded over 'data' and params replicated equals the single-device
        output."""
        from kpvid_tpu.eval import FinalGenerator

        cfg = _tiny_config()
        m = cfg.model
        final = FinalGenerator(cfg)
        s1_vars, s2_vars = final.init_variables(jax.random.PRNGKey(2))
        rng = np.random.default_rng(5)
        im = rng.uniform(-1, 1, (8, m.image_size, m.image_size, 3)).astype(np.float32)
        act = np.eye(m.n_action, dtype=np.float32)[rng.integers(0, m.n_action, 8)]
        gen_rng = jax.random.PRNGKey(9)
        ref = jax.jit(final.generate)(s1_vars, s2_vars["params"], im, act, gen_rng)
        out = jax.jit(final.generate)(
            replicate(mesh8, s1_vars),
            replicate(mesh8, s2_vars["params"]),
            jax.device_put(im, batch_sharding(mesh8)),
            jax.device_put(act, batch_sharding(mesh8)),
            gen_rng,
        )
        _assert_tree_close(out, ref, rtol=1e-4, atol=1e-5)
