"""Checkpoint round-trip + name-filtered merge restore (the two-checkpoint
composition semantic of reference base_model.py:83-92 / evaluate.py:76-77),
plus elastic (topology-changing) save/restore. SURVEY §5.4."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kpvid_tpu.utils.checkpoint import (
    latest_checkpoint,
    list_checkpoint_steps,
    merge_restore,
    restore_checkpoint,
    save_checkpoint,
)


def test_roundtrip(tmp_path):
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)}, "step": jnp.asarray(7)}
    save_checkpoint(tmp_path, "stage1", 7, state)
    out = restore_checkpoint(latest_checkpoint(tmp_path / "stage1"))
    np.testing.assert_array_equal(out["params"]["w"], np.arange(6.0).reshape(2, 3))
    assert int(out["step"]) == 7


def test_latest_and_retention(tmp_path):
    state = {"x": jnp.zeros(2)}
    for step in (10, 20, 30):
        save_checkpoint(tmp_path, "m", step, state, keep=2)
    assert list_checkpoint_steps(tmp_path / "m") == [20, 30]
    assert latest_checkpoint(tmp_path / "m").name == "ckpt-30"


def test_merge_restore_two_checkpoints(tmp_path):
    """Stage-1 and stage-2 checkpoints graft into one composite tree by
    path intersection, untouched leaves intact."""
    stage1 = {"pose_encoder": {"w": jnp.ones(3)}, "translator": {"w": jnp.full(2, 2.0)}}
    stage2 = {"vae_decoder": {"k": jnp.full(4, 3.0)}}
    save_checkpoint(tmp_path, "s1", 1, stage1)
    save_checkpoint(tmp_path, "s2", 1, stage2)

    target = {
        "pose_encoder": {"w": jnp.zeros(3)},
        "translator": {"w": jnp.zeros(2)},
        "vae_decoder": {"k": jnp.zeros(4)},
        "never_in_ckpt": jnp.full(1, 9.0),
    }
    r1 = restore_checkpoint(latest_checkpoint(tmp_path / "s1"))
    merged, n1 = merge_restore(target, r1)
    r2 = restore_checkpoint(latest_checkpoint(tmp_path / "s2"))
    merged, n2 = merge_restore(merged, r2)
    assert (n1, n2) == (2, 1)
    np.testing.assert_array_equal(merged["pose_encoder"]["w"], np.ones(3))
    np.testing.assert_array_equal(merged["translator"]["w"], np.full(2, 2.0))
    np.testing.assert_array_equal(merged["vae_decoder"]["k"], np.full(4, 3.0))
    np.testing.assert_array_equal(merged["never_in_ckpt"], np.full(1, 9.0))


def test_merge_restore_shape_mismatch_raises(tmp_path):
    save_checkpoint(tmp_path, "s", 1, {"a": jnp.zeros((2, 2))})
    restored = restore_checkpoint(latest_checkpoint(tmp_path / "s"))
    try:
        merge_restore({"a": jnp.zeros((3, 3))}, restored)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "shape mismatch" in str(e)


def test_full_train_state_resume_roundtrip(tmp_path):
    """A real GANTrainState (flax struct + optax adam states) survives
    save -> restore -> merge with EVERY leaf matched (regression: attr-key
    vs dict-key path stringification once made this silently match 0)."""
    import jax
    import optax

    from kpvid_tpu.train.state import GANTrainState, make_optimizer
    from kpvid_tpu.configs import LRConfig

    params = {"dense": {"kernel": jnp.ones((3, 4)), "bias": jnp.zeros(4)}}
    d_params = {"logit": {"kernel": jnp.full((2, 1), 0.5)}}
    opt = make_optimizer(LRConfig())
    state = GANTrainState(
        step=jnp.asarray(11),
        g_params=params,
        d_params=d_params,
        batch_stats={"bn": {"mean": jnp.zeros(4)}},
        g_opt_state=opt.init(params),
        d_opt_state=opt.init(d_params),
    )
    n_leaves = len(jax.tree.leaves(state))
    save_checkpoint(tmp_path, "full", 11, state)
    restored = restore_checkpoint(latest_checkpoint(tmp_path / "full"))
    fresh = jax.tree.map(jnp.zeros_like, state)
    merged, n = merge_restore(fresh, restored)
    assert n == n_leaves, f"matched {n} of {n_leaves} leaves"
    assert int(merged.step) == 11
    np.testing.assert_array_equal(merged.g_params["dense"]["kernel"], np.ones((3, 4)))
    chex = merged.g_opt_state
    assert len(jax.tree.leaves(chex)) == len(jax.tree.leaves(opt.init(params)))


@pytest.mark.slow
def test_elastic_topology_checkpoint(tmp_path):
    """Elastic restore: a REAL stage-1 train state saved while TP-sharded
    on a 4x2 ('data','model') mesh restores onto a single device, onto a
    pure-DP 8x1 mesh, and back onto 4x2 — and on every target topology the
    NEXT train step is bit-identical to the never-checkpointed state run on
    that same topology (checkpoints are topology-free host numpy; sharding
    is re-derived at load). The restore path any multi-chip run needs the
    day topology changes between runs. SURVEY §5.4; reference
    base_model.py:83-92 (which can only restore onto its one device)."""
    from test_parallel import _tiny_config

    from kpvid_tpu.losses import synthesize_vgg19_params
    from kpvid_tpu.parallel import make_mesh, shard_batch, shard_state
    from kpvid_tpu.train.stage1 import Stage1Trainer

    def tree_equal(a, b):
        flat_a, _ = jax.tree_util.tree_flatten_with_path(a)
        flat_b = jax.tree_util.tree_flatten(b)[0]
        assert len(flat_a) == len(flat_b)
        for (path, x), y in zip(flat_a, flat_b):
            np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y), err_msg=jax.tree_util.keystr(path)
            )

    cfg = _tiny_config()
    trainer = Stage1Trainer(cfg, synthesize_vgg19_params(max_width=16))
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(11)
    batch = {
        "image": rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32),
        "future_image": rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32),
    }
    step = jax.jit(trainer.train_step)

    # --- save while TP-sharded on 4x2 (min_shard_dim=16 so the tiny nets'
    # 16+-wide kernels really shard over 'model') ---
    mesh42 = make_mesh(n_data=4, n_model=2)
    state_42 = shard_state(mesh42, state, min_shard_dim=16)
    tp_leaves = [
        l for l in jax.tree.leaves(state_42)
        if isinstance(l, jax.Array) and "model" in str(l.sharding.spec)
    ]
    assert tp_leaves, "no leaf actually TP-sharded — test precondition broken"
    save_checkpoint(tmp_path, "elastic", 1, state_42)

    restored = restore_checkpoint(latest_checkpoint(tmp_path / "elastic"))
    merged, n = merge_restore(jax.tree.map(jnp.zeros_like, state), restored)
    assert n == len(jax.tree.leaves(state))

    # --- target: single device ---
    ref_s, ref_m = step(jax.tree.map(jnp.copy, state), batch)
    got_s, got_m = step(merged, batch)
    tree_equal(got_m, ref_m)
    tree_equal(got_s, ref_s)

    # --- target: pure-DP 8x1 ---
    mesh81 = make_mesh(n_data=8, n_model=1)
    batch_81 = shard_batch(mesh81, batch)
    ref81_s, ref81_m = step(shard_state(mesh81, state, min_shard_dim=16), batch_81)
    got81_s, got81_m = step(shard_state(mesh81, merged, min_shard_dim=16), batch_81)
    tree_equal(got81_m, ref81_m)
    tree_equal(got81_s, ref81_s)

    # --- and back onto the TP mesh (replicated ckpt -> 4x2 shards) ---
    batch_42 = shard_batch(mesh42, batch)
    ref42_s, ref42_m = step(state_42, batch_42)
    got42_s, got42_m = step(shard_state(mesh42, merged, min_shard_dim=16), batch_42)
    tree_equal(got42_m, ref42_m)
    tree_equal(got42_s, ref42_s)


def test_async_checkpoint_manager(tmp_path):
    from kpvid_tpu.utils.checkpoint import AsyncCheckpointManager

    mgr = AsyncCheckpointManager(tmp_path, "m", keep=2)
    state = {"w": jnp.arange(8.0), "step": jnp.asarray(3)}
    mgr.save(3, state)
    mgr.save(4, jax.tree.map(lambda x: x * 2, state))  # waits for the first
    mgr.save(5, jax.tree.map(lambda x: x * 3, state))
    mgr.wait()
    assert list_checkpoint_steps(tmp_path / "m") == [4, 5]  # keep=2
    out = restore_checkpoint(latest_checkpoint(tmp_path / "m"))
    np.testing.assert_array_equal(out["w"], np.arange(8.0) * 3)


def test_async_checkpoint_snapshot_isolated(tmp_path):
    """Mutating (donating) the live state after save() must not affect the
    written checkpoint — save snapshots on device first."""
    from kpvid_tpu.utils.checkpoint import AsyncCheckpointManager

    mgr = AsyncCheckpointManager(tmp_path, "iso")
    state = {"w": jnp.ones(4)}
    mgr.save(1, state)
    state["w"] = state["w"].at[:].set(99.0)  # simulate continued training
    mgr.wait()
    out = restore_checkpoint(latest_checkpoint(tmp_path / "iso"))
    np.testing.assert_array_equal(out["w"], np.ones(4))
