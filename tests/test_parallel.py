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
    shard_batch,
    shard_state,
)


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
