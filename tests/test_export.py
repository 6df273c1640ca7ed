"""Serving-artifact export/load roundtrip (kpvid_tpu/eval/export.py).

The exported StableHLO graph (weights baked in) must reproduce the live
FinalGenerator to float-reassociation tolerance (weights become
compile-time constants, so XLA may fold them differently than the live
graph's runtime-argument params — observed max |diff| ~4e-8 in f32),
expose the batch buckets it was exported for, and carry multi-platform
lowerings without TPU hardware present."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kpvid_tpu.configs import Config, ModelConfig, TrainingConfig
from kpvid_tpu.eval import FinalGenerator
from kpvid_tpu.eval.export import export_serving, load_serving


@pytest.fixture(scope="module")
def final():
    cfg = Config(
        model=ModelConfig(
            n_pts=4, n_action=5, cell_info=(16, 16), vae_dim=8,
            image_size=32, heatmap_size=8, n_future_frames=6,
            encoder_filters=8, translator_filters=16,
            pose_decoder_filters=16, discriminator_filters=8,
        ),
        training=TrainingConfig(batch_size=2, compute_dtype="float32"),
    ).validate()
    gen = FinalGenerator(cfg)
    s1_vars, s2_vars = gen.init_variables(jax.random.PRNGKey(0))
    return gen, s1_vars, s2_vars


def test_roundtrip_matches_live_graph(final, tmp_path, rng):
    gen, s1_vars, s2_vars = final
    path = tmp_path / "artifact.npz"
    meta = export_serving(
        gen, s1_vars, s2_vars["params"], path, batch_sizes=(2,), platforms=("cpu",)
    )
    art = load_serving(path)
    assert art.batch_sizes == [2]
    im = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    act = jax.nn.one_hot(jnp.asarray([0, 3]), 5)
    z = jnp.asarray(rng.normal(size=(2, 8)), jnp.float32)
    got = art.generate(im, act, z)
    want = gen.jitted_generate(s1_vars, s2_vars["params"], im, act, None, z=z)
    assert sorted(got) == sorted(want) == meta["outputs"]
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-5, atol=1e-6, err_msg=k
        )


def test_unknown_batch_bucket_raises(final, tmp_path, rng):
    gen, s1_vars, s2_vars = final
    path = tmp_path / "artifact.npz"
    export_serving(
        gen, s1_vars, s2_vars["params"], path, batch_sizes=(1,), platforms=("cpu",)
    )
    art = load_serving(path)
    im = jnp.zeros((3, 32, 32, 3), jnp.float32)
    with pytest.raises(ValueError, match="batch size 3"):
        art.generate(im, jnp.zeros((3, 5)), jnp.zeros((3, 8)))


def test_multiplatform_artifact_runs_on_cpu(final, tmp_path, rng):
    """Exporting for ('cpu','tpu') needs no TPU (multi-platform lowering);
    the loaded artifact still executes on this CPU host and matches."""
    gen, s1_vars, s2_vars = final
    path = tmp_path / "artifact.npz"
    meta = export_serving(
        gen, s1_vars, s2_vars["params"], path,
        batch_sizes=(1,), platforms=("cpu", "tpu"),
    )
    assert meta["platforms"] == ["cpu", "tpu"]
    art = load_serving(path)
    im = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)), jnp.float32)
    act = jax.nn.one_hot(jnp.asarray([2]), 5)
    z = jnp.asarray(rng.normal(size=(1, 8)), jnp.float32)
    got = art.generate(im, act, z)
    want = gen.jitted_generate(s1_vars, s2_vars["params"], im, act, None, z=z)
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-5, atol=1e-6, err_msg=k
        )
