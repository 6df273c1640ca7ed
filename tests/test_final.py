"""End-to-end FinalGenerator (fused inference graph) tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kpvid_tpu.configs import Config, ModelConfig, TrainingConfig
from kpvid_tpu.eval import FinalGenerator


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


def test_generate_shapes_and_ranges(final, rng):
    gen, s1_vars, s2_vars = final
    b, t, s = 2, 6, 32
    im = jnp.asarray(rng.uniform(-1, 1, (b, s, s, 3)), jnp.float32)
    act = jax.nn.one_hot(jnp.asarray([0, 3]), 5)
    out = gen.jitted_generate(s1_vars, s2_vars["params"], im, act, jax.random.PRNGKey(1))
    assert out["pred_im_seq"].shape == (b, t, s, s, 3)
    assert out["mask"].shape == (b, t, s, s, 1)
    assert out["pred_im_crude"].shape == (b, t, s, s, 3)
    assert out["current_points"].shape == (b, 4, 2)
    assert out["future_points"].shape == (b, t, 4, 2)
    pred = np.asarray(out["pred_im_seq"])
    assert np.all(np.abs(pred) <= 1.0)  # clipped (reference final_model.py:98-99)
    m = np.asarray(out["mask"])
    assert np.all((m > 0) & (m < 1))


def test_rng_controls_motion(final, rng):
    """Different z -> different future keypoints; same z -> identical."""
    gen, s1_vars, s2_vars = final
    im = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)), jnp.float32)
    act = jax.nn.one_hot(jnp.asarray([1]), 5)
    a = gen.jitted_generate(s1_vars, s2_vars["params"], im, act, jax.random.PRNGKey(7))
    b = gen.jitted_generate(s1_vars, s2_vars["params"], im, act, jax.random.PRNGKey(8))
    c = gen.jitted_generate(s1_vars, s2_vars["params"], im, act, jax.random.PRNGKey(7))
    assert np.abs(np.asarray(a["future_points"]) - np.asarray(b["future_points"])).max() > 0
    np.testing.assert_array_equal(
        np.asarray(a["future_points"]), np.asarray(c["future_points"])
    )
    # current keypoints are deterministic in the image, independent of z
    np.testing.assert_array_equal(
        np.asarray(a["current_points"]), np.asarray(b["current_points"])
    )


def test_render_point_images(final):
    gen, _, _ = final
    from kpvid_tpu.utils import get_n_colors

    mu = jnp.asarray([[[0.0, 0.0], [0.5, -0.5], [-0.5, 0.5], [0.9, 0.9]]], jnp.float32)
    img = gen.render_point_images(mu, jnp.asarray(get_n_colors(4)))
    assert img.shape == (1, 32, 32, 3)
    assert float(img.max()) > 0.5  # peaks tinted


def test_split_first_conv_exact(final, rng):
    """The serving fast path (first-conv split by linearity) is numerically
    equivalent to the straightforward path (f32 config -> tight)."""
    gen, s1_vars, s2_vars = final
    im = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    act = jax.nn.one_hot(jnp.asarray([0, 4]), 5)
    key = jax.random.PRNGKey(11)
    # jit: one cacheable program per path instead of eager per-op compiles
    fast = jax.jit(lambda *a: gen.generate(*a, split_first_conv=True))(
        s1_vars, s2_vars["params"], im, act, key
    )
    slow = jax.jit(lambda *a: gen.generate(*a, split_first_conv=False))(
        s1_vars, s2_vars["params"], im, act, key
    )
    np.testing.assert_allclose(
        np.asarray(fast["pred_im_seq"]), np.asarray(slow["pred_im_seq"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(fast["mask"]), np.asarray(slow["mask"]), rtol=1e-4, atol=1e-5
    )


@pytest.mark.slow
def test_conv_backend_pallas_matches_xla(final, rng):
    """conv_backend='pallas' (fused strip-matmul conv+BN+relu for the
    translator's MXU-deep 3x3 blocks, ops/pallas_conv.py) reproduces the
    XLA path on the SAME variables — params and checkpoints are shared;
    only float reassociation differs (f32 config -> tight). At this
    config the 8^2x256 and 16^2x128 octaves take the Pallas path and the
    32^2x64 octave stays on XLA, exercising the eligibility gate."""
    gen, s1_vars, s2_vars = final
    gen_p = FinalGenerator(gen.config, conv_backend="pallas")
    im = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    act = jax.nn.one_hot(jnp.asarray([1, 3]), 5)
    key = jax.random.PRNGKey(17)
    a = gen.generate(s1_vars, s2_vars["params"], im, act, key)
    b = gen_p.generate(s1_vars, s2_vars["params"], im, act, key)
    # keypoints are upstream of the translator: identical
    np.testing.assert_array_equal(
        np.asarray(a["future_points"]), np.asarray(b["future_points"])
    )
    for name in ("pred_im_seq", "pred_im_crude", "mask"):
        np.testing.assert_allclose(
            np.asarray(a[name]), np.asarray(b[name]), rtol=1e-4, atol=1e-5
        )


@pytest.mark.slow
def test_conv_backend_pallas_chain_matches_xla(final, rng):
    """conv_backend='pallas_chain' (the whole decode — every conv, both
    up2 folds, the packed final octave, and the fused heads — as one
    Mosaic region, ops/pallas_chain.py) reproduces the XLA path on the
    SAME variables. Exercises the chain's oct0a affine, the border
    splices of both up2-fold kernels, the W-packed final octave, and the
    packed-head unpack."""
    gen, s1_vars, s2_vars = final
    gen_c = FinalGenerator(gen.config, conv_backend="pallas_chain")
    im = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    act = jax.nn.one_hot(jnp.asarray([1, 3]), 5)
    key = jax.random.PRNGKey(17)
    a = gen.generate(s1_vars, s2_vars["params"], im, act, key)
    b = gen_c.generate(s1_vars, s2_vars["params"], im, act, key)
    np.testing.assert_array_equal(
        np.asarray(a["future_points"]), np.asarray(b["future_points"])
    )
    for name in ("pred_im_seq", "pred_im_crude", "mask"):
        np.testing.assert_allclose(
            np.asarray(a[name]), np.asarray(b[name]), rtol=1e-4, atol=1e-5
        )


def test_fused_heads_exact(final, rng):
    """The single-conv crude+mask head (kernels concatenated along the
    output axis) matches the two separate head convs bit-for-bit: each
    output channel's contraction is independent of the others."""
    gen, s1_vars, s2_vars = final
    im = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    act = jax.nn.one_hot(jnp.asarray([2, 1]), 5)
    key = jax.random.PRNGKey(13)
    fused = jax.jit(lambda *a: gen.generate(*a, fuse_heads=True))(
        s1_vars, s2_vars["params"], im, act, key
    )
    plain = jax.jit(lambda *a: gen.generate(*a, fuse_heads=False))(
        s1_vars, s2_vars["params"], im, act, key
    )
    for name in ("pred_im_seq", "pred_im_crude", "mask"):
        np.testing.assert_allclose(
            np.asarray(fused[name]), np.asarray(plain[name]), rtol=1e-6, atol=1e-7
        )
