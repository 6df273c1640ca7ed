"""Shape/dtype/equivalence tests for the networks (models/)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kpvid_tpu.models import (
    ConvEncoder,
    ImageDiscriminator,
    ImageEncoder,
    MotionGenerator,
    PoseEncoder,
    SeqDiscriminator,
    Stage1Generator,
    Translator,
)
from kpvid_tpu.models.layers import StackedLSTM


def init_and_apply(module, *args, method=None, **kwargs):
    # jit both halves: ONE cacheable program each instead of hundreds of
    # eager per-op compiles (those fall below the persistent cache's 1s
    # threshold and would be re-paid on EVERY suite run — the dominant
    # fast-tier cost on this 1-core host)
    variables = jax.jit(
        lambda r: module.init(r, *args, method=method, **kwargs)
    )(jax.random.PRNGKey(0))
    out = jax.jit(
        lambda v: module.apply(v, *args, method=method, mutable=False, **kwargs)
    )(variables)
    return out, variables


class TestConvTrunk:
    def test_encoder_block_shapes(self):
        x = jnp.zeros((2, 64, 64, 3))
        feats, _ = init_and_apply(ConvEncoder(), x, train=False)
        shapes = [f.shape for f in feats]
        assert shapes == [
            (2, 64, 64, 32),
            (2, 32, 32, 64),
            (2, 16, 16, 128),
            (2, 8, 8, 256),
        ]

    def test_image_encoder_prepends_input(self):
        x = jnp.zeros((2, 64, 64, 3))
        feats, _ = init_and_apply(ImageEncoder(), x, train=False)
        assert len(feats) == 5
        assert feats[0].shape == (2, 64, 64, 3)
        assert feats[-2].shape == (2, 16, 16, 128)


class TestPoseEncoder:
    def test_keypoints_shape_and_range(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
        mu, _ = init_and_apply(
            PoseEncoder(n_pts=7, filters=16, trunk_filters=8), x, train=False
        )
        assert mu.shape == (2, 7, 2)
        assert np.all(np.abs(np.asarray(mu)) <= 1.0)

    def test_raw_maps(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
        (mu, raw), _ = init_and_apply(
            PoseEncoder(n_pts=5, filters=16, trunk_filters=8),
            x, train=False, return_raw_maps=True,
        )
        assert raw.shape == (1, 64, 64, 5)

    def test_decoder_filter_schedule(self):
        """Decoder convs halve from 128: dec0=128, dec1=64, dec2=32, dec3=16
        (reference models/networks/__init__.py:36-66)."""
        x = jnp.zeros((1, 128, 128, 3))
        # eval_shape: abstract init, no compute
        variables = jax.eval_shape(
            lambda r, a: PoseEncoder(n_pts=4).init(r, a, train=False),
            jax.random.PRNGKey(0), x,
        )
        p = variables["params"]
        assert p["dec0a_conv"]["Conv_0"]["kernel"].shape[-1] == 128
        assert p["dec1a_conv"]["Conv_0"]["kernel"].shape[-1] == 64
        assert p["dec2a_conv"]["Conv_0"]["kernel"].shape[-1] == 32
        assert p["dec3a_conv"]["Conv_0"]["kernel"].shape[-1] == 16


class TestTranslator:
    def test_outputs(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 142)), jnp.float32)
        (crude, mask), _ = init_and_apply(
            Translator(final_res=64, filters=32), x, train=False
        )
        assert crude.shape == (2, 64, 64, 3)
        assert mask.shape == (2, 64, 64, 1)
        m = np.asarray(mask)
        assert np.all((m > 0) & (m < 1))


class TestPoseEncoderUpsampleModes:
    def test_fused_matches_tf1(self, rng):
        """The skip decoder's fused mode (upsample folded into the next
        conv, skip handled by kernel splitting) equals the plain mode on
        shared params."""
        from kpvid_tpu.models.networks import PoseEncoder

        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
        base = PoseEncoder(n_pts=5, filters=16, trunk_filters=8)
        variables = jax.jit(lambda r: base.init(r, x, train=False))(
            jax.random.PRNGKey(0)
        )
        mu0, raw0 = jax.jit(lambda v: base.apply(
            v, x, train=False, return_raw_maps=True, mutable=False
        ))(variables)
        fused = PoseEncoder(
            n_pts=5, filters=16, trunk_filters=8, upsample_mode="fused"
        )
        assert (
            jax.tree_util.tree_structure(
                jax.eval_shape(lambda r: fused.init(r, x, train=False),
                               jax.random.PRNGKey(0))
            )
            == jax.tree_util.tree_structure(variables)
        )
        mu1, raw1 = jax.jit(lambda v: fused.apply(
            v, x, train=False, return_raw_maps=True, mutable=False
        ))(variables)
        np.testing.assert_allclose(np.asarray(raw1), np.asarray(raw0), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu0), rtol=1e-4, atol=1e-6)


class TestTranslatorUpsampleModes:
    def test_all_modes_agree(self, rng):
        """'tf1' / 'matmul' / 'fused' are the same function on the same
        params (the fused mode folds each upsample into the next conv;
        exact incl. borders). Param trees are identical across modes."""
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 142)), jnp.float32)
        base = Translator(final_res=64, filters=32)
        variables = jax.jit(lambda r: base.init(r, x, train=False))(
            jax.random.PRNGKey(0)
        )
        crude0, mask0 = jax.jit(
            lambda v: base.apply(v, x, train=False, mutable=False)
        )(variables)
        for mode in ("matmul", "fused"):
            t = Translator(final_res=64, filters=32, upsample_mode=mode)
            assert (
                jax.tree_util.tree_structure(
                    jax.eval_shape(lambda r: t.init(r, x, train=False),
                                   jax.random.PRNGKey(0))
                )
                == jax.tree_util.tree_structure(variables)
            )
            crude, mask = jax.jit(
                lambda v, m=t: m.apply(v, x, train=False, mutable=False)
            )(variables)
            np.testing.assert_allclose(
                np.asarray(crude), np.asarray(crude0), rtol=1e-4, atol=1e-5,
                err_msg=mode,
            )
            np.testing.assert_allclose(
                np.asarray(mask), np.asarray(mask0), rtol=1e-4, atol=1e-5,
                err_msg=mode,
            )


class TestImageDiscriminator:
    def test_patch_logits(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 128, 128, 3)), jnp.float32)
        logits, _ = init_and_apply(ImageDiscriminator(filters=8), x)
        # 128 -pad1,4s2-> 65 -> 34 -> 18 -> 10 -> 6 -> 4 -pad1,3s1-> 6
        assert logits.shape == (2, 6, 6, 1)


class TestStackedLSTM:
    def test_matches_numpy_oracle(self, rng):
        feats = (5, 4)
        xs = rng.normal(size=(3, 6, 2)).astype(np.float32)
        model = StackedLSTM(feats)
        out, variables = init_and_apply(model, jnp.asarray(xs))
        p = variables["params"]

        def sig(v):
            return 1.0 / (1.0 + np.exp(-v))

        # independent unrolled oracle, TF gate order i,j,f,o, forget_bias=1
        h_states = [np.zeros((3, f), np.float32) for f in feats]
        c_states = [np.zeros((3, f), np.float32) for f in feats]
        ys = []
        for t in range(6):
            inp = xs[:, t]
            for li, f in enumerate(feats):
                k = np.asarray(p[f"lstm_{li}_kernel"])
                b = np.asarray(p[f"lstm_{li}_bias"])
                gates = np.concatenate([inp, h_states[li]], -1) @ k + b
                i, j, fg, o = np.split(gates, 4, -1)
                c_states[li] = sig(fg + 1.0) * c_states[li] + sig(i) * np.tanh(j)
                h_states[li] = sig(o) * np.tanh(c_states[li])
                inp = h_states[li]
            ys.append(inp)
        oracle = np.stack(ys, axis=1)
        np.testing.assert_allclose(np.asarray(out), oracle, rtol=5e-4, atol=5e-5)

    def test_final_state(self, rng):
        xs = jnp.asarray(rng.normal(size=(2, 4, 3)), np.float32)
        model = StackedLSTM((6,))
        (out, state), _ = init_and_apply(model, xs, return_final_state=True)
        np.testing.assert_allclose(
            np.asarray(out[:, -1]), np.asarray(state[0][1]), rtol=1e-6
        )


class TestMotionGenerator:
    def test_shapes_and_quirks(self, rng):
        n_pts, n_act, vae_dim, t = 8, 9, 16, 32
        mg = MotionGenerator(n_pts=n_pts, n_future=t, cell_info=(32, 32), vae_dim=vae_dim)
        real = jnp.asarray(rng.normal(size=(2, t, 2 * n_pts)), jnp.float32)
        first = jnp.asarray(rng.normal(size=(2, 2 * n_pts)), jnp.float32)
        act = jax.nn.one_hot(jnp.asarray([1, 3]), n_act)
        noise = jnp.asarray(rng.normal(size=(2, vae_dim)), jnp.float32)
        (pred, mu, stddev), variables = init_and_apply(mg, real, first, act, noise)
        assert pred.shape == (2, t, 2 * n_pts)
        assert mu.shape == (2, vae_dim) and stddev.shape == (2, vae_dim)
        # relu quirk (reference fully_connected default): mu, stddev >= 0
        assert np.all(np.asarray(mu) >= 0) and np.all(np.asarray(stddev) >= 0)
        # tanh coord head: outputs in (-1, 1)
        assert np.all(np.abs(np.asarray(pred)) < 1.0)
        # decode-only path (inference) reuses the same weights
        z = jnp.asarray(rng.normal(size=(2, vae_dim)), jnp.float32)
        pred2 = mg.apply(variables, z, first, act, method=mg.decode)
        assert pred2.shape == (2, t, 2 * n_pts)

    def test_seq_discr(self, rng):
        sd = SeqDiscriminator(cell_info=(16, 16))
        seq = jnp.asarray(rng.normal(size=(3, 10, 6)), jnp.float32)
        logit, _ = init_and_apply(sd, seq)
        assert logit.shape == (3, 1)
        assert np.all(np.asarray(logit) >= 0)  # relu'd logit quirk


@pytest.fixture(scope="module")
def stage1_small():
    g = Stage1Generator(n_pts=4, heatmap_size=8, encoder_filters=8,
                        translator_filters=16, pose_decoder_filters=16)
    rng = np.random.default_rng(42)
    im = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
    fut = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
    variables = jax.jit(lambda r: g.init(r, im, fut, train=False))(
        jax.random.PRNGKey(0)
    )
    return g, variables, im, fut


class TestStage1Generator:
    def test_forward(self, stage1_small):
        g, variables, im, fut = stage1_small
        out = jax.jit(lambda v: g.apply(v, im, fut, train=False))(variables)
        assert out["final"].shape == (1, 32, 32, 3)
        assert out["crude"].shape == (1, 32, 32, 3)
        assert out["mask"].shape == (1, 32, 32, 1)
        assert out["current_mu"].shape == (1, 4, 2)
        # blend identity
        np.testing.assert_allclose(
            np.asarray(out["final"]),
            np.asarray(im * out["mask"] + out["crude"] * (1 - out["mask"])),
            rtol=1e-5, atol=1e-6,
        )

    def test_pose_weight_sharing(self, stage1_small):
        """Swapping (im, future_im) swaps (current_mu, future_mu) — one
        pose encoder, shared weights across both frames."""
        g, variables, im, fut = stage1_small
        fwd = jax.jit(lambda v, x, y: g.apply(v, x, y, train=False))
        a = fwd(variables, im, fut)
        b = fwd(variables, fut, im)
        np.testing.assert_allclose(
            np.asarray(a["current_mu"]), np.asarray(b["future_mu"]), rtol=1e-5, atol=1e-6
        )

    def test_generate_broadcast_fusion(self, stage1_small):
        """generate() broadcasts the once-computed embedding across T."""
        g, variables, im, fut = stage1_small
        rng = np.random.default_rng(3)
        cur_mu = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 4, 2)), jnp.float32)
        fut_seq = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 3, 4, 2)), jnp.float32)
        out = jax.jit(
            lambda v: g.apply(v, im, cur_mu, fut_seq, method=g.generate)
        )(variables)
        assert out["pred_im_seq"].shape == (1, 3, 32, 32, 3)
        assert out["mask"].shape == (1, 3, 32, 32, 1)
        assert np.all(np.abs(np.asarray(out["pred_im_seq"])) <= 1.0)


@pytest.mark.parametrize("dtype", ["bfloat16"])
def test_bf16_compute(rng, dtype):
    """Networks run under bf16 compute with f32 params and f32 outputs
    where it matters (keypoints, mask, logits)."""
    g = Stage1Generator(n_pts=4, heatmap_size=8, encoder_filters=8,
                        translator_filters=16, pose_decoder_filters=16,
                        dtype=jnp.bfloat16)
    im = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
    variables = jax.jit(lambda r: g.init(r, im, im, train=False))(
        jax.random.PRNGKey(0)
    )
    out = jax.jit(lambda v: g.apply(v, im, im, train=False))(variables)
    assert out["current_mu"].dtype == jnp.float32
    assert out["mask"].dtype == jnp.float32
    leaves = jax.tree.leaves(variables["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)


class TestConfigWidths:
    """The model.*_filters config fields must actually change the networks
    (they were once declared but unwired — caught in round 4). Defaults
    keep the exact reference sizes, so checkpoints are unaffected."""

    def test_width_fields_are_wired(self):
        import jax

        from kpvid_tpu.configs import Config, ModelConfig, TrainingConfig
        from kpvid_tpu.losses import synthesize_vgg19_params
        from kpvid_tpu.train.stage1 import Stage1Trainer

        cfg = Config(
            model=ModelConfig(
                n_pts=4, n_action=4, cell_info=(16, 16), vae_dim=8,
                image_size=16, heatmap_size=4, n_future_frames=4,
                encoder_filters=8, translator_filters=16,
                pose_decoder_filters=16, discriminator_filters=8,
            ),
            training=TrainingConfig(batch_size=2, compute_dtype="float32"),
        ).validate()
        tr = Stage1Trainer(cfg, synthesize_vgg19_params(max_width=16))
        state = tr.init_state(jax.random.PRNGKey(0))
        p = state.g_params
        assert p["image_encoder"]["trunk"]["in0_conv"]["Conv_0"]["kernel"].shape[-1] == 8
        assert p["translator"]["oct0a_conv"]["Conv_0"]["kernel"].shape[-1] == 16
        assert p["pose_encoder"]["dec0a_conv"]["Conv_0"]["kernel"].shape[-1] == 16
        assert p["pose_encoder"]["trunk"]["in0_conv"]["Conv_0"]["kernel"].shape[-1] == 8
        assert state.d_params["conv0"]["Conv_0"]["kernel"].shape[-1] == 8

    def test_default_widths_match_reference(self):
        import jax

        from kpvid_tpu.models import ImageDiscriminator, Stage1Generator

        g = Stage1Generator(n_pts=2, heatmap_size=4)
        # eval_shape: full-width param SHAPES without paying full-width init
        v = jax.eval_shape(
            lambda r: g.init(r, jnp.zeros((1, 16, 16, 3)),
                             jnp.zeros((1, 16, 16, 3)), train=False),
            jax.random.PRNGKey(0),
        )
        p = v["params"]
        assert p["image_encoder"]["trunk"]["in0_conv"]["Conv_0"]["kernel"].shape[-1] == 32
        assert p["translator"]["oct0a_conv"]["Conv_0"]["kernel"].shape[-1] == 256
        assert p["pose_encoder"]["dec0a_conv"]["Conv_0"]["kernel"].shape[-1] == 128
        d = ImageDiscriminator()
        dv = jax.eval_shape(
            lambda r: d.init(r, jnp.zeros((1, 16, 16, 3))), jax.random.PRNGKey(0)
        )
        assert dv["params"]["conv0"]["Conv_0"]["kernel"].shape[-1] == 64
        assert dv["params"]["conv5"]["Conv_0"]["kernel"].shape[-1] == 2048
