"""Forward-parity oracles against REAL TensorFlow kernels.

The strongest available proof of reference numerics absent a pretrained
checkpoint: TF 2.x ships the exact kernels the TF1 reference ran on —
tf.nn.conv2d (SAME padding), tf.nn.batch_normalization (eps 1e-5), and the
LEGACY bilinear resize (tf.compat.v1.image.resize_images, align_corners=
False, non-half-pixel centers). These tests

1. initialize the flax Stage1Generator,
2. export every weight through utils/tf1_import.map_names — so the TF1
   checkpoint transcoder's name mapping is itself forward-verified,
3. rebuild the reference pose-encoder / image-encoder / translator graphs
   with raw TF ops, following /root/reference/models/networks/__init__.py
   (encoder :7-26, pose_encoder :36-72, translator :75-102) and
   utils/model.py (get_gaussian_maps :47-58, get_coord :61-69) line by
   line,
4. assert the flax forward matches the TF forward at f32 tolerance.
"""

from __future__ import annotations

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kpvid_tpu.models import Stage1Generator  # noqa: E402
from kpvid_tpu.ops import upsample2x  # noqa: E402
from kpvid_tpu.utils.checkpoint import _key_name  # noqa: E402
from kpvid_tpu.utils.tf1_import import map_names  # noqa: E402

N_PTS = 6
SIZE = 32  # image size; heatmap = SIZE // 4


# --------------------------------------------------------------- fixtures
@pytest.fixture(scope="module")
def model_weights():
    """(flax module, randomized variables, {tf1_name: np.ndarray})."""
    gen = Stage1Generator(
        n_pts=N_PTS, heatmap_size=SIZE // 4, dtype=jnp.float32
    )
    dummy = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    variables = jax.jit(lambda r: gen.init(r, dummy, dummy, train=False))(
        jax.random.PRNGKey(0)
    )

    # randomize the zero-initialized leaves (conv biases, BN beta) and the
    # moving statistics so every term of the TF math is nontrivial
    counter = [0]

    def rnd_param(leaf):
        counter[0] += 1
        if leaf.ndim == 1:
            r = np.random.default_rng(counter[0])
            return leaf + jnp.asarray(r.normal(0, 0.1, leaf.shape), jnp.float32)
        return leaf

    def rnd_stat(path, leaf):
        counter[0] += 1
        r = np.random.default_rng(counter[0])
        name = _key_name(path[-1])
        if name == "var":
            return jnp.asarray(r.uniform(0.5, 1.5, leaf.shape), jnp.float32)
        return jnp.asarray(r.normal(0, 0.2, leaf.shape), jnp.float32)

    variables = {
        "params": jax.tree.map(rnd_param, variables["params"]),
        "batch_stats": jax.tree_util.tree_map_with_path(
            rnd_stat, variables["batch_stats"]
        ),
    }

    mapping = map_names(variables, "stage1")
    flat, _ = jax.tree_util.tree_flatten_with_path(variables)
    weights = {}
    for path, leaf in flat:
        key = tuple(_key_name(k) for k in path)
        assert key in mapping, f"unmapped flax leaf {key}"
        weights[mapping[key]] = np.asarray(leaf, np.float32)
    return gen, variables, weights


# ------------------------------------------------------ TF reference graph
def _conv(w, x, scope, stride=1):
    kernel = tf.constant(w[f"{scope}/conv2d/kernel"])
    bias = tf.constant(w[f"{scope}/conv2d/bias"])
    y = tf.nn.conv2d(x, kernel, strides=[1, stride, stride, 1], padding="SAME")
    return y + bias


def _bn(w, x, scope):
    return tf.nn.batch_normalization(
        x,
        tf.constant(w[f"{scope}/moving_mean"]),
        tf.constant(w[f"{scope}/moving_variance"]),
        tf.constant(w[f"{scope}/beta"]),
        tf.constant(w[f"{scope}/gamma"]),
        1e-5,
    )


def _cbr(w, x, prefix, conv_scope, bn_scope, stride=1):
    x = _conv(w, x, f"{prefix}/{conv_scope}", stride)
    x = _bn(w, x, f"{prefix}/{bn_scope}")
    return tf.nn.relu(x)


def _tf_encoder(w, x, prefix):
    """reference networks/__init__.py:7-26."""
    feats = []
    x = _cbr(w, x, prefix, "conv_1", "b_norm_1")
    x = _cbr(w, x, prefix, "conv_2", "b_norm_2")
    feats.append(x)
    for i in range(3):
        x = _cbr(w, x, prefix, f"conv_{i * 2 + 3}", f"b_norm_{i * 2 + 3}", stride=2)
        x = _cbr(w, x, prefix, f"conv_{i * 2 + 4}", f"b_norm_{i * 2 + 4}")
        feats.append(x)
    return feats


def _tf_get_coord(x, other_axis, axis_size):
    """reference utils/model.py:61-69."""
    prob = tf.nn.softmax(tf.reduce_mean(x, axis=other_axis), axis=1)
    grid = tf.reshape(tf.linspace(-1.0, 1.0, axis_size), [1, axis_size, 1])
    return tf.reduce_sum(prob * grid, axis=1)


def _tf_pose_encoder(w, x, final_res):
    """reference networks/__init__.py:36-72."""
    feats = _tf_encoder(w, x, "pose_encoder/encoder")
    x = feats[-1]
    size = int(x.shape[1])
    conv_id = 1
    for i in range(4):
        if i > 0:
            x = tf.concat([x, feats[-1 * (i + 1)]], axis=-1)
        x = _cbr(w, x, "pose_encoder", f"conv_{conv_id}_0", f"b_norm_{conv_id}_0")
        x = _cbr(w, x, "pose_encoder", f"conv_{conv_id}_1", f"b_norm_{conv_id}_1")
        if size == final_res:
            x = _conv(w, x, "pose_encoder/conv_0")
            break
        x = _cbr(w, x, "pose_encoder", f"conv_{conv_id + 1}_0", f"b_norm_{conv_id + 1}_0")
        x = _cbr(w, x, "pose_encoder", f"conv_{conv_id + 1}_1", f"b_norm_{conv_id + 1}_1")
        x = tf.compat.v1.image.resize_images(x, [2 * size, 2 * size])
        size = int(x.shape[1])
        conv_id += 2
    gauss_y = _tf_get_coord(x, 2, int(x.shape[1]))
    gauss_x = _tf_get_coord(x, 1, int(x.shape[2]))
    return tf.stack([gauss_x, gauss_y], axis=2)


def _tf_translator(w, x, final_res):
    """reference networks/__init__.py:75-102."""
    size = int(x.shape[1])
    conv_id = 1
    while size <= final_res:
        x = _cbr(w, x, "translator", f"conv_{conv_id}_0", f"b_norm_{conv_id}_0")
        x = _cbr(w, x, "translator", f"conv_{conv_id}_1", f"b_norm_{conv_id}_1")
        if size == final_res:
            crude = _conv(w, x, f"translator/conv_{conv_id + 1}_0")
            mask = tf.nn.sigmoid(_conv(w, x, f"translator/conv_{conv_id + 1}_1"))
            return crude, mask
        x = _cbr(w, x, "translator", f"conv_{conv_id + 1}_0", f"b_norm_{conv_id + 1}_0")
        x = _cbr(w, x, "translator", f"conv_{conv_id + 1}_1", f"b_norm_{conv_id + 1}_1")
        x = tf.compat.v1.image.resize_images(x, [2 * size, 2 * size])
        size = int(x.shape[1])
        conv_id += 2
    raise AssertionError("unreachable")


def _tf_gaussian_maps(mu, shape_hw, inv_std=14.3):
    """reference utils/model.py:47-58."""
    mu_x, mu_y = mu[:, :, 0:1], mu[:, :, 1:2]
    y = tf.reshape(tf.linspace(-1.0, 1.0, shape_hw[0]), [1, 1, shape_hw[0], 1])
    x = tf.reshape(tf.linspace(-1.0, 1.0, shape_hw[1]), [1, 1, 1, shape_hw[1]])
    dist = (
        tf.square(y - tf.expand_dims(mu_y, -1))
        + tf.square(x - tf.expand_dims(mu_x, -1))
    ) * inv_std**2
    return tf.transpose(tf.exp(-dist), perm=[0, 2, 3, 1])


# ------------------------------------------------------------------ tests
class TestLegacyResize:
    def test_upsample2x_matches_tf1_resize(self, rng):
        x = rng.normal(size=(2, 5, 7, 3)).astype(np.float32)
        want = tf.compat.v1.image.resize_images(tf.constant(x), [10, 14]).numpy()
        got = np.asarray(upsample2x(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


class TestStage1ForwardOracle:
    def test_pose_encoder_matches_tf(self, model_weights, rng):
        gen, variables, w = model_weights
        im = rng.uniform(-1, 1, (2, SIZE, SIZE, 3)).astype(np.float32)
        want = _tf_pose_encoder(w, tf.constant(im), final_res=SIZE).numpy()
        got = np.asarray(
            gen.apply(variables, jnp.asarray(im), method=gen.detect)
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_full_stage1_forward_matches_tf(self, model_weights, rng):
        """The complete training forward (reference
        detector_translator_model.py:160-184): image-encode t, pose-encode
        t and t+d, render 8^2 heatmaps, translate, blend."""
        gen, variables, w = model_weights
        hs = SIZE // 4
        im = rng.uniform(-1, 1, (2, SIZE, SIZE, 3)).astype(np.float32)
        fut = rng.uniform(-1, 1, (2, SIZE, SIZE, 3)).astype(np.float32)

        # ------------------------------------------------------ TF oracle
        feats = _tf_encoder(w, tf.constant(im), "image_encoder/encoder")
        emb = ([tf.constant(im)] + feats)[-2]
        cur_mu = _tf_pose_encoder(w, tf.constant(im), final_res=SIZE)
        fut_mu = _tf_pose_encoder(w, tf.constant(fut), final_res=SIZE)
        cur_map = _tf_gaussian_maps(cur_mu, (hs, hs))
        fut_map = _tf_gaussian_maps(fut_mu, (hs, hs))
        joint = tf.concat([emb, cur_map, fut_map], axis=-1)
        crude, mask = _tf_translator(w, joint, final_res=SIZE)
        final = tf.constant(im) * mask + crude * (1.0 - mask)

        # ----------------------------------------------------------- flax
        out = gen.apply(
            variables, jnp.asarray(im), jnp.asarray(fut), train=False
        )
        np.testing.assert_allclose(
            np.asarray(out["current_mu"]), cur_mu.numpy(), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out["future_mu"]), fut_mu.numpy(), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out["mask"]), mask.numpy(), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out["crude"]), crude.numpy(), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out["final"]), final.numpy(), rtol=1e-4, atol=1e-4
        )


def _randomized_img_discr():
    """(flax ImageDiscriminator, variables, {tf1_name: np.ndarray}) with
    randomized biases — shared by the PatchGAN forward oracle and the
    composed train-loss oracle."""
    from kpvid_tpu.models import ImageDiscriminator

    disc = ImageDiscriminator(dtype=jnp.float32)
    variables = jax.jit(
        lambda r: disc.init(r, jnp.zeros((1, SIZE, SIZE, 3), jnp.float32))
    )(jax.random.PRNGKey(3))
    counter = [100]

    def rnd_param(leaf):
        counter[0] += 1
        if leaf.ndim == 1:
            r = np.random.default_rng(counter[0])
            return leaf + jnp.asarray(r.normal(0, 0.1, leaf.shape), jnp.float32)
        return leaf

    variables = {"params": jax.tree.map(rnd_param, variables["params"])}

    mapping = map_names(variables, "stage1_discr")
    flat, _ = jax.tree_util.tree_flatten_with_path(variables)
    w = {}
    for path, leaf in flat:
        key = tuple(_key_name(k) for k in path)
        assert key in mapping, f"unmapped flax leaf {key}"
        w[mapping[key]] = np.asarray(leaf, np.float32)
    return disc, variables, w


def _tf_patchgan(w, x):
    """reference networks/__init__.py:141-151 — the explicit-pre-pad +
    SAME-conv idiom (pad=1 then stride-2 SAME), leaky 0.01, no-bias
    logit head."""

    def pad_conv(x, scope, stride, use_bias=True):
        x = tf.pad(x, [[0, 0], [1, 1], [1, 1], [0, 0]])
        kernel = tf.constant(w[f"{scope}/conv2d/kernel"])
        y = tf.nn.conv2d(x, kernel, strides=[1, stride, stride, 1], padding="SAME")
        if use_bias:
            y = y + tf.constant(w[f"{scope}/conv2d/bias"])
        return y

    for i in range(6):
        x = tf.nn.leaky_relu(pad_conv(x, f"img_discr/conv_{i}", 2), 0.01)
    return pad_conv(x, "img_discr/D_logit", 1, use_bias=False)


def _tf_bce(logits, target):
    labels = tf.fill(tf.shape(logits), float(target))
    return tf.reduce_mean(
        tf.nn.sigmoid_cross_entropy_with_logits(labels=labels, logits=logits)
    )


class TestImageDiscriminatorOracle:
    def test_patchgan_matches_tf(self, rng):
        disc, variables, w = _randomized_img_discr()
        im = rng.uniform(-1, 1, (2, SIZE, SIZE, 3)).astype(np.float32)
        want = _tf_patchgan(w, tf.constant(im)).numpy()
        got = np.asarray(disc.apply(variables, jnp.asarray(im)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestVggPerceptualOracle:
    def test_vgg_features_and_loss_match_tf(self, rng):
        """reference models/networks/vgg.py:13-61 + the perceptual loss of
        detector_translator_model.py:262-289, rebuilt with tf.nn.conv2d /
        tf.nn.max_pool on the same (synthesized) weight dict."""
        from kpvid_tpu.losses import synthesize_vgg19_params
        from kpvid_tpu.losses.perceptual import (
            VGG19_LAYOUT,
            VGG_FEATURE_LAYERS,
            perceptual_loss,
            vgg19_features,
        )

        del VGG19_LAYOUT, VGG_FEATURE_LAYERS  # used by the _tf_vgg_taps helper
        params = synthesize_vgg19_params()
        rgb = rng.uniform(0, 255, (2, SIZE, SIZE, 3)).astype(np.float32)

        taps = _tf_vgg_taps(params, rgb)
        got = vgg19_features(params, jnp.asarray(rgb))
        assert len(got) == len(taps) == 5
        for g_f, t_f in zip(got, taps):
            # activations reach O(100) after 16 conv layers; atol scales
            # with the f32 accumulation noise of that depth
            np.testing.assert_allclose(
                np.asarray(g_f), t_f.numpy(), rtol=2e-4, atol=5e-3
            )

        # full loss: mean over layers of mean |feat_gt - feat_pred|
        # (reference detector_translator_model.py:267-272)
        gt = rng.uniform(0, 255, (2, SIZE, SIZE, 3)).astype(np.float32)
        pred = rng.uniform(0, 255, (2, SIZE, SIZE, 3)).astype(np.float32)
        want_layers = []
        for g_f, p_f in zip(
            _tf_vgg_taps(params, gt), _tf_vgg_taps(params, pred)
        ):
            want_layers.append(tf.reduce_mean(tf.abs(g_f - p_f)))
        want = float(tf.reduce_mean(tf.stack(want_layers)))
        got_loss = float(perceptual_loss(params, jnp.asarray(gt), jnp.asarray(pred)))
        np.testing.assert_allclose(got_loss, want, rtol=1e-5)


def _tf_vgg_taps(params, rgb):
    from kpvid_tpu.losses.perceptual import VGG19_LAYOUT, VGG_FEATURE_LAYERS

    mean = [103.939, 116.779, 123.68]
    r, g, b = tf.split(tf.constant(rgb), 3, axis=3)
    x = tf.concat([b - mean[0], g - mean[1], r - mean[2]], axis=3)
    taps = []
    for name, _, pool in VGG19_LAYOUT:
        x = tf.nn.conv2d(x, tf.constant(params[name]["kernel"]), [1, 1, 1, 1], "SAME")
        x = tf.nn.relu(tf.nn.bias_add(x, tf.constant(params[name]["bias"])))
        if name in VGG_FEATURE_LAYERS:
            taps.append(x)
            if len(taps) == len(VGG_FEATURE_LAYERS):
                break
        if pool:
            x = tf.nn.max_pool(x, [1, 2, 2, 1], [1, 2, 2, 1], "SAME")
    return taps


@pytest.mark.slow
class TestComposedTrainLossOracle:
    """The COMPLETE stage-1 training objective against a raw-TF
    composition on the same weights (reference
    detector_translator_model.py:186-289): forward -> PatchGAN on
    real/fake -> loss_D = BCE(real,1) + BCE(fake,0); loss_G = VGG
    perceptual L1-of-features on [0,255]-scaled images (quirk Q7) +
    BCE(fake,1) — evaluated through the production Stage1Trainer.eval_step
    (inference-BN mode matching the TF moving-stat graph)."""

    def test_stage1_losses_match_tf_composition(self, model_weights, rng):
        from kpvid_tpu.configs import Config, ModelConfig, TrainingConfig
        from kpvid_tpu.losses import synthesize_vgg19_params
        from kpvid_tpu.train.stage1 import Stage1Trainer

        gen, variables, w = model_weights
        disc, d_vars, dw = _randomized_img_discr()
        vgg_params = synthesize_vgg19_params()

        cfg = Config(
            model=ModelConfig(
                n_pts=N_PTS, n_action=4, cell_info=(16, 16), vae_dim=8,
                image_size=SIZE, heatmap_size=SIZE // 4,
            ),
            training=TrainingConfig(batch_size=2, compute_dtype="float32"),
        ).validate()
        trainer = Stage1Trainer(cfg, vgg_params)
        state = trainer.init_state(jax.random.PRNGKey(7))
        state = state.replace(
            g_params=variables["params"],
            batch_stats=variables["batch_stats"],
            d_params=d_vars["params"],
        )

        im = rng.uniform(-1, 1, (2, SIZE, SIZE, 3)).astype(np.float32)
        fut = rng.uniform(-1, 1, (2, SIZE, SIZE, 3)).astype(np.float32)
        got = trainer.eval_step(
            state, {"image": jnp.asarray(im), "future_image": jnp.asarray(fut)}
        )

        # ------------------------------------------------------ TF oracle
        hs = SIZE // 4
        feats = _tf_encoder(w, tf.constant(im), "image_encoder/encoder")
        emb = ([tf.constant(im)] + feats)[-2]
        cur_mu = _tf_pose_encoder(w, tf.constant(im), final_res=SIZE)
        fut_mu = _tf_pose_encoder(w, tf.constant(fut), final_res=SIZE)
        joint = tf.concat(
            [emb, _tf_gaussian_maps(cur_mu, (hs, hs)),
             _tf_gaussian_maps(fut_mu, (hs, hs))], axis=-1,
        )
        crude, mask = _tf_translator(w, joint, final_res=SIZE)
        fake = tf.constant(im) * mask + crude * (1.0 - mask)

        real_logit = _tf_patchgan(dw, tf.constant(fut))
        fake_logit = _tf_patchgan(dw, fake)
        d_real = _tf_bce(real_logit, 1.0)
        d_fake = _tf_bce(fake_logit, 0.0)

        taps_gt = _tf_vgg_taps(vgg_params, (tf.constant(fut) + 1.0) * 127.5)
        taps_pred = _tf_vgg_taps(vgg_params, (fake + 1.0) * 127.5)
        recon = tf.reduce_mean(tf.stack([
            tf.reduce_mean(tf.abs(g - p)) for g, p in zip(taps_gt, taps_pred)
        ]))
        adv = _tf_bce(fake_logit, 1.0)

        np.testing.assert_allclose(float(got["D_real"]), float(d_real), rtol=1e-4)
        np.testing.assert_allclose(float(got["D_fake"]), float(d_fake), rtol=1e-4)
        np.testing.assert_allclose(
            float(got["loss_D"]), float(d_real + d_fake), rtol=1e-4
        )
        np.testing.assert_allclose(
            float(got["reconstruction_metric"]), float(recon), rtol=1e-3
        )
        np.testing.assert_allclose(float(got["G_adv_loss"]), float(adv), rtol=1e-4)
        np.testing.assert_allclose(
            float(got["loss_G"]), float(recon + adv), rtol=1e-3
        )


# ---------------------------------------------------- stage-2 (motion VAE)
def _tf_lstm_stack(w, scope, rnn_scope, xs, n_layers):
    """TF1 tf.nn.rnn_cell.LSTMCell stack, stepped over [B, T, D].

    Reference models/networks/layers.py:17-21 builds LSTMCell(name=
    'basic_lstm_cell', state_is_tuple=True); its cell math (TF1
    rnn_cell_impl.LSTMCell.call, no peepholes/projection) is
        i, j, f, o = split(matmul([x, h], kernel) + bias, 4)
        c' = sigmoid(f + forget_bias=1.0) * c + sigmoid(i) * tanh(j)
        h' = sigmoid(o) * tanh(c')
    composed here from the same tf kernels (matmul/sigmoid/tanh).
    Returns per-step outputs [B, T, H_last].
    """
    mid = "rnn/multi_rnn_cell" if rnn_scope else "multi_rnn_cell"
    kernels = [
        tf.constant(w[f"{scope}/{mid}/cell_{i}/basic_lstm_cell/kernel"])
        for i in range(n_layers)
    ]
    biases = [
        tf.constant(w[f"{scope}/{mid}/cell_{i}/basic_lstm_cell/bias"])
        for i in range(n_layers)
    ]
    b = xs.shape[0]
    states = [
        (tf.zeros((b, k.shape[-1] // 4)), tf.zeros((b, k.shape[-1] // 4)))
        for k in kernels
    ]
    outs = []
    for t in range(xs.shape[1]):
        inp = xs[:, t, :]
        for li in range(n_layers):
            c, h = states[li]
            gates = tf.matmul(tf.concat([inp, h], axis=-1), kernels[li]) + biases[li]
            i, j, f, o = tf.split(gates, 4, axis=-1)
            c2 = tf.sigmoid(f + 1.0) * c + tf.sigmoid(i) * tf.tanh(j)
            h2 = tf.sigmoid(o) * tf.tanh(c2)
            states[li] = (c2, h2)
            inp = h2
        outs.append(inp)
    return tf.stack(outs, axis=1)


def _tf_fc_relu(w, scope, x):
    # tf.contrib.layers.fully_connected DEFAULT activation is relu (Q6)
    return tf.nn.relu(
        tf.matmul(x, tf.constant(w[f"{scope}/fully_connected/weights"]))
        + tf.constant(w[f"{scope}/fully_connected/biases"])
    )


class TestStage2ForwardOracle:
    """MotionGenerator / SeqDiscriminator vs a TF rebuild of reference
    models/networks/__init__.py:105-138 on transcoded weights."""

    CELLS = (32, 48)
    VAE_DIM = 8
    N_FUT = 5
    N_ACT = 4

    @pytest.fixture(scope="class")
    def stage2_weights(self):
        from kpvid_tpu.models import MotionGenerator

        gen = MotionGenerator(
            n_pts=N_PTS, n_future=self.N_FUT, cell_info=self.CELLS,
            vae_dim=self.VAE_DIM, dtype=jnp.float32,
        )
        variables = jax.jit(
            lambda r: gen.init(
                r,
                jnp.zeros((1, self.N_FUT, 2 * N_PTS)),
                jnp.zeros((1, 2 * N_PTS)),
                jnp.zeros((1, self.N_ACT)),
                jnp.zeros((1, self.VAE_DIM)),
            )
        )(jax.random.PRNGKey(3))
        # randomize zero-init biases so every oracle term is nontrivial
        counter = [100]

        def rnd(leaf):
            counter[0] += 1
            if leaf.ndim == 1:
                r = np.random.default_rng(counter[0])
                return leaf + jnp.asarray(r.normal(0, 0.2, leaf.shape), jnp.float32)
            return leaf

        variables = {"params": jax.tree.map(rnd, variables["params"])}
        mapping = map_names(variables, "stage2")
        flat, _ = jax.tree_util.tree_flatten_with_path(variables)
        weights = {}
        for path, leaf in flat:
            key = tuple(_key_name(k) for k in path)
            assert key in mapping, f"unmapped stage-2 leaf {key}"
            weights[mapping[key]] = np.asarray(leaf, np.float32)
        return gen, variables, weights

    def test_encode_matches_tf(self, stage2_weights, rng):
        gen, variables, w = stage2_weights
        b = 3
        seq = rng.uniform(-1, 1, (b, self.N_FUT, 2 * N_PTS)).astype(np.float32)
        f_pt = rng.uniform(-1, 1, (b, 2 * N_PTS)).astype(np.float32)
        act = np.eye(self.N_ACT, dtype=np.float32)[[0, 1, 2]]

        # reference vae_encoder (:105-113): dynamic_rnn -> last output ++
        # f_pt ++ act -> relu'd FC -> split mu/stddev
        outs = _tf_lstm_stack(w, "vae_encoder", True, tf.constant(seq), len(self.CELLS))
        logit = _tf_fc_relu(
            w, "vae_encoder",
            tf.concat([outs[:, -1, :], tf.constant(f_pt), tf.constant(act)], axis=-1),
        )
        want_mu = logit[:, : self.VAE_DIM].numpy()
        want_sd = logit[:, self.VAE_DIM:].numpy()

        got_mu, got_sd = gen.apply(
            variables, jnp.asarray(seq), jnp.asarray(f_pt), jnp.asarray(act),
            method=gen.encode,
        )
        np.testing.assert_allclose(np.asarray(got_mu), want_mu, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_sd), want_sd, rtol=1e-5, atol=1e-6)

    def test_decode_matches_tf(self, stage2_weights, rng):
        gen, variables, w = stage2_weights
        b = 3
        z = rng.normal(size=(b, self.VAE_DIM)).astype(np.float32)
        f_pt = rng.uniform(-1, 1, (b, 2 * N_PTS)).astype(np.float32)
        act = np.eye(self.N_ACT, dtype=np.float32)[[1, 3, 0]]

        # reference vae_decoder (:116-129): relu'd FC -> step 0 input, zero
        # inputs for steps 1..T-1, shared tanh to_coord head per step
        inp0 = _tf_fc_relu(
            w, "vae_decoder",
            tf.concat([tf.constant(z), tf.constant(f_pt), tf.constant(act)], axis=-1),
        )
        xs = tf.concat(
            [inp0[:, None, :], tf.zeros((b, self.N_FUT - 1, inp0.shape[-1]))], axis=1
        )
        outs = _tf_lstm_stack(w, "vae_decoder", False, xs, len(self.CELLS))
        W = tf.constant(w["vae_decoder/fully_connected/W"])
        bb = tf.constant(w["vae_decoder/fully_connected/b"])
        want = tf.stack(
            [tf.tanh(tf.matmul(outs[:, t, :], W) + bb) for t in range(self.N_FUT)],
            axis=1,
        ).numpy()

        got = gen.apply(
            variables, jnp.asarray(z), jnp.asarray(f_pt), jnp.asarray(act),
            method=gen.decode,
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)

    def test_seq_discr_matches_tf(self, rng):
        """reference seq_discr (:132-138): LSTM stack -> relu'd per-step FC
        -> LAST step's logit (the flax module computes the head on the last
        step only — same value)."""
        from kpvid_tpu.models import SeqDiscriminator

        disc = SeqDiscriminator(cell_info=self.CELLS, dtype=jnp.float32)
        seq0 = jnp.zeros((1, self.N_FUT, 2 * N_PTS))
        variables = jax.jit(lambda r: disc.init(r, seq0))(jax.random.PRNGKey(5))
        counter = [200]

        def rnd(leaf):
            counter[0] += 1
            if leaf.ndim == 1:
                r = np.random.default_rng(counter[0])
                return leaf + jnp.asarray(r.normal(0, 0.2, leaf.shape), jnp.float32)
            return leaf

        variables = {"params": jax.tree.map(rnd, variables["params"])}
        mapping = map_names(variables, "stage2_discr")
        flat, _ = jax.tree_util.tree_flatten_with_path(variables)
        w = {}
        for path, leaf in flat:
            key = tuple(_key_name(k) for k in path)
            assert key in mapping, f"unmapped seq-discr leaf {key}"
            w[mapping[key]] = np.asarray(leaf, np.float32)

        b = 3
        seq = rng.uniform(-1, 1, (b, self.N_FUT, 2 * N_PTS)).astype(np.float32)
        outs = _tf_lstm_stack(w, "seq_discr", True, tf.constant(seq), len(self.CELLS))
        want = _tf_fc_relu(w, "seq_discr", outs[:, -1, :]).numpy()

        got = disc.apply(variables, jnp.asarray(seq))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)

    def test_stage2_losses_match_tf_composition(self, stage2_weights, rng):
        """The COMPLETE stage-2 training objective (reference
        motion_generator_model.py:277-308): encode -> z = mu + sigma*eps
        (same eps injected both sides) -> decode -> seq_discr on real/pred
        -> loss_D = BCE(real,1)+BCE(fake,0); loss_G = mean(1000*|pred -
        real|) + KL(raw-relu-sigma, 1e-8 guard) + BCE(fake,1) — through
        the production Stage2Trainer.eval_step."""
        from kpvid_tpu.configs import Config, ModelConfig, TrainingConfig
        from kpvid_tpu.models import SeqDiscriminator
        from kpvid_tpu.train.stage2 import Stage2Trainer

        gen, variables, w = stage2_weights

        # a randomized seq-discr transcoded the same way
        disc = SeqDiscriminator(cell_info=self.CELLS, dtype=jnp.float32)
        d_vars = jax.jit(
            lambda r: disc.init(r, jnp.zeros((1, self.N_FUT, 2 * N_PTS)))
        )(jax.random.PRNGKey(5))
        counter = [300]

        def rnd(leaf):
            counter[0] += 1
            if leaf.ndim == 1:
                r = np.random.default_rng(counter[0])
                return leaf + jnp.asarray(r.normal(0, 0.2, leaf.shape), jnp.float32)
            return leaf

        d_vars = {"params": jax.tree.map(rnd, d_vars["params"])}
        mapping = map_names(d_vars, "stage2_discr")
        flat, _ = jax.tree_util.tree_flatten_with_path(d_vars)
        dw = {}
        for path, leaf in flat:
            dw[mapping[tuple(_key_name(k) for k in path)]] = np.asarray(leaf, np.float32)

        cfg = Config(
            model=ModelConfig(
                n_pts=N_PTS, n_action=self.N_ACT, cell_info=self.CELLS,
                vae_dim=self.VAE_DIM, image_size=SIZE, heatmap_size=SIZE // 4,
                n_future_frames=self.N_FUT,
            ),
            training=TrainingConfig(batch_size=3, compute_dtype="float32"),
        ).validate()
        trainer = Stage2Trainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(11))
        state = state.replace(g_params=variables["params"], d_params=d_vars["params"])

        b = 3
        kp = rng.uniform(-1, 1, (b, N_PTS, 2)).astype(np.float32)
        real = rng.uniform(-1, 1, (b, self.N_FUT, N_PTS, 2)).astype(np.float32)
        act = np.eye(self.N_ACT, dtype=np.float32)[[2, 0, 1]]
        eval_rng = jax.random.PRNGKey(42)
        got = trainer.eval_step(
            state,
            {"keypoints": jnp.asarray(kp), "real_seq": jnp.asarray(real),
             "action_code": jnp.asarray(act)},
            eval_rng,
        )
        # the exact eps eval_step draws (same key, same shape)
        noise = np.asarray(
            jax.random.normal(eval_rng, (b, self.VAE_DIM), jnp.float32)
        )

        # ------------------------------------------------------ TF oracle
        f_pt = kp.reshape(b, -1)
        real_flat = real.reshape(b, self.N_FUT, -1)
        outs = _tf_lstm_stack(
            w, "vae_encoder", True, tf.constant(real_flat), len(self.CELLS)
        )
        logit = _tf_fc_relu(
            w, "vae_encoder",
            tf.concat([outs[:, -1, :], tf.constant(f_pt), tf.constant(act)], axis=-1),
        )
        mu, sd = logit[:, : self.VAE_DIM], logit[:, self.VAE_DIM:]
        z = mu + sd * tf.constant(noise)
        inp0 = _tf_fc_relu(
            w, "vae_decoder",
            tf.concat([z, tf.constant(f_pt), tf.constant(act)], axis=-1),
        )
        xs = tf.concat(
            [inp0[:, None, :], tf.zeros((b, self.N_FUT - 1, inp0.shape[-1]))], axis=1
        )
        dec = _tf_lstm_stack(w, "vae_decoder", False, xs, len(self.CELLS))
        W = tf.constant(w["vae_decoder/fully_connected/W"])
        bb = tf.constant(w["vae_decoder/fully_connected/b"])
        pred = tf.stack(
            [tf.tanh(tf.matmul(dec[:, t, :], W) + bb) for t in range(self.N_FUT)],
            axis=1,
        )

        def discr_logit(seq):
            o = _tf_lstm_stack(dw, "seq_discr", True, seq, len(self.CELLS))
            return _tf_fc_relu(dw, "seq_discr", o[:, -1, :])

        real_logit = discr_logit(tf.constant(real_flat))
        fake_logit = discr_logit(pred)
        d_real = _tf_bce(real_logit, 1.0)
        d_fake = _tf_bce(fake_logit, 0.0)
        recon = tf.reduce_mean(1000.0 * tf.abs(pred - tf.constant(real_flat)))
        var = tf.square(sd)
        kl = tf.reduce_mean(
            0.5 * tf.reduce_sum(
                tf.square(mu) + var - tf.math.log(1e-8 + var) - 1.0, axis=1
            )
        )
        adv = _tf_bce(fake_logit, 1.0)

        np.testing.assert_allclose(float(got["D_real"]), float(d_real), rtol=1e-4)
        np.testing.assert_allclose(float(got["D_fake"]), float(d_fake), rtol=1e-4)
        np.testing.assert_allclose(float(got["recon_loss"]), float(recon), rtol=1e-4)
        np.testing.assert_allclose(float(got["kl_loss"]), float(kl), rtol=1e-4)
        np.testing.assert_allclose(float(got["G_adv_loss"]), float(adv), rtol=1e-4)
        np.testing.assert_allclose(
            float(got["loss_G"]), float(recon + kl + adv), rtol=1e-4
        )


# ------------------------------------------- composed final serving graph
@pytest.mark.slow
class TestComposedFinalOracle:
    """The SHIPPED serving product — encode -> first_pt -> fixed z ->
    scan-decode -> render -> translate -> blend as ONE graph, fast paths
    included — against a raw-TF replica of reference
    models/final_model.py:49-122 (same z injected on both sides).

    Covers BOTH split_first_conv settings and BOTH 'tf1' and 'fused'
    upsample modes of the production FinalGenerator.generate at f32.
    """

    N_FUT = 5
    CELLS = (32, 48)
    VAE_DIM = 8
    N_ACT = 4

    @pytest.fixture(scope="class")
    def stage2_weights(self):
        from kpvid_tpu.models import MotionGenerator

        gen = MotionGenerator(
            n_pts=N_PTS, n_future=self.N_FUT, cell_info=self.CELLS,
            vae_dim=self.VAE_DIM, dtype=jnp.float32,
        )
        variables = jax.jit(
            lambda r: gen.init(
                r,
                jnp.zeros((1, self.N_FUT, 2 * N_PTS)),
                jnp.zeros((1, 2 * N_PTS)),
                jnp.zeros((1, self.N_ACT)),
                jnp.zeros((1, self.VAE_DIM)),
            )
        )(jax.random.PRNGKey(11))
        counter = [300]

        def rnd(leaf):
            counter[0] += 1
            if leaf.ndim == 1:
                r = np.random.default_rng(counter[0])
                return leaf + jnp.asarray(r.normal(0, 0.2, leaf.shape), jnp.float32)
            return leaf

        variables = {"params": jax.tree.map(rnd, variables["params"])}
        mapping = map_names(variables, "stage2")
        flat, _ = jax.tree_util.tree_flatten_with_path(variables)
        weights = {}
        for path, leaf in flat:
            key = tuple(_key_name(k) for k in path)
            assert key in mapping, f"unmapped stage-2 leaf {key}"
            weights[mapping[key]] = np.asarray(leaf, np.float32)
        return variables, weights

    def _tf_composed(self, w1, w2, im, act, z):
        """Raw-TF replica of final_model.py:49-122 at test shapes
        (B, SIZE=32, hs=8, T=N_FUT), with z injected."""
        b, t, hs = im.shape[0], self.N_FUT, SIZE // 4

        def tile_t(x):
            # reference tf.tile(expand_dims(x,1),[1,T,..]) + reshape:
            # sample-major layout, row b*T + t -> sample b
            shape = [int(s) for s in x.shape[1:]]
            return tf.reshape(
                tf.tile(x[:, None], [1, t] + [1] * len(shape)), [-1] + shape
            )

        tiled_im = tile_t(tf.constant(im))
        feats = _tf_encoder(w1, tf.constant(im), "image_encoder/encoder")
        emb = tile_t(([tf.constant(im)] + feats)[-2])
        first_pt = _tf_pose_encoder(w1, tf.constant(im), final_res=SIZE)

        # vae_decoder (reference networks/__init__.py:116-129) on the
        # injected z
        inp0 = _tf_fc_relu(
            w2, "vae_decoder",
            tf.concat(
                [tf.constant(z), tf.reshape(first_pt, [b, 2 * N_PTS]),
                 tf.constant(act)], axis=-1,
            ),
        )
        xs = tf.concat(
            [inp0[:, None, :], tf.zeros((b, t - 1, inp0.shape[-1]))], axis=1
        )
        outs = _tf_lstm_stack(w2, "vae_decoder", False, xs, len(self.CELLS))
        W = tf.constant(w2["vae_decoder/fully_connected/W"])
        bb = tf.constant(w2["vae_decoder/fully_connected/b"])
        pred_seq = tf.stack(
            [tf.tanh(tf.matmul(outs[:, i, :], W) + bb) for i in range(t)], axis=1
        )  # [B, T, 2K]
        pred_pts = tf.reshape(pred_seq, [b * t, N_PTS, 2])

        cur_map = tile_t(_tf_gaussian_maps(first_pt, (hs, hs)))
        pred_map = _tf_gaussian_maps(pred_pts, (hs, hs))
        joint = tf.concat([emb, cur_map, pred_map], axis=-1)
        crude, mask = _tf_translator(w1, joint, final_res=SIZE)
        final = tiled_im * mask + crude * (1.0 - mask)
        crude = tf.clip_by_value(crude, -1, 1)
        final = tf.clip_by_value(final, -1, 1)
        return {
            "pred_im_seq": tf.reshape(final, [b, t, SIZE, SIZE, 3]).numpy(),
            "mask": tf.reshape(mask, [b, t, SIZE, SIZE, 1]).numpy(),
            "pred_im_crude": tf.reshape(crude, [b, t, SIZE, SIZE, 3]).numpy(),
            "current_points": first_pt.numpy(),
            "future_points": tf.reshape(pred_seq, [b, t, N_PTS, 2]).numpy(),
        }

    @pytest.mark.parametrize("upsample_mode", ["tf1", "fused"])
    @pytest.mark.parametrize("split_first_conv", [True, False])
    def test_generate_matches_tf_composition(
        self, model_weights, stage2_weights, rng, upsample_mode, split_first_conv
    ):
        from kpvid_tpu.configs import Config, ModelConfig, TrainingConfig
        from kpvid_tpu.eval import FinalGenerator

        gen1, s1_vars, w1 = model_weights
        s2_vars, w2 = stage2_weights

        cfg = Config(
            model=ModelConfig(
                n_pts=N_PTS, n_action=self.N_ACT, cell_info=self.CELLS,
                vae_dim=self.VAE_DIM, image_size=SIZE, heatmap_size=SIZE // 4,
                n_future_frames=self.N_FUT,
            ),
            training=TrainingConfig(batch_size=2, compute_dtype="float32"),
        ).validate()
        final = FinalGenerator(cfg, upsample_mode=upsample_mode)

        b = 2
        im = rng.uniform(-1, 1, (b, SIZE, SIZE, 3)).astype(np.float32)
        act = np.eye(self.N_ACT, dtype=np.float32)[[1, 3]]
        gen_rng = jax.random.PRNGKey(17)
        # the exact z generate() will draw internally, injected into TF
        z = np.asarray(
            jax.random.normal(gen_rng, (b, self.VAE_DIM), jnp.float32)
        )

        want = self._tf_composed(w1, w2, im, act, z)
        got = jax.jit(
            final.generate, static_argnames=("split_first_conv",)
        )(
            s1_vars, s2_vars["params"], jnp.asarray(im), jnp.asarray(act),
            gen_rng, split_first_conv=split_first_conv,
        )
        np.testing.assert_allclose(
            np.asarray(got["current_points"]), want["current_points"],
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(got["future_points"]), want["future_points"],
            rtol=1e-4, atol=1e-5,
        )
        for k in ("pred_im_seq", "mask", "pred_im_crude"):
            np.testing.assert_allclose(
                np.asarray(got[k]), want[k], rtol=1e-4, atol=1e-4, err_msg=k
            )
