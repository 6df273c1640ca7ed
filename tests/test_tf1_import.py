"""TF1 reference checkpoint transcoding tests.

The name-mapping tests are pure; the end-to-end transcode test synthesizes
a real TF checkpoint with the reference's variable names (via
tf.compat.v1.train.Saver) and round-trips it into the flax tree.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kpvid_tpu.models import (
    ImageDiscriminator,
    MotionGenerator,
    SeqDiscriminator,
    Stage1Generator,
)
from kpvid_tpu.utils.tf1_import import map_names


@pytest.fixture(scope="module")
def stage1_vars():
    g = Stage1Generator(n_pts=4, heatmap_size=8)
    x = jnp.zeros((1, 32, 32, 3))
    return jax.eval_shape(lambda r: g.init(r, x, x, train=False), jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def stage2_vars():
    mg = MotionGenerator(n_pts=4, n_future=8, cell_info=(16, 16), vae_dim=8)
    return jax.eval_shape(
        lambda r: mg.init(
            r, jnp.zeros((1, 8, 8)), jnp.zeros((1, 8)), jnp.zeros((1, 9)), jnp.zeros((1, 8))
        ),
        jax.random.PRNGKey(0),
    )


class TestNameMapping:
    def test_stage1_full_coverage(self, stage1_vars):
        mapping = map_names(stage1_vars, "stage1")
        n_leaves = len(jax.tree.leaves(stage1_vars))
        assert len(mapping) == n_leaves, "every stage-1 tensor must map"
        names = set(mapping.values())
        # spot checks against the reference graph's naming
        assert "image_encoder/encoder/conv_1/conv2d/kernel" in names
        assert "image_encoder/encoder/b_norm_8/moving_variance" in names
        assert "pose_encoder/encoder/conv_3/conv2d/bias" in names
        assert "pose_encoder/conv_1_0/conv2d/kernel" in names  # decoder
        assert "pose_encoder/conv_0/conv2d/kernel" in names  # final 1x1
        assert "translator/conv_6_0/conv2d/kernel" in names  # crude head
        assert "translator/conv_6_1/conv2d/bias" in names  # mask head
        assert "translator/b_norm_5_1/gamma" in names

    def test_stage1_discr(self):
        d = ImageDiscriminator()
        variables = jax.eval_shape(
            lambda r: d.init(r, jnp.zeros((1, 64, 64, 3))), jax.random.PRNGKey(0)
        )
        mapping = map_names(variables, "stage1_discr")
        names = set(mapping.values())
        assert len(mapping) == len(jax.tree.leaves(variables))
        assert "img_discr/conv_0/conv2d/kernel" in names
        assert "img_discr/conv_5/conv2d/bias" in names
        assert "img_discr/D_logit/conv2d/kernel" in names

    def test_stage2_full_coverage(self, stage2_vars):
        mapping = map_names(stage2_vars, "stage2")
        assert len(mapping) == len(jax.tree.leaves(stage2_vars))
        names = set(mapping.values())
        assert "vae_encoder/rnn/multi_rnn_cell/cell_0/basic_lstm_cell/kernel" in names
        assert "vae_encoder/fully_connected/weights" in names
        assert "vae_decoder/multi_rnn_cell/cell_1/basic_lstm_cell/bias" in names
        assert "vae_decoder/fully_connected/weights" in names  # dec_in
        assert "vae_decoder/fully_connected/W" in names  # to_coord
        assert "vae_decoder/fully_connected/b" in names

    def test_seq_discr(self):
        d = SeqDiscriminator(cell_info=(16, 16))
        variables = jax.eval_shape(
            lambda r: d.init(r, jnp.zeros((1, 8, 8))), jax.random.PRNGKey(0)
        )
        mapping = map_names(variables, "stage2_discr")
        names = set(mapping.values())
        assert len(mapping) == len(jax.tree.leaves(variables))
        assert "seq_discr/rnn/multi_rnn_cell/cell_0/basic_lstm_cell/kernel" in names
        assert "seq_discr/fully_connected/weights" in names


@pytest.mark.skipif(
    not pytest.importorskip("tensorflow", reason="tensorflow not available"),
    reason="tensorflow not available",
)
def test_transcode_end_to_end(tmp_path, stage2_vars):
    """Write a TF checkpoint with the reference's stage-2 names, transcode,
    verify values land on the right flax leaves."""
    import tensorflow as tf

    from kpvid_tpu.utils.tf1_import import transcode_tf1_checkpoint

    mapping = map_names(stage2_vars, "stage2")
    flat, _ = jax.tree_util.tree_flatten_with_path(stage2_vars)
    rng = np.random.default_rng(0)
    tf_vars = {}
    values = {}
    for path, leaf in flat:
        from kpvid_tpu.utils.checkpoint import _key_name

        key = tuple(_key_name(k) for k in path)
        name = mapping[key]
        val = rng.normal(size=leaf.shape).astype(np.float32)
        values[key] = val
        tf_vars[name] = tf.Variable(val, name=name.replace("/", "_"))
    ckpt_path = str(tmp_path / "ref.ckpt")
    saver = tf.compat.v1.train.Saver(var_list=tf_vars)
    sess = None
    saver.save(sess, ckpt_path, write_meta_graph=False)

    zeros = jax.tree.map(lambda l: jnp.zeros(l.shape, l.dtype), stage2_vars)
    merged, report = transcode_tf1_checkpoint(ckpt_path, zeros, "stage2")
    assert not report["missing"] and not report["mismatched"]
    assert len(report["matched"]) == len(jax.tree.leaves(stage2_vars))
    merged_flat, _ = jax.tree_util.tree_flatten_with_path(merged)
    for path, leaf in merged_flat:
        from kpvid_tpu.utils.checkpoint import _key_name

        key = tuple(_key_name(k) for k in path)
        np.testing.assert_array_equal(np.asarray(leaf), values[key])
