"""TF1 reference-checkpoint transcoding.

Maps the reference's TF1 variable names onto this framework's flax param
pytree so pretrained reference checkpoints can be loaded directly
(the checkpoint-fidelity path from SURVEY §7's hard parts).

Name conventions being decoded (all derived from the reference graph
construction, models/networks/*):
- `layers.conv(scope=s)` wraps tf.layers.conv2d -> `<scope>/s/conv2d/kernel|bias`
  (reference models/networks/layers.py:4-10),
- `layers.batch_norm(scope=s)` -> `<scope>/s/{gamma,beta,moving_mean,
  moving_variance}` (tf.contrib.layers.batch_norm with an explicit scope),
- LSTM stacks -> `<scope>[/rnn]/multi_rnn_cell/cell_{i}/basic_lstm_cell/
  kernel|bias` with kernel [in+units, 4*units], gate order i,j,f,o and a
  runtime forget_bias=1.0 (matching models/layers.StackedLSTM exactly;
  `rnn/` appears only under dynamic_rnn, i.e. vae_encoder and seq_discr,
  not vae_decoder's manual unroll; reference networks/__init__.py:105-138),
- `tf.contrib.layers.fully_connected` -> `<scope>/fully_connected/weights|
  biases`; the shared `to_coord` head -> `vae_decoder/fully_connected/W|b`
  (reference layers.py:24-28).

Layouts: TF conv kernels are HWIO and FC kernels [in, out] — identical to
flax; no transposes needed. BN: gamma->scale, beta->bias,
moving_mean->batch_stats.mean, moving_variance->batch_stats.var.

`map_names` is pure (testable without TF); `transcode_tf1_checkpoint`
needs TensorFlow to read the checkpoint and is import-gated.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

from .checkpoint import _key_name

# flax trunk block name -> reference encoder conv index
_TRUNK = {
    "in0": 1, "in1": 2,
    "down0": 3, "keep0": 4,
    "down1": 5, "keep1": 6,
    "down2": 7, "keep2": 8,
}


def _conv_leaf(tf_scope: str, leaf: str) -> str:
    return f"{tf_scope}/conv2d/{'kernel' if leaf == 'kernel' else 'bias'}"


def _bn_leaf(tf_scope: str, leaf: str) -> str:
    return tf_scope + "/" + {
        "scale": "gamma",
        "bias": "beta",
        "mean": "moving_mean",
        "var": "moving_variance",
    }[leaf]


def _trunk_name(parts: list[str], leaf: str, prefix: str) -> str | None:
    """parts like ['in0_conv', 'Conv_0'] or ['down1_bn', 'BatchNorm_0']."""
    head = parts[0]
    if head.endswith("_conv"):
        idx = _TRUNK.get(head[:-5])
        if idx is None:
            return None
        return _conv_leaf(f"{prefix}/conv_{idx}", leaf)
    if head.endswith("_bn"):
        idx = _TRUNK.get(head[:-3])
        if idx is None:
            return None
        return _bn_leaf(f"{prefix}/b_norm_{idx}", leaf)
    return None


def _decoder_name(parts: list[str], leaf: str, prefix: str) -> str | None:
    """Pose-decoder / translator blocks: dec{o}{a-d} / oct{o}{a-d} map to
    conv_{2o+1}_0, conv_{2o+1}_1, conv_{2o+2}_0, conv_{2o+2}_1."""
    head = parts[0]
    for tag in ("dec", "oct"):
        if head.startswith(tag) and (head.endswith("_conv") or head.endswith("_bn")):
            body = head[len(tag):].split("_")[0]  # e.g. '0a'
            octave, sub = int(body[:-1]), body[-1]
            conv_id = 2 * octave + 1 + (0 if sub in "ab" else 1)
            col = 0 if sub in "ac" else 1
            if head.endswith("_conv"):
                return _conv_leaf(f"{prefix}/conv_{conv_id}_{col}", leaf)
            return _bn_leaf(f"{prefix}/b_norm_{conv_id}_{col}", leaf)
    return None


def _stage1_tf_name(path: tuple[str, ...]) -> str | None:
    """flax path (module..., flax_leaf_module, leaf) -> reference TF1 name
    (any params/batch_stats collection prefix is stripped by map_names)."""
    *parts, _flax_mod, leaf = path  # _flax_mod is Conv_0/BatchNorm_0/...
    # paths look like: (image_encoder, trunk, in0_conv, Conv_0, kernel)
    if parts and parts[0] == "image_encoder":
        rest = parts[1:]
        if rest and rest[0] == "trunk":
            return _trunk_name(rest[1:], leaf, "image_encoder/encoder")
        return None
    if parts and parts[0] == "pose_encoder":
        rest = parts[1:]
        if rest and rest[0] == "trunk":
            return _trunk_name(rest[1:], leaf, "pose_encoder/encoder")
        if rest and rest[0] == "heat":
            # the final 1x1 conv uses layers.conv's DEFAULT scope 'conv_0'
            # (reference networks/__init__.py:54)
            return _conv_leaf("pose_encoder/conv_0", leaf)
        return _decoder_name(rest, leaf, "pose_encoder")
    if parts and parts[0] == "translator":
        rest = parts[1:]
        if rest and rest[0] == "crude":
            return _conv_leaf("translator/conv_6_0", leaf)
        if rest and rest[0] == "mask":
            return _conv_leaf("translator/conv_6_1", leaf)
        return _decoder_name(rest, leaf, "translator")
    return None


def _discr_tf_name(path: tuple[str, ...]) -> str | None:
    *parts, _mod, leaf = path
    if not parts:
        return None
    head = parts[0]
    if head == "logit":
        return _conv_leaf("img_discr/D_logit", leaf)
    if head.startswith("conv"):
        return _conv_leaf(f"img_discr/conv_{head[4:]}", leaf)
    return None


def _stage2_tf_name(path: tuple[str, ...]) -> str | None:
    head, leaf = path[0], path[-1]

    def lstm(scope: str, rnn: bool) -> str:
        # leaf like 'lstm_0_kernel'
        _, idx, kind = leaf.split("_")
        mid = "rnn/multi_rnn_cell" if rnn else "multi_rnn_cell"
        return f"{scope}/{mid}/cell_{idx}/basic_lstm_cell/{kind}"

    def fc(scope: str) -> str:
        return f"{scope}/fully_connected/" + (
            "weights" if leaf == "kernel" else "biases"
        )

    if head == "enc_lstm":
        return lstm("vae_encoder", rnn=True)
    if head == "enc_head":
        return fc("vae_encoder")
    if head == "dec_in":
        return fc("vae_decoder")
    if head == "dec_lstm":
        return lstm("vae_decoder", rnn=False)
    if head == "to_coord":
        return f"vae_decoder/fully_connected/{'W' if leaf == 'kernel' else 'b'}"
    # sequence discriminator (its own tree)
    if head.startswith("StackedLSTM"):
        return lstm("seq_discr", rnn=True)
    if head.startswith("Dense"):
        return fc("seq_discr")
    return None


def map_names(target_vars: Any, stage: str) -> dict[tuple[str, ...], str]:
    """flax path tuple -> expected TF1 variable name, for every leaf the
    mapping covers. stage: 'stage1' | 'stage1_discr' | 'stage2' |
    'stage2_discr'."""
    mapper = {
        "stage1": _stage1_tf_name,
        "stage1_discr": _discr_tf_name,
        "stage2": _stage2_tf_name,
        "stage2_discr": _stage2_tf_name,
    }[stage]
    flat, _ = jax.tree_util.tree_flatten_with_path(target_vars)
    out = {}
    for path, _leaf in flat:
        key = tuple(_key_name(k) for k in path)
        stripped = key[1:] if key[0] in ("params", "batch_stats") else key
        name = mapper(stripped)
        if name is not None:
            out[key] = name
    return out


def transcode_tf1_checkpoint(
    ckpt_path: str, target_vars: Any, stage: str
) -> tuple[Any, dict]:
    """Load a reference TF1 checkpoint and graft its weights onto
    `target_vars`. Returns (merged_vars, report) where report lists
    matched/missing/shape-mismatched names. Requires TensorFlow."""
    import tensorflow as tf  # gated: only needed for this import path

    reader = tf.train.load_checkpoint(ckpt_path)
    tf_shapes = reader.get_variable_to_shape_map()
    mapping = map_names(target_vars, stage)

    flat, treedef = jax.tree_util.tree_flatten_with_path(target_vars)
    merged, matched, missing, mismatched = [], [], [], []
    for path, leaf in flat:
        key = tuple(_key_name(k) for k in path)
        tf_name = mapping.get(key)
        if tf_name is None or tf_name not in tf_shapes:
            if tf_name is not None:
                missing.append(tf_name)
            merged.append(leaf)
            continue
        value = np.asarray(reader.get_tensor(tf_name))
        if tuple(value.shape) != tuple(leaf.shape):
            mismatched.append((tf_name, value.shape, tuple(leaf.shape)))
            merged.append(leaf)
            continue
        merged.append(jax.numpy.asarray(value, dtype=leaf.dtype))
        matched.append(tf_name)
    report = {"matched": matched, "missing": missing, "mismatched": mismatched}
    return jax.tree_util.tree_unflatten(treedef, merged), report
