"""Network definitions (pure-functional Flax modules).

Counterpart of reference models/networks/__init__.py, with the reference's
exact filter schedules and head conventions, built TPU-first:

- both frames of a stage-1 pair go through the pose encoder as ONE 2B batch
  (the reference calls the shared-weight encoder twice;
  models/detector_translator_model.py:166-167) — bigger batches for the MXU.
  Design note D1: in train mode this computes BN batch statistics over the
  joint 2B batch instead of per-call; same expectation, lower variance.
- LSTM stacks are lax.scan (layers.StackedLSTM), and the per-step output
  heads (to_coord / seq-discr FC) are applied to ALL timesteps in one
  [B*T, H] matmul after the scan.
- spatial soft-argmax always runs in f32 even under bf16 compute.

QUIRK (Q6-revised): the reference's `tf.contrib.layers.fully_connected`
defaults to ReLU activation, and vae_encoder's mu/stddev head
(networks/__init__.py:110), vae_decoder's input projection (:120) and
seq_discr's per-step logit (:137) all use that default. So mu >= 0,
stddev >= 0 (KL guards log with 1e-8), the decoder's step-0 input is
relu'd, and the sequence discriminator emits non-negative logits. We
replicate all three faithfully.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import (
    heatmaps_to_keypoints,
    pair_fns,
    render_gaussian_maps,
    upsample2x,
)
from .layers import BatchNorm, Conv, Dense, StackedLSTM, conv_bn_relu

Dtype = Any


class ConvEncoder(nn.Module):
    """Shared conv trunk: 7x7s1 + 3x3s1 at base width, then 3 octaves of
    [3x3s2 + 3x3s1] with doubling filters; BN+ReLU throughout. Returns the
    four block features at 128^2/64^2/32^2/16^2 resolution.

    Parity: reference models/networks/__init__.py:7-26.
    """

    filters: int = 32
    dtype: Dtype = jnp.float32
    # cross-replica (sync) BN axis for shard_map DP (parallel/dp_step.py)
    bn_axis: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> list[jax.Array]:
        f = self.filters
        ba = self.bn_axis
        x = conv_bn_relu(x, f, 7, 1, train, self.dtype, "in0", bn_axis=ba)
        x = conv_bn_relu(x, f, 3, 1, train, self.dtype, "in1", bn_axis=ba)
        feats = [x]
        for i in range(3):
            f *= 2
            x = conv_bn_relu(x, f, 3, 2, train, self.dtype, f"down{i}", bn_axis=ba)
            x = conv_bn_relu(x, f, 3, 1, train, self.dtype, f"keep{i}", bn_axis=ba)
            feats.append(x)
        return feats


class ImageEncoder(nn.Module):
    """Appearance encoder; consumers use feats[-2] = 32^2 x 128ch
    (reference models/networks/__init__.py:29-33)."""

    filters: int = 32
    dtype: Dtype = jnp.float32
    bn_axis: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> list[jax.Array]:
        feats = ConvEncoder(
            self.filters, self.dtype, bn_axis=self.bn_axis, name="trunk"
        )(x, train)
        return [x] + feats


class PoseEncoder(nn.Module):
    """Unsupervised keypoint detector: trunk + skip-connected upsampling
    decoder to a K-channel raw heatmap at full resolution, then spatial
    soft-argmax to (x, y) in [-1, 1].

    Parity: reference models/networks/__init__.py:36-72 — decoder filters
    start at 128 and halve per octave; skip-concat of trunk features at each
    upsample; final 1x1 conv to K channels; soft-argmax via axis marginals.
    Returns keypoints [B, K, 2]; `return_raw_maps` also yields the raw
    heatmap for the fused-Pallas path and diagnostics.
    """

    n_pts: int
    filters: int = 128
    trunk_filters: int = 32
    dtype: Dtype = jnp.float32
    # 'tf1' (training default) or 'fused': each 2x upsample folds into the
    # next octave's first conv, with the skip-concat handled by kernel
    # splitting (conv of a concat = sum of per-part convs) — exact; used
    # by the serving/labeling path (see Translator.upsample_mode).
    upsample_mode: str = "tf1"
    bn_axis: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool, return_raw_maps: bool = False):
        final_res = x.shape[1]
        ba = self.bn_axis
        feats = ConvEncoder(
            self.trunk_filters, self.dtype, bn_axis=ba, name="trunk"
        )(x, train)
        x = feats[-1]
        f = self.filters
        octave = 0
        pending_up = False
        while True:
            if octave > 0:
                x = conv_bn_relu(
                    x, f, 3, 1, train, self.dtype, f"dec{octave}a",
                    pre_up2=pending_up, skip=feats[-1 - octave], bn_axis=ba,
                )
                pending_up = False
            else:
                x = conv_bn_relu(
                    x, f, 3, 1, train, self.dtype, f"dec{octave}a", bn_axis=ba
                )
            x = conv_bn_relu(x, f, 3, 1, train, self.dtype, f"dec{octave}b", bn_axis=ba)
            if x.shape[1] == final_res:
                raw = Conv(self.n_pts, 1, 1, dtype=self.dtype, name="heat")(x)
                break
            x = conv_bn_relu(x, f, 3, 1, train, self.dtype, f"dec{octave}c", bn_axis=ba)
            x = conv_bn_relu(x, f, 3, 1, train, self.dtype, f"dec{octave}d", bn_axis=ba)
            if self.upsample_mode == "fused":
                pending_up = True
            else:
                x = upsample2x(x, mode=self.upsample_mode)
            if f >= 8:
                f //= 2
            octave += 1
        mu = heatmaps_to_keypoints(raw.astype(jnp.float32))
        if return_raw_maps:
            return mu, raw
        return mu


class Translator(nn.Module):
    """Image decoder: joint embedding at 32^2 -> two conv blocks per octave,
    2x upsample, filters halving from 256; heads: 3ch crude image + 1ch
    sigmoid blending mask (reference models/networks/__init__.py:75-102).

    final_res=None upsamples 4x (the embedding is always at image_size/4,
    so output lands at image_size)."""

    filters: int = 256
    final_res: int | None = None
    dtype: Dtype = jnp.float32
    # 'tf1' (training default) or 'matmul': same legacy-bilinear stencil,
    # the matmul form rides the MXU (~9x faster at serving shapes where
    # this op runs B*T times; docs/PERF.md round-2 profile). Values agree
    # to 1 bf16 ulp; parameter-free, so checkpoints are interchangeable.
    upsample_mode: str = "tf1"
    # 'xla', 'pallas', or 'pallas_chain': inference-only conv engine for
    # the plain 3x3 blocks. 'pallas' routes MXU-deep layers (C>=128 both
    # sides) through the fused strip-matmul kernel (ops/pallas_conv.py);
    # 'pallas_chain' keeps the ENTIRE decode in Mosaic (ops/pallas_chain,
    # requires the serving fast paths: precomputed_first + fused_heads)
    # so the feature maps never cross an XLA<->Mosaic layout boundary.
    # Same params and checkpoints in all backends, reassociation-level
    # numeric difference. Training and init always take the XLA path.
    conv_backend: str = "xla"
    bn_axis: str | None = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool,
        precomputed_first: jax.Array | None = None,
        fused_heads: tuple[jax.Array, jax.Array] | None = None,
    ):
        """`precomputed_first`: pre-activation output of the FIRST conv
        (oct0a), computed externally — the serving fast path splits that
        conv by input channel so the frame-invariant part runs once per
        sample instead of once per frame (see Stage1Generator.generate /
        eval/final.py). Exact by linearity of convolution.

        `fused_heads`: serving fast path for the OUTPUT heads — a
        ([3,3,C,4] kernel, [4] bias) pair made by concatenating the crude
        and mask convs' parameters along the output-channel axis (built by
        eval/final.py from this module's own params). One conv then reads
        the full-resolution B*T feature map ONCE instead of twice; exact,
        because each output channel's contraction is independent. Channels
        0..2 are crude, channel 3 is the mask logit."""
        final_res = self.final_res or x.shape[1] * 4
        if (
            self.conv_backend == "pallas_chain"
            and not train
            and not self.is_initializing()
            and precomputed_first is not None
            and fused_heads is not None
        ):
            from ..ops.pallas_chain import chain_eligible, translator_chain

            if chain_eligible(precomputed_first.shape, final_res):
                v = self.variables
                return translator_chain(
                    v["params"], v["batch_stats"],
                    precomputed_first.astype(self.dtype),
                    fused_heads[0], fused_heads[1], final_res,
                    interpret=jax.default_backend() != "tpu",
                )
        f = self.filters
        ba = self.bn_axis
        octave = 0
        pending_up = False  # 'fused' mode: upsample deferred into next conv
        while True:
            if octave == 0:
                if precomputed_first is None:
                    x = Conv(f, 3, 1, dtype=self.dtype, name="oct0a_conv")(x)
                else:
                    x = precomputed_first
                x = BatchNorm(dtype=self.dtype, axis_name=ba, name="oct0a_bn")(x, train)
                x = nn.relu(x)
            else:
                x = conv_bn_relu(
                    x, f, 3, 1, train, self.dtype, f"oct{octave}a",
                    pre_up2=pending_up, mdl=self, backend=self.conv_backend,
                    bn_axis=ba,
                )
                pending_up = False
            x = conv_bn_relu(
                x, f, 3, 1, train, self.dtype, f"oct{octave}b",
                mdl=self, backend=self.conv_backend, bn_axis=ba,
            )
            if x.shape[1] == final_res:
                if fused_heads is not None:
                    k, b = fused_heads
                    y = jax.lax.conv_general_dilated(
                        x.astype(self.dtype), k.astype(self.dtype),
                        window_strides=(1, 1), padding="SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    ) + b.astype(self.dtype)
                    crude, mask_logit = y[..., :3], y[..., 3:4]
                else:
                    crude = Conv(3, 3, 1, dtype=self.dtype, name="crude")(x)
                    mask_logit = Conv(1, 3, 1, dtype=self.dtype, name="mask")(x)
                mask = jax.nn.sigmoid(mask_logit.astype(jnp.float32))
                return crude.astype(jnp.float32), mask
            x = conv_bn_relu(
                x, f, 3, 1, train, self.dtype, f"oct{octave}c",
                mdl=self, backend=self.conv_backend, bn_axis=ba,
            )
            x = conv_bn_relu(
                x, f, 3, 1, train, self.dtype, f"oct{octave}d",
                mdl=self, backend=self.conv_backend, bn_axis=ba,
            )
            if self.upsample_mode == "fused":
                # the 2x upsample folds into the NEXT octave's first conv
                # (one input-dilated 5x5 conv; exact — ops/resize.up2_conv3)
                pending_up = True
            else:
                x = upsample2x(x, mode=self.upsample_mode)
            if f >= 8:
                f //= 2
            octave += 1


class ImageDiscriminator(nn.Module):
    """PatchGAN: 6x [pad1 + conv4s2], channels 64->2048, leaky-ReLU 0.01,
    then pad1 + conv3s1 -> 1 logit map, no bias
    (reference models/networks/__init__.py:141-151; base width 64)."""

    filters: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ch = self.filters
        x = Conv(ch, 4, 2, pad=1, dtype=self.dtype, name="conv0")(x)
        x = nn.leaky_relu(x, 0.01)
        for i in range(1, 6):
            ch *= 2
            x = Conv(ch, 4, 2, pad=1, dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.leaky_relu(x, 0.01)
        logit = Conv(1, 3, 1, pad=1, use_bias=False, dtype=self.dtype, name="logit")(x)
        return logit.astype(jnp.float32)


class Stage1Generator(nn.Module):
    """Stage-1 generator graph: image encoder on frame t, pose encoder on
    both frames (one 2B batch, shared weights), Gaussian maps at 32^2,
    translator, masked blend.

    Parity: reference models/detector_translator_model.py:160-184.
    """

    n_pts: int
    heatmap_size: int = 32
    heatmap_inv_std: float = 14.3
    # network widths (config: model.encoder_filters / translator_filters /
    # pose_decoder_filters; defaults = the reference's fixed sizes)
    encoder_filters: int = 32
    translator_filters: int = 256
    pose_decoder_filters: int = 128
    dtype: Dtype = jnp.float32
    upsample_mode: str = "tf1"  # serving passes 'matmul' (see Translator)
    conv_backend: str = "xla"  # serving may pass 'pallas' (see Translator)
    # how the 2B pose-encoder pair batch is laid out (ops/batching.py):
    # 'interleave' is mesh-shard-aligned, 'concat' is single-chip-fastest;
    # identical per-row math either way (training.pair_batching)
    pair_batching: str = "interleave"
    # cross-replica (sync) BN axis: set by the shard_map DP train step
    # (parallel/dp_step.py) so per-shard forwards see GLOBAL-batch BN
    # statistics — exactly the jit-SPMD semantics. Parameter trees and
    # checkpoints are unchanged by this knob.
    bn_axis: str | None = None

    def setup(self):
        self.image_encoder = ImageEncoder(
            self.encoder_filters, dtype=self.dtype, bn_axis=self.bn_axis
        )
        # the pose encoder only distinguishes 'fused' (its skip decoder
        # folds upsamples into the next conv); 'matmul' there would change
        # nothing material, so it maps to the interleave form
        pe_mode = "fused" if self.upsample_mode == "fused" else "tf1"
        self.pose_encoder = PoseEncoder(
            self.n_pts, filters=self.pose_decoder_filters,
            trunk_filters=self.encoder_filters,
            dtype=self.dtype, upsample_mode=pe_mode, bn_axis=self.bn_axis,
        )
        self.translator = Translator(
            filters=self.translator_filters,
            dtype=self.dtype, upsample_mode=self.upsample_mode,
            conv_backend=self.conv_backend, bn_axis=self.bn_axis,
        )

    def __call__(self, im: jax.Array, future_im: jax.Array, train: bool) -> dict:
        b = im.shape[0]
        embeddings = self.image_encoder(im, train)
        # one 2B pose-encoder batch (shared weights + shared BN batch stats,
        # reference detector_translator_model.py:163-166); row layout per
        # self.pair_batching (see ops/batching).
        pair, unpair = pair_fns(self.pair_batching)
        both = pair(im, future_im)
        mu_both = self.pose_encoder(both, train)
        current_mu, future_mu = unpair(mu_both)

        hs = self.heatmap_size
        current_map = render_gaussian_maps(current_mu, hs, hs, self.heatmap_inv_std)
        future_map = render_gaussian_maps(future_mu, hs, hs, self.heatmap_inv_std)
        joint = jnp.concatenate(
            [embeddings[-2], current_map.astype(self.dtype), future_map.astype(self.dtype)],
            axis=-1,
        )
        crude, mask = self.translator(joint, train)
        final = im * mask + crude * (1.0 - mask)
        return {
            "final": final,
            "crude": crude,
            "mask": mask,
            "current_mu": current_mu,
            "future_mu": future_mu,
        }

    def detect(self, im: jax.Array, train: bool = False) -> jax.Array:
        """Pose-encode frames -> keypoints [B, K, 2] (pseudo-labeling path,
        reference models/keypoint_model.py:42-57)."""
        return self.pose_encoder(im, train)

    def embed(self, im: jax.Array, train: bool = False) -> jax.Array:
        """Appearance embedding consumed by the translator
        ([B, H/4, W/4, 128]; reference final_model.py:61-66)."""
        return self.image_encoder(im, train)[-2]

    def generate(
        self,
        im: jax.Array,
        current_mu: jax.Array,
        future_mu_seq: jax.Array,
        train: bool = False,
        precomputed_first: jax.Array | None = None,
        fused_heads: tuple[jax.Array, jax.Array] | None = None,
    ) -> dict:
        """Fused generation: translate one source frame to T future frames.

        im: [B, H, W, 3]; current_mu: [B, K, 2]; future_mu_seq: [B, T, K, 2].
        The image embedding and the current-keypoint heatmap are computed
        ONCE and broadcast across T (the reference tiles tensors B*32;
        models/final_model.py:58-92). When `precomputed_first` (the first
        translator conv's output for all B*T frames) is supplied, the
        embedding/concat path is skipped entirely — the serving fast path
        in eval/final.py builds it with the frame-invariant input channels
        convolved once per sample. `fused_heads` is forwarded to the
        Translator (single-conv crude+mask output heads; see there).
        """
        b, t = future_mu_seq.shape[0], future_mu_seq.shape[1]
        hs = self.heatmap_size
        if precomputed_first is None:
            emb = self.image_encoder(im, train)[-2]  # [B, 32, 32, 128]
            cur_map = render_gaussian_maps(current_mu, hs, hs, self.heatmap_inv_std)
            fut_map = render_gaussian_maps(
                future_mu_seq.reshape(b * t, *future_mu_seq.shape[2:]),
                hs, hs, self.heatmap_inv_std,
            )
            emb_t = jnp.repeat(emb, t, axis=0)
            cur_t = jnp.repeat(cur_map, t, axis=0)
            joint = jnp.concatenate(
                [emb_t, cur_t.astype(self.dtype), fut_map.astype(self.dtype)], axis=-1
            )
        else:
            joint = precomputed_first  # only carries the spatial shape
        crude, mask = self.translator(
            joint, train, precomputed_first=precomputed_first, fused_heads=fused_heads
        )
        im_t = jnp.repeat(im, t, axis=0)
        final = im_t * mask + crude * (1.0 - mask)
        final = jnp.clip(final, -1.0, 1.0)
        crude = jnp.clip(crude, -1.0, 1.0)
        hw = im.shape[1:3]
        return {
            "pred_im_seq": final.reshape(b, t, *hw, 3),
            "mask": mask.reshape(b, t, *hw, 1),
            "pred_im_crude": crude.reshape(b, t, *hw, 3),
        }


class MotionGenerator(nn.Module):
    """Stage-2 class-conditional VAE over keypoint sequences.

    encode: LSTM over the real sequence; last output ++ first_pt ++ action
    -> relu FC -> (mu, stddev), both >= 0 by the relu quirk (see module
    docstring; reference models/networks/__init__.py:105-113).
    decode: relu FC([z, first_pt, action]) -> 32-dim step-0 input; steps
    1..T-1 get zero input; shared tanh `to_coord` head maps every step's
    LSTM output to 2K coords (reference :116-129). Implemented as one scan
    over the [input, 0, ..., 0] sequence + a single [B*T] head matmul.
    """

    n_pts: int
    n_future: int = 32
    cell_info: Sequence[int] = (1024, 1024)
    vae_dim: int = 64
    dtype: Dtype = jnp.float32
    lstm_unroll: int = 1  # lax.scan unroll (speed knob, identical numerics)

    def setup(self):
        self.enc_lstm = StackedLSTM(
            tuple(self.cell_info), dtype=self.dtype, unroll=self.lstm_unroll
        )
        self.enc_head = Dense(2 * self.vae_dim, relu=True, dtype=self.dtype)
        self.dec_in = Dense(32, relu=True, dtype=self.dtype)
        self.dec_lstm = StackedLSTM(
            tuple(self.cell_info), dtype=self.dtype, unroll=self.lstm_unroll
        )
        self.to_coord = Dense(2 * self.n_pts, tanh_coord=True, dtype=self.dtype)

    def encode(self, real_seq: jax.Array, first_pt: jax.Array, act: jax.Array):
        """real_seq: [B, T, 2K]; first_pt: [B, 2K]; act: [B, A]."""
        outs = self.enc_lstm(real_seq)
        logit = self.enc_head(jnp.concatenate([outs[:, -1, :], first_pt, act], axis=-1))
        mu = logit[:, : self.vae_dim]
        stddev = logit[:, self.vae_dim :]
        return mu, stddev

    def decode(self, z: jax.Array, first_pt: jax.Array, act: jax.Array) -> jax.Array:
        """-> predicted sequence [B, T, 2K]."""
        b = z.shape[0]
        inp0 = self.dec_in(jnp.concatenate([z, first_pt, act], axis=-1))  # [B, 32]
        xs = jnp.concatenate(
            [inp0[:, None, :], jnp.zeros((b, self.n_future - 1, inp0.shape[-1]), inp0.dtype)],
            axis=1,
        )
        outs = self.dec_lstm(xs)  # [B, T, H]
        coords = self.to_coord(outs.reshape(b * self.n_future, -1))
        return coords.reshape(b, self.n_future, 2 * self.n_pts)

    def __call__(
        self,
        real_seq: jax.Array,
        first_pt: jax.Array,
        act: jax.Array,
        noise: jax.Array,
    ):
        """Training forward: encode, reparameterize, decode."""
        mu, stddev = self.encode(real_seq, first_pt, act)
        z = mu + stddev * noise
        pred_seq = self.decode(z, first_pt, act)
        return pred_seq, mu, stddev


class SeqDiscriminator(nn.Module):
    """LSTM(1024,1024) over a keypoint sequence; relu FC->1 per step; the
    LAST step's logit is the output (reference models/networks/__init__.py:
    132-138 — the per-step FC is computed for all steps but only the last is
    used; we apply the head to the last step only, which is equivalent and
    cheaper). NOTE the relu on the logit is a faithful reference quirk."""

    cell_info: Sequence[int] = (1024, 1024)
    dtype: Dtype = jnp.float32
    lstm_unroll: int = 1

    @nn.compact
    def __call__(self, seq: jax.Array) -> jax.Array:
        outs = StackedLSTM(
            tuple(self.cell_info), dtype=self.dtype, unroll=self.lstm_unroll
        )(seq)
        return Dense(1, relu=True, dtype=self.dtype)(outs[:, -1, :])
