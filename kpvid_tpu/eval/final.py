"""Fused end-to-end generation: one image + action class -> T-frame video.

Counterpart of reference models/final_model.py:49-122, rebuilt as ONE
jittable function:

  pose-encode the input image -> first-frame keypoints
  z ~ N(0,1) -> motion decoder (lax.scan) -> T future keypoint frames
  render 32^2 Gaussian maps; broadcast the once-computed image embedding
  and current-keypoint map across T; translate the B*T batch; blend with
  the (broadcast) input image; clip to [-1,1].

The stage-1 and stage-2 parameters come from two independent checkpoints
and are merged by the caller (utils/checkpoint.restore_merge — the
reference achieves the same with name-intersection partial restore;
base_model.py:83-92, evaluate.py:76-77).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..configs import Config
from ..models import MotionGenerator, Stage1Generator
from ..ops import colorize_point_maps, render_gaussian_maps


class FinalGenerator:
    def __init__(
        self,
        config: Config,
        upsample_mode: str = "fused",
        conv_backend: str = "xla",
    ):
        """upsample_mode defaults to the serving fast path: each 2x
        upsample folds into the next conv as one input-dilated 5x5 conv —
        exact, and ~2.5x faster than materializing the upsample at the
        serving workload where the translator runs B*T frames
        (docs/PERF.md round-2 profile). All modes share parameters and
        checkpoints; 'tf1' is the reference-faithful interleave form
        (used by the composed TF oracle in tests/test_tf_oracle.py).

        conv_backend='pallas' routes the translator's MXU-deep plain 3x3
        conv+BN+relu blocks through the fused Pallas strip-matmul kernel
        (ops/pallas_conv.py); 'pallas_chain' keeps the ENTIRE decode in
        Mosaic (ops/pallas_chain.py — up2-fold kernels, W-packed final
        octave, packed fused heads). Same params/checkpoints in all
        backends; the difference vs 'xla' is float reassociation only.
        Both MEASURE NET-NEGATIVE end-to-end: the composed XLA decode
        already runs at ~90% of v5e bf16 peak, so there is no kernel
        headroom (docs/PERF.md "Pallas kernels") — 'xla' is default."""
        self.config = config
        m = config.model
        self.dtype = (
            jnp.bfloat16 if config.training.compute_dtype == "bfloat16" else jnp.float32
        )
        self.n_pts = m.n_pts
        self.vae_dim = m.vae_dim
        self.n_future = m.n_future_frames
        self.image_size = m.image_size
        self.stage1 = Stage1Generator(
            n_pts=m.n_pts,
            heatmap_size=m.heatmap_size,
            heatmap_inv_std=m.heatmap_inv_std,
            encoder_filters=m.encoder_filters,
            translator_filters=m.translator_filters,
            pose_decoder_filters=m.pose_decoder_filters,
            dtype=self.dtype,
            upsample_mode=upsample_mode,
            conv_backend=conv_backend,
        )
        self.stage2 = MotionGenerator(
            n_pts=m.n_pts,
            n_future=m.n_future_frames,
            cell_info=tuple(m.cell_info),
            vae_dim=m.vae_dim,
            dtype=self.dtype,
            lstm_unroll=m.lstm_unroll,
        )

    def init_variables(self, rng: jax.Array) -> tuple[dict, dict]:
        """Jit-initialized (stage1_vars, stage2_vars) at config shapes.
        (Jitted init compiles one program instead of eagerly compiling
        hundreds of micro-ops — much faster cold start.)"""
        m = self.config.model
        r1, r2 = jax.random.split(rng)
        dummy = jnp.zeros((1, m.image_size, m.image_size, 3), jnp.float32)
        s1_vars = jax.jit(lambda r: self.stage1.init(r, dummy, dummy, train=False))(r1)
        s2_vars = jax.jit(
            lambda r: self.stage2.init(
                r,
                jnp.zeros((1, m.n_future_frames, 2 * m.n_pts)),
                jnp.zeros((1, 2 * m.n_pts)),
                jnp.zeros((1, m.n_action)),
                jnp.zeros((1, m.vae_dim)),
            )
        )(r2)
        return s1_vars, s2_vars

    def generate(
        self,
        stage1_vars: dict,
        stage2_params: dict,
        im: jax.Array,
        action_code: jax.Array,
        rng: jax.Array | None,
        split_first_conv: bool = True,
        fuse_heads: bool = True,
        z: jax.Array | None = None,
    ) -> dict:
        """im: [B, H, W, 3] in [-1, 1]; action_code: [B, A] one-hot.

        z: optional explicit motion latents [B, vae_dim]; when given, rng is
        unused (may be None) and each sample's output depends only on its
        own (im, action, z) row — the property micro-batched serving needs
        so a request's video never depends on which batch it rode in
        (eval/server.py draws one z per REQUEST). When omitted, z is drawn
        ~ N(0,1) from rng for the whole batch, like the reference
        (final_model.py:71).

        Returns pred_im_seq [B,T,H,W,3], mask, pred_im_crude, current_points
        / future_points visualizations inputs (raw keypoints), matching the
        reference output dict (final_model.py:112-121).

        split_first_conv: serving fast path — the first translator conv's
        input channels are [embedding(128) ++ current_map(K) ++
        future_map(K)]; the first 128+K channels are IDENTICAL for all T
        frames of a sample, so their contraction runs once per sample and
        broadcasts (exact by linearity; saves ~(128+K)/(128+2K) of that
        conv plus the B*T embedding materialization).

        fuse_heads: serving fast path — the translator's crude (3ch) and
        mask (1ch) output convs become ONE 4-channel conv by concatenating
        their kernels/biases along the output axis (exact: each output
        channel's contraction is independent), so the full-resolution B*T
        feature map is read from HBM once instead of twice.
        """
        b = im.shape[0]
        # 1) current keypoints from the frozen pose encoder
        current_mu = self.stage1.apply(stage1_vars, im, method=self.stage1.detect)
        first_pt = current_mu.reshape(b, 2 * self.n_pts)

        # 2) sample motion: z ~ N(0,1), scan-decode T keypoint frames
        if z is None:
            z = jax.random.normal(rng, (b, self.vae_dim), jnp.float32)
        else:
            z = z.astype(jnp.float32)
        pred_flat = self.stage2.apply(
            {"params": stage2_params}, z, first_pt, action_code,
            method=self.stage2.decode,
        )  # [B, T, 2K]
        future_mu_seq = pred_flat.reshape(b, self.n_future, self.n_pts, 2)

        # 3) translate: embedding computed once, broadcast across T
        precomputed_first = (
            self._split_first_conv(stage1_vars, im, current_mu, future_mu_seq)
            if split_first_conv
            else None
        )
        fused_heads = None
        if fuse_heads:
            tp = stage1_vars["params"]["translator"]
            fused_heads = (
                jnp.concatenate(
                    [tp["crude"]["Conv_0"]["kernel"], tp["mask"]["Conv_0"]["kernel"]],
                    axis=-1,
                ),
                jnp.concatenate(
                    [tp["crude"]["Conv_0"]["bias"], tp["mask"]["Conv_0"]["bias"]], axis=0
                ),
            )
        out = self.stage1.apply(
            stage1_vars, im, current_mu, future_mu_seq,
            method=self.stage1.generate, precomputed_first=precomputed_first,
            fused_heads=fused_heads,
        )
        return {
            "im": im,
            "pred_im_seq": out["pred_im_seq"],
            "mask": out["mask"],
            "pred_im_crude": out["pred_im_crude"],
            "current_points": current_mu,
            "future_points": future_mu_seq,
            "fut_pt_raw": future_mu_seq,
        }

    def _split_first_conv(
        self, stage1_vars: dict, im: jax.Array, current_mu: jax.Array,
        future_mu_seq: jax.Array,
    ) -> jax.Array:
        """Pre-activation output of the translator's first conv for all
        B*T frames, with the frame-invariant channels convolved once per
        sample (see generate()). Matches flax nn.Conv numerics: SAME
        padding, compute dtype self.dtype, bias added once."""
        b, t = future_mu_seq.shape[0], future_mu_seq.shape[1]
        hs = self.config.model.heatmap_size
        inv_std = self.config.model.heatmap_inv_std
        dt = self.dtype

        emb = self.stage1.apply(stage1_vars, im, method=self.stage1.embed)
        cur_map = render_gaussian_maps(current_mu, hs, hs, inv_std)
        fut_map = render_gaussian_maps(
            future_mu_seq.reshape(b * t, self.n_pts, 2), hs, hs, inv_std
        )
        static = jnp.concatenate([emb.astype(dt), cur_map.astype(dt)], axis=-1)

        conv_p = stage1_vars["params"]["translator"]["oct0a_conv"]["Conv_0"]
        kernel = conv_p["kernel"].astype(dt)  # [3, 3, 128+2K, F]
        bias = conv_p["bias"].astype(dt)
        n_static = static.shape[-1]

        def conv(x, k):
            return jax.lax.conv_general_dilated(
                x, k, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        y_static = conv(static, kernel[:, :, :n_static, :]) + bias  # [B, h, w, F]
        y_dyn = conv(fut_map.astype(dt), kernel[:, :, n_static:, :])  # [B*T, ...]
        y = y_dyn.reshape(b, t, *y_dyn.shape[1:]) + y_static[:, None]
        return y.reshape(b * t, *y_dyn.shape[1:])

    @functools.cached_property
    def jitted_generate(self):
        return jax.jit(self.generate, static_argnames=("split_first_conv", "fuse_heads"))

    def render_point_images(self, mu, colors, size: int | None = None) -> jax.Array:
        """Colorized keypoint visualization at full resolution (reference
        final_model.py:101-110)."""
        size = size or self.image_size
        maps = render_gaussian_maps(mu, size, size, self.config.model.heatmap_inv_std)
        return colorize_point_maps(maps, colors)
