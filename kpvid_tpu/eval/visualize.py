"""Training visualization summaries.

Counterpart of the reference's TensorBoard image summaries:
- stage-1 (reference models/detector_translator_model.py:205-244):
  colorized current/future keypoint maps at full resolution, crude, final
  prediction, mask, and the two input frames.
- stage-2 (reference models/motion_generator_model.py:236-275): input im,
  first-frame keypoint map at full res, and predicted/real pose-sequence
  strips (per-frame 64^2 colorized maps concatenated along width).

Only the first `max_outputs` batch elements are computed (sliced BEFORE
the jitted render, unlike the reference which rendered the whole batch and
let the summary writer drop the rest).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import colorize_point_maps, render_gaussian_maps


@functools.partial(jax.jit, static_argnames=("size", "inv_std"))
def _points_image(mu, colors, size: int, inv_std: float = 14.3):
    maps = render_gaussian_maps(mu, size, size, inv_std)
    return colorize_point_maps(maps, colors)


@functools.partial(jax.jit, static_argnames=("strip_res", "inv_std"))
def _sequence_strip(mu_seq, colors, strip_res: int = 64, inv_std: float = 14.3):
    """[B, T, K, 2] -> [B, strip_res, T*strip_res, 3] colorized strip."""
    b, t, k, _ = mu_seq.shape
    maps = render_gaussian_maps(
        mu_seq.reshape(b * t, k, 2), strip_res, strip_res, inv_std
    )
    imgs = colorize_point_maps(maps, colors)  # [B*T, S, S, 3]
    imgs = imgs.reshape(b, t, strip_res, strip_res, 3)
    return jnp.concatenate([imgs[:, i] for i in range(t)], axis=2)


def stage1_summary_images(trainer, state, batch, colors, max_outputs: int = 2):
    small = {k: v[:max_outputs] for k, v in batch.items()}
    out = trainer.visualize(state, small)
    size = small["image"].shape[1]
    colors = jnp.asarray(colors)
    inv_std = trainer.config.model.heatmap_inv_std
    return {
        "im": np.asarray(small["image"]),
        "future_im": np.asarray(small["future_image"]),
        "current_points": np.asarray(
            _points_image(out["current_mu"], colors, size, inv_std)
        ),
        "future_points": np.asarray(
            _points_image(out["future_mu"], colors, size, inv_std)
        ),
        "future_im_crude": np.asarray(jnp.clip(out["crude"], -1, 1)),
        "future_im_pred": np.asarray(jnp.clip(out["final"], -1, 1)),
        "mask": np.asarray(out["mask"]),
    }


def stage2_summary_images(trainer, state, batch, colors, rng, max_outputs: int = 2):
    small = {k: v[:max_outputs] for k, v in batch.items()}
    first_pt, real_seq, act = trainer._flatten_batch(
        {k: jnp.asarray(v) for k, v in small.items()}
    )
    noise = jax.random.normal(rng, (first_pt.shape[0], trainer.vae_dim))
    pred_seq, _, _ = trainer.jitted_forward(
        state.g_params, real_seq, first_pt, act, noise
    )
    b, t = pred_seq.shape[0], pred_seq.shape[1]
    k = trainer.n_pts
    colors = jnp.asarray(colors)
    inv_std = trainer.config.model.heatmap_inv_std
    size = small["image"].shape[1]
    return {
        "im": np.asarray(small["image"]),
        "first_pt": np.asarray(
            _points_image(first_pt.reshape(b, k, 2), colors, size, inv_std)
        ),
        "predicted_pose_sequence": np.asarray(
            _sequence_strip(pred_seq.reshape(b, t, k, 2), colors, inv_std=inv_std)
        ),
        "real_pose_sequence": np.asarray(
            _sequence_strip(real_seq.reshape(b, t, k, 2), colors, inv_std=inv_std)
        ),
    }
