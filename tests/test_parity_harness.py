"""The fidelity harness's comparison math (tools/verify_reference_parity),
on fabricated render trees — the part that can be proven without the real
pretrained checkpoint."""

import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from verify_reference_parity import (  # noqa: E402
    _psnr,
    compare_against_reference,
    pred_vs_real_psnr,
)


def _write(p: Path, arr: np.ndarray):
    p.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(arr).save(p)


def _make_tree(root: Path, samples: int, frames: int, noise: float, seed: int):
    """Render tree shaped like evaluate.py output: real_seq exact,
    pred_seq = real + gaussian noise of the given scale."""
    rng = np.random.default_rng(seed)
    for s in range(samples):
        d = root / f"{s:04d}"
        for t in range(frames):
            real = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
            pred = np.clip(
                real.astype(np.float64) + rng.normal(0, noise, real.shape), 0, 255
            ).astype(np.uint8)
            _write(d / "real_seq" / f"{t:06d}.png", real)
            _write(d / "pred_seq" / f"{t:06d}.png", pred)


def test_psnr_math():
    a = np.full((8, 8), 100, np.uint8)
    assert _psnr(a, a) == pytest.approx(10 * np.log10(255**2 / 1e-12))
    b = a + 5  # mse 25
    assert _psnr(a, b) == pytest.approx(10 * np.log10(255**2 / 25))


def test_pred_vs_real_over_tree(tmp_path):
    _make_tree(tmp_path, samples=2, frames=3, noise=8.0, seed=0)
    samples = sorted(tmp_path.glob("[0-9]*"))
    mean_db, n = pred_vs_real_psnr(tmp_path, samples)
    assert n == 6
    # noise sigma 8 (clipped) -> PSNR near 10*log10(255^2/64) ~ 30 dB
    assert 28.0 < mean_db < 33.0


def test_compare_against_reference_verdict(tmp_path):
    ours = tmp_path / "ours"
    _make_tree(ours, samples=2, frames=3, noise=8.0, seed=0)
    samples = sorted(ours.glob("[0-9]*"))

    # a 'reference' whose renders have the same noise scale -> PASS
    close = tmp_path / "ref_close"
    for s in samples:  # same real frames, independent same-scale noise
        rng = np.random.default_rng(77)
        for f in sorted((s / "real_seq").glob("*.png")):
            real = np.asarray(Image.open(f))
            pred = np.clip(
                real.astype(np.float64) + rng.normal(0, 8.0, real.shape), 0, 255
            ).astype(np.uint8)
            _write(close / s.name / "pred_seq" / f.name, pred)
    passed, ours_db, theirs_db, delta = compare_against_reference(
        ours, close, samples, tolerance_db=1.0
    )
    assert passed and delta < 1.0

    # a 'reference' with 4x the noise -> ~12 dB apart -> FAIL at 0.1 dB
    far = tmp_path / "ref_far"
    for s in samples:
        rng = np.random.default_rng(78)
        for f in sorted((s / "real_seq").glob("*.png")):
            real = np.asarray(Image.open(f))
            pred = np.clip(
                real.astype(np.float64) + rng.normal(0, 32.0, real.shape), 0, 255
            ).astype(np.uint8)
            _write(far / s.name / "pred_seq" / f.name, pred)
    passed, _, _, delta = compare_against_reference(
        ours, far, samples, tolerance_db=0.1
    )
    assert not passed and delta > 5.0

    # no matching reference tree -> hard error
    with pytest.raises(SystemExit):
        compare_against_reference(ours, tmp_path / "missing", samples, 0.1)


def test_partial_reference_tree_compares_matched_subset_only(tmp_path):
    """A reference tree covering only SOME clips must not skew the verdict
    with clip-difficulty differences: both means restrict to the matched
    subset."""
    ours = tmp_path / "ours"
    # clip 0000 low-noise (easy), clip 0001 high-noise (hard)
    _make_tree(ours, samples=1, frames=3, noise=4.0, seed=0)
    d = ours / "0001"
    rng = np.random.default_rng(5)
    for t in range(3):
        real = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
        pred = np.clip(
            real.astype(np.float64) + rng.normal(0, 32.0, real.shape), 0, 255
        ).astype(np.uint8)
        _write(d / "real_seq" / f"{t:06d}.png", real)
        _write(d / "pred_seq" / f"{t:06d}.png", pred)
    samples = sorted(ours.glob("[0-9]*"))

    # reference renders ONLY the hard clip 0001, matching our noise there
    ref = tmp_path / "ref"
    rng = np.random.default_rng(6)
    for f in sorted((d / "real_seq").glob("*.png")):
        real = np.asarray(Image.open(f))
        pred = np.clip(
            real.astype(np.float64) + rng.normal(0, 32.0, real.shape), 0, 255
        ).astype(np.uint8)
        _write(ref / "0001" / "pred_seq" / f.name, pred)

    passed, ours_db, theirs_db, delta = compare_against_reference(
        ours, ref, samples, tolerance_db=1.0
    )
    # ours restricted to clip 0001 (~18 dB), NOT the full-set mean that the
    # easy clip would pull up ~6 dB — so the same-noise reference passes
    assert passed, (ours_db, theirs_db, delta)
    assert ours_db < 22.0


# --------------------------------------------------------------------------
# End-to-end drill on synthetic assets: prove the ONE-command harness runs
# start-to-finish (transcode -> evaluate -> PSNR -> verdict) so the day the
# real pretrained checkpoint appears nothing new needs writing.
# --------------------------------------------------------------------------

REPO = Path(__file__).resolve().parent.parent


def _fabricate_tf1_checkpoint(tmp: Path, cfg, stage: int) -> str:
    """Write a TF1-format checkpoint (tf.compat.v1.train.Saver, the
    reference's storage format — reference models/base_model.py:77-81) whose
    variables carry this replica's own init weights under the REFERENCE'S
    variable names (utils/tf1_import.map_names)."""
    import tensorflow as tf

    import jax

    from kpvid_tpu.utils.checkpoint import _key_name
    from kpvid_tpu.utils.tf1_import import map_names

    if stage == 1:
        from kpvid_tpu.losses import synthesize_vgg19_params
        from kpvid_tpu.train.stage1 import Stage1Trainer

        trainer = Stage1Trainer(cfg, synthesize_vgg19_params(max_width=16))
    else:
        from kpvid_tpu.train.stage2 import Stage2Trainer

        trainer = Stage2Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(stage))
    gen_target = {"params": state.g_params, "batch_stats": state.batch_stats}

    tf_vars = {}
    for target, scope in ((gen_target, f"stage{stage}"),
                          (state.d_params, f"stage{stage}_discr")):
        mapping = map_names(target, scope)
        flat, _ = jax.tree_util.tree_flatten_with_path(target)
        for path, leaf in flat:
            key = tuple(_key_name(k) for k in path)
            name = mapping[key]
            tf_vars[name] = tf.Variable(
                np.asarray(leaf), name=name.replace("/", "_")
            )
    ckpt_path = str(tmp / f"ref_stage{stage}.ckpt")
    saver = tf.compat.v1.train.Saver(var_list=tf_vars)
    saver.save(None, ckpt_path, write_meta_graph=False)
    return ckpt_path


@pytest.mark.slow
def test_harness_end_to_end_on_synthetic_assets(tmp_path):
    """Fabricate the full reference asset tree (two TF1-format checkpoints
    carrying replica weights, a vgg19.npy, a synthetic Penn tree), then run
    tools/verify_reference_parity.py as ONE command twice: first to render,
    then against its own renders — which must report PASS at exactly 0 dB
    delta (byte-identical deterministic renders)."""
    pytest.importorskip("tensorflow")
    import os
    import subprocess

    from kpvid_tpu.configs import load_config
    from kpvid_tpu.data import make_synthetic_penn_tree
    from kpvid_tpu.data.synthetic import make_synthetic_pseudo_labels
    from kpvid_tpu.losses import synthesize_vgg19_params

    data_dir = tmp_path / "penn"
    vgg_npy = tmp_path / "vgg19.npy"
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(f"""
paths:
  data_dir: '{data_dir}'
  vggnet: '{vgg_npy}'
  log_dir: '{tmp_path}/results'
training:
  batch_size: 4
  compute_dtype: 'float32'
model:
  n_pts: 8
  n_action: 9
  cell_info: [64, 64]
  vae_dim: 16
  image_size: 32
  heatmap_size: 8
  n_future_frames: 8
  encoder_filters: 8
  translator_filters: 16
  pose_decoder_filters: 16
  discriminator_filters: 8
data:
  num_workers: 2
  eval_batch_size: 2
""")
    cfg = load_config(cfg_path)

    # the fake "reference" asset tree
    make_synthetic_penn_tree(data_dir)
    make_synthetic_pseudo_labels(data_dir, n_pts=cfg.model.n_pts)
    # vgg19.npy in the reference's on-disk format (name -> [kernel, bias];
    # loaded by losses/perceptual.load_vgg19_params)
    np.save(vgg_npy, {
        name: [p["kernel"], p["bias"]]
        for name, p in synthesize_vgg19_params(max_width=16).items()
    })
    ckpt1 = _fabricate_tf1_checkpoint(tmp_path, cfg, 1)
    ckpt2 = _fabricate_tf1_checkpoint(tmp_path, cfg, 2)

    env = dict(os.environ, JAX_PLATFORMS="cpu", KPVID_PLATFORM="cpu")
    env.pop("XLA_FLAGS", None)  # single-device evaluate (no auto-mesh)

    def harness(work: Path, extra: list[str]) -> str:
        cmd = [sys.executable, str(REPO / "tools" / "verify_reference_parity.py"),
               "--config", str(cfg_path),
               "--tf-checkpoint-stage1", ckpt1,
               "--tf-checkpoint-stage2", ckpt2,
               "--work-dir", str(work),
               "--batch-size", "2", "--max-samples", "2"] + extra
        proc = subprocess.run(cmd, cwd=REPO, env=env,
                              capture_output=True, text=True, timeout=900)
        assert proc.returncode == 0, (
            f"harness failed rc={proc.returncode}\n--- stdout:\n"
            f"{proc.stdout}\n--- stderr:\n{proc.stderr[-3000:]}"
        )
        return proc.stdout

    # pass 1: transcode -> evaluate -> pred-vs-real PSNR
    out1 = harness(tmp_path / "w1", [])
    assert "pred-vs-real PSNR" in out1
    assert (tmp_path / "w1" / "renders").is_dir()

    # pass 2: same assets vs pass 1's own renders -> exact-0 dB PASS verdict
    out2 = harness(
        tmp_path / "w2",
        ["--reference-outputs", str(tmp_path / "w1" / "renders")],
    )
    assert "PASS" in out2, out2
    assert "|ours - reference| = 0.000 dB" in out2, out2
