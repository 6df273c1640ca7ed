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
