#!/usr/bin/env python
"""One-command fidelity harness against the REAL pretrained reference.

The moment the real assets exist (a reference TF1 checkpoint pair, the
vgg19.npy, Penn Action, and — optionally — frames rendered by the
reference's own evaluate.py), this prints the BASELINE.json north-star
verdict (PSNR within 0.1 dB):

    python tools/verify_reference_parity.py \
        --config kpvid_tpu/configs/penn.yaml \
        --tf-checkpoint-stage1 /path/to/s1/model.ckpt-200000 \
        --tf-checkpoint-stage2 /path/to/s2/model.ckpt-100000 \
        [--reference-outputs /path/to/reference_eval_dir] \
        [--work-dir results/parity] [--batch-size 8] [--max-samples 64]

Pipeline: transcode both TF checkpoints (utils/tf1_import.py; reference
variable layout models/base_model.py:77-81) -> run this framework's
evaluate.py composition (two-checkpoint merge, reference evaluate.py:76-77)
over the Penn test split -> report:

1. PSNR(pred_seq vs real_seq) — comparable to the reference codebase's
   published reconstruction quality (its evaluate writes the same trees).
2. If --reference-outputs points at a directory of reference renders laid
   out like its evaluate.py output ({idx:04d}/pred_seq/{t:06d}.png),
   per-frame PSNR between OUR renders and THEIRS, plus the <=0.1 dB
   verdict. Note: frame-exact comparison requires the same z draws; the
   deterministic part of the graph (encode -> first_pt -> translate of the
   mean trajectory) dominates, so agreement within tenths of a dB is the
   expected pass.

Everything is existing production code — this file only sequences it.
"""

from __future__ import annotations

import sys
from argparse import ArgumentParser
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 10.0 * np.log10(peak * peak / max(mse, 1e-12))


def pred_vs_real_psnr(root: Path, samples: list[Path]) -> tuple[float, int]:
    """Mean per-frame PSNR of {sample}/pred_seq/*.png against the matching
    real_seq frames under `root` (frames paired by name)."""
    from PIL import Image

    psnrs = []
    for s in samples:
        for pred_png in sorted((s / "pred_seq").glob("*.png")):
            real_png = root / s.name / "real_seq" / pred_png.name
            if not real_png.exists():
                continue
            psnrs.append(_psnr(
                np.asarray(Image.open(pred_png)), np.asarray(Image.open(real_png))
            ))
    return float(np.mean(psnrs)), len(psnrs)


def compare_against_reference(
    eval_dir: Path, ref_root: Path, samples: list[Path], tolerance_db: float
) -> tuple[bool, float, float, float]:
    """(passed, ours_db, theirs_db, |delta|): each side's pred-vs-real PSNR
    (z-draw independent), real frames taken from OUR render tree.

    Both means are computed over the SAME matched subset of samples — a
    reference tree covering only some clips must not skew the verdict
    with clip-difficulty differences."""
    matched = [s for s in samples if (ref_root / s.name / "pred_seq").is_dir()]
    if not matched:
        raise SystemExit(
            f"--reference-outputs {ref_root} has no matching "
            "{idx:04d}/pred_seq/*.png renders"
        )
    ours, n_ours = pred_vs_real_psnr(eval_dir, matched)
    theirs, n_ref = pred_vs_real_psnr(eval_dir, [ref_root / s.name for s in matched])
    if not n_ours or not n_ref:
        raise SystemExit("no comparable frames found")
    delta = abs(ours - theirs)
    return delta <= tolerance_db, ours, theirs, delta


def main():
    parser = ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--tf-checkpoint-stage1", type=str, required=True)
    parser.add_argument("--tf-checkpoint-stage2", type=str, required=True)
    parser.add_argument("--reference-outputs", type=str, default=None,
                        help="dir of reference evaluate.py renders "
                             "({idx:04d}/pred_seq/*.png) for direct "
                             "render-vs-render PSNR")
    parser.add_argument("--work-dir", type=str, default="results/parity")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--max-samples", type=int, default=64,
                        help="cap on test samples rendered/compared")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--tolerance-db", type=float, default=0.1)
    args = parser.parse_args()

    import subprocess

    work = Path(args.work_dir)
    work.mkdir(parents=True, exist_ok=True)

    # 1. transcode both TF1 checkpoints ---------------------------------
    for stage, ckpt in ((1, args.tf_checkpoint_stage1), (2, args.tf_checkpoint_stage2)):
        cmd = [sys.executable, str(REPO / "import_tf1_checkpoint.py"),
               "--config", args.config, "--stage", str(stage),
               "--tf-checkpoint", ckpt, "--log-dir", str(work), "--step", "0"]
        print("+", " ".join(cmd), flush=True)
        subprocess.run(cmd, check=True)

    # 2. render the test split through the production evaluate.py -------
    eval_dir = work / "renders"
    cmd = [sys.executable, str(REPO / "evaluate.py"),
           "--config", args.config,
           "--checkpoint_stage1", str(work / "detector_translator"),
           "--checkpoint_stage2", str(work / "motion_generator"),
           "--save_dir", str(eval_dir),
           "--batch_size", str(args.batch_size), "--seed", str(args.seed)]
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)

    # 3. PSNR(pred vs real) over rendered samples ------------------------
    samples = sorted(eval_dir.glob("[0-9]*"))[: args.max_samples]
    if not samples:
        raise SystemExit(f"no rendered samples under {eval_dir}")
    mean_psnr, n_frames = pred_vs_real_psnr(eval_dir, samples)
    print(f"\npred-vs-real PSNR over {len(samples)} samples "
          f"({n_frames} frames): {mean_psnr:.3f} dB")

    # 4. optional: comparison against the reference's own renders --------
    if args.reference_outputs:
        passed, ours, theirs, delta = compare_against_reference(
            eval_dir, Path(args.reference_outputs), samples, args.tolerance_db
        )
        print(f"matched-subset PSNR — ours: {ours:.3f} dB, "
              f"reference: {theirs:.3f} dB")
        verdict = "PASS" if passed else "FAIL"
        print(f"\n{verdict}: |ours - reference| = {delta:.3f} dB "
              f"(tolerance {args.tolerance_db} dB)")
        raise SystemExit(0 if passed else 1)
    print("\n(no --reference-outputs given: rerun with the reference's "
          "evaluate.py renders for the 0.1 dB verdict)")


if __name__ == "__main__":
    main()
