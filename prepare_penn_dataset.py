#!/usr/bin/env python
"""Generate train/test split files for Penn Action.

Counterpart of the reference's prepare_penn_dataset.sh, which just copies
pre-made split lists into the data dir (reference prepare_penn_dataset.sh:
1-4; assets/penn_split/*: 1172 train / 90 test videos over 9 action
classes). This script DERIVES splits from the Penn Action release itself:

    python prepare_penn_dataset.py --penn-root /data/Penn_Action \
        --out-dir ./data/penn [--actions pullup pushup squat ...] [--all]

It reads labels/<id>.mat ('action' and 'train' fields from the official
annotations), keeps the selected action classes, assigns class indices by
sorted action name, and writes `<out>/train_set.txt` / `<out>/test_set.txt`
lines in the reference's format: `frames/<id> <action_idx>`.

The reference's EXACT 9-class subset (1172/90 videos) is vendored at
assets/penn_split/ — install it with

    python prepare_penn_dataset.py --reference-split --out-dir <data_dir>

(the same effect as the reference's prepare_penn_dataset.sh). The loaders
consume either split format identically.
"""

from __future__ import annotations

import shutil
from argparse import ArgumentParser
from pathlib import Path

REFERENCE_SPLIT_DIR = Path(__file__).resolve().parent / "assets" / "penn_split"


def read_label(mat_path: Path) -> tuple[str, bool]:
    """Return (action_name, is_train) from a Penn Action labels .mat."""
    from scipy.io import loadmat

    m = loadmat(str(mat_path))
    action = str(m["action"][0])
    is_train = bool(int(m["train"].ravel()[0]) == 1)
    return action, is_train


def main():
    parser = ArgumentParser()
    parser.add_argument("--penn-root", type=str, default=None,
                        help="Penn Action root (contains frames/ and labels/)")
    parser.add_argument("--out-dir", type=str, required=True)
    parser.add_argument("--actions", type=str, nargs="*", default=None,
                        help="action class names to keep (sorted order = index)")
    parser.add_argument("--all", action="store_true", help="keep every class")
    parser.add_argument("--reference-split", action="store_true",
                        help="install the vendored reference split "
                             "(assets/penn_split: 1172/90, 9 classes) into "
                             "--out-dir and exit")
    args = parser.parse_args()

    if args.reference_split:
        out = Path(args.out_dir)
        out.mkdir(parents=True, exist_ok=True)
        for name in ("train_set.txt", "test_set.txt"):
            shutil.copy(REFERENCE_SPLIT_DIR / name, out / name)
        print(f"installed the reference Penn split (1172/90, 9 classes) into {out}")
        return

    if args.penn_root is None:
        raise SystemExit("--penn-root is required (or use --reference-split)")
    root = Path(args.penn_root)
    labels_dir = root / "labels"
    if not labels_dir.is_dir():
        raise SystemExit(f"labels/ not found under {root}")

    records = []  # (video_id, action, is_train)
    for mat in sorted(labels_dir.glob("*.mat")):
        action, is_train = read_label(mat)
        records.append((mat.stem, action, is_train))

    all_actions = sorted({a for _, a, _ in records})
    if args.all:
        keep = all_actions
    elif args.actions:
        unknown = set(args.actions) - set(all_actions)
        if unknown:
            raise SystemExit(f"unknown actions {sorted(unknown)}; have {all_actions}")
        keep = sorted(args.actions)
    else:
        raise SystemExit(
            "pass --all or --actions <names>; available: " + ", ".join(all_actions)
        )
    index = {a: i for i, a in enumerate(keep)}

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    counts = {"train": 0, "test": 0}
    lines = {"train": [], "test": []}
    for vid, action, is_train in records:
        if action not in index:
            continue
        subset = "train" if is_train else "test"
        lines[subset].append(f"frames/{vid} {index[action]}")
        counts[subset] += 1
    for subset in ("train", "test"):
        (out / f"{subset}_set.txt").write_text("\n".join(lines[subset]) + "\n")
    print(
        f"wrote {counts['train']} train / {counts['test']} test videos over "
        f"{len(keep)} classes to {out} (class order: {keep})"
    )


if __name__ == "__main__":
    main()
