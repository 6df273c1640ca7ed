#!/usr/bin/env python
"""Export the fused serving graph as a self-contained StableHLO artifact.

    python tools/export_serving.py --config kpvid_tpu/configs/penn.yaml \
        --checkpoint_stage1 results/detector_translator \
        --checkpoint_stage2 results/motion_generator \
        --out results/serving_artifact.npz \
        [--batch-sizes 1,32] [--platforms cpu,tpu]

The artifact bakes the checkpoint weights into the graph as constants;
deployment hosts load it with `kpvid_tpu.eval.export.load_serving` (or
6 lines of raw jax.export — see docs/SWITCHING.md) and need NO model code,
config, or checkpoint tree. Outputs match the live graph to
float-reassociation tolerance (constants fold at compile time;
tests/test_export.py). The reference has no equivalent: its deployment
unit is the TF1 checkpoint plus the full model source (reference
evaluate.py:40-77 rebuilds the graph from code).

Exports ONE graph per batch-size bucket (static shapes; same discipline as
the serving daemon's compile-once buckets) for every requested platform via
jax.export multi-platform lowering — exporting for 'tpu' needs no TPU.
"""

from __future__ import annotations

import json
import sys
from argparse import ArgumentParser
from pathlib import Path
from time import monotonic

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _resolve_ckpt(path_str: str, flag: str):
    from kpvid_tpu.utils.checkpoint import latest_checkpoint

    p = Path(path_str)
    if not p.exists():
        raise FileNotFoundError(f"{flag}: checkpoint not found at {p}")
    if not p.name.startswith("ckpt-"):
        resolved = latest_checkpoint(p)
        if resolved is None:
            raise FileNotFoundError(f"{flag}: no ckpt-N directories under {p}")
        return resolved
    return p


def main():
    parser = ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--checkpoint_stage1", type=str, required=True)
    parser.add_argument("--checkpoint_stage2", type=str, required=True)
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--batch-sizes", type=str, default="1,32")
    parser.add_argument("--platforms", type=str, default="cpu,tpu")
    args = parser.parse_args()

    from kpvid_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()  # also honors KPVID_PLATFORM (CPU dry runs)
    import jax

    from kpvid_tpu.configs import load_config
    from kpvid_tpu.eval import FinalGenerator
    from kpvid_tpu.eval.export import export_serving
    from kpvid_tpu.utils.checkpoint import merge_restore, restore_checkpoint
    from kpvid_tpu.utils.logging import logger

    config = load_config(args.config)
    ck1 = _resolve_ckpt(args.checkpoint_stage1, "--checkpoint_stage1")
    ck2 = _resolve_ckpt(args.checkpoint_stage2, "--checkpoint_stage2")

    final = FinalGenerator(config)
    s1_vars, s2_vars = final.init_variables(jax.random.PRNGKey(0))

    # two-checkpoint composition, same merge as evaluate.py
    r1 = restore_checkpoint(ck1)
    s1_merged, n1 = merge_restore(
        {"params": s1_vars["params"], "batch_stats": s1_vars["batch_stats"]},
        {"params": r1.get("g_params", {}), "batch_stats": r1.get("batch_stats", {})},
    )
    r2 = restore_checkpoint(ck2)
    s2_params, n2 = merge_restore(s2_vars["params"], r2.get("g_params", {}))
    if n1 == 0 or n2 == 0:
        raise ValueError(f"checkpoint merge matched 0 tensors (stage1={n1}, stage2={n2})")
    logger.info("restored stage1=%d tensors from %s; stage2=%d from %s", n1, ck1, n2, ck2)

    batch_sizes = [int(b) for b in args.batch_sizes.split(",") if b]
    platforms = [p.strip() for p in args.platforms.split(",") if p.strip()]
    t0 = monotonic()
    meta = export_serving(
        final, s1_merged, s2_params, args.out,
        batch_sizes=batch_sizes, platforms=platforms,
    )
    print(json.dumps({
        "artifact": str(args.out),
        "bytes": Path(args.out).stat().st_size,
        "export_s": round(monotonic() - t0, 1),
        **{k: meta[k] for k in ("batch_sizes", "platforms", "outputs")},
    }))


if __name__ == "__main__":
    main()
