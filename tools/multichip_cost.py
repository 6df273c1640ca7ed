"""Production-width multi-chip cost inventory — compile-only, no hardware.

AOT-lowers the REFERENCE-WIDTH (Config() defaults = penn scale: 128^2
images, K=40, LSTM 1024x2, PatchGAN to 2048ch) stage-1/stage-2 train steps
and the fused serving graph over virtual-device ('data','model') meshes at
the production sharding threshold (min_shard_dim=1024), then reads the
SPMD-partitioned optimized HLO and inventories every cross-device
collective: op counts and payload bytes per step
(kpvid_tpu/parallel/inventory.py).

This prices the multi-chip story the reference cannot have (single
tf.Session, one GPU — reference train.py:25-29): grad-psum bytes for DP,
partial-sum/gather traffic for TP, and a weak-scaling projection against
v5e ICI bandwidth. Results: docs/PERF.md "Multi-chip scaling".

Usage:
    python tools/multichip_cost.py [--devices 8] [--batch 16]
        [--min-shard 1024] [--json out.json]
        [--graphs stage1,stage2,serving,stage1_dp,stage2_dp]
        [--dp-grad-dtype bfloat16] [--topology v5e:2x4]

Graphs `stage1_dp` / `stage2_dp` price the shard_map DP step with the
explicit gradient all-reduce (kpvid_tpu/parallel/dp_step.py) in
--dp-grad-dtype; 'bfloat16' halves the gradient bytes ON THE TPU BACKEND.
NOTE the CPU backend's all-reduce-promotion pass upcasts small-dtype
all-reduces to f32 accumulation, so bf16 wire savings are only visible
with --topology, which AOT-compiles against a deviceless TPU topology
(jax.experimental.topologies; needs libtpu but NO devices) — the
authoritative v5e numbers in docs/PERF.md come from
`--topology v5e:2x4`.

Shapes are abstract (jax.eval_shape / ShapeDtypeStruct) — nothing big is
materialized and nothing executes; a run costs only XLA compiles (cached in
the persistent compile cache, so re-runs and the slow-tier test are warm).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_T0 = time.time()


def _log(msg: str) -> None:
    print(f"[multichip_cost +{time.time() - _T0:6.1f}s] {msg}", flush=True)


def _sharded_sds(tree, mesh, specs):
    """ShapeDtypeStruct tree with NamedShardings attached (AOT input spec)."""
    import jax
    from jax.sharding import NamedSharding

    return jax.tree.map(
        lambda sd, spec: jax.ShapeDtypeStruct(
            sd.shape, sd.dtype, sharding=NamedSharding(mesh, spec)
        ),
        tree,
        specs,
    )


def build_cases(config, graphs):
    """(name, make_lowerable) pairs; each make_lowerable(mesh, min_shard)
    returns (jitted_fn, args) ready for .lower(*args)."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from kpvid_tpu.eval import FinalGenerator
    from kpvid_tpu.losses import synthesize_vgg19_params
    from kpvid_tpu.parallel import batch_sharding, param_sharding_rules
    from kpvid_tpu.train.stage1 import Stage1Trainer
    from kpvid_tpu.train.stage2 import Stage2Trainer

    m = config.model
    b = config.training.batch_size

    def f32(*shape):
        return jax.ShapeDtypeStruct(shape, np.float32)

    cases = []

    if "stage1" in graphs:
        s1 = Stage1Trainer(config, synthesize_vgg19_params())
        state1 = jax.eval_shape(s1.init_state, jax.random.PRNGKey(0))

        def make_s1(mesh, min_shard, s1=s1, state1=state1):
            specs = param_sharding_rules(mesh, state1, min_shard_dim=min_shard)
            state_sds = _sharded_sds(state1, mesh, specs)
            bsh = batch_sharding(mesh)
            batch = {
                "image": jax.ShapeDtypeStruct(
                    (b, m.image_size, m.image_size, 3), np.float32, sharding=bsh
                ),
                "future_image": jax.ShapeDtypeStruct(
                    (b, m.image_size, m.image_size, 3), np.float32, sharding=bsh
                ),
            }
            return jax.jit(s1.train_step, donate_argnums=(0,)), (state_sds, batch)

        cases.append(("stage1", make_s1))

    if "stage2" in graphs:
        s2 = Stage2Trainer(config)
        state2 = jax.eval_shape(s2.init_state, jax.random.PRNGKey(0))

        def make_s2(mesh, min_shard, s2=s2, state2=state2):
            specs = param_sharding_rules(mesh, state2, min_shard_dim=min_shard)
            state_sds = _sharded_sds(state2, mesh, specs)
            bsh = batch_sharding(mesh)
            batch = {
                "image": jax.ShapeDtypeStruct(
                    (b, m.image_size, m.image_size, 3), np.float32, sharding=bsh
                ),
                "keypoints": jax.ShapeDtypeStruct((b, m.n_pts, 2), np.float32, sharding=bsh),
                "real_seq": jax.ShapeDtypeStruct(
                    (b, m.n_future_frames, m.n_pts, 2), np.float32, sharding=bsh
                ),
                "action_code": jax.ShapeDtypeStruct((b, m.n_action), np.float32, sharding=bsh),
            }
            return (
                jax.jit(s2.train_step, donate_argnums=(0,)),
                (state_sds, batch, jax.random.PRNGKey(1)),
            )

        cases.append(("stage2", make_s2))

    if "serving" in graphs:
        final = FinalGenerator(config)
        s1_vars, s2_vars = jax.eval_shape(final.init_variables, jax.random.PRNGKey(2))

        def make_serving(mesh, min_shard, final=final, s1_vars=s1_vars, s2_vars=s2_vars):
            repl = NamedSharding(mesh, P())
            rep = lambda tree: jax.tree.map(
                lambda sd: jax.ShapeDtypeStruct(sd.shape, sd.dtype, sharding=repl), tree
            )
            bsh = batch_sharding(mesh)
            im = jax.ShapeDtypeStruct(
                (b, m.image_size, m.image_size, 3), np.float32, sharding=bsh
            )
            act = jax.ShapeDtypeStruct((b, m.n_action), np.float32, sharding=bsh)
            return jax.jit(final.generate), (
                rep(s1_vars),
                rep(s2_vars["params"]),
                im,
                act,
                jax.random.PRNGKey(3),
            )

        cases.append(("serving", make_serving))

    # shard_map DP steps with the explicit grad all-reduce in
    # config.training.dp_grad_dtype (parallel/dp_step.py). Pure-DP only —
    # main() skips these on meshes with a 'model' axis.
    dp_tag = "bf16" if config.training.dp_grad_dtype == "bfloat16" else "f32"

    if "stage1_dp" in graphs:
        from kpvid_tpu.parallel import make_dp_reduce_step

        s1dp = Stage1Trainer(config, synthesize_vgg19_params())
        state1dp = jax.eval_shape(s1dp.init_state, jax.random.PRNGKey(0))

        def make_s1dp(mesh, min_shard, state1dp=state1dp):
            del min_shard  # params replicated under pure DP
            step = make_dp_reduce_step(
                config, mesh, stage=1, vgg_params=synthesize_vgg19_params()
            )
            repl = NamedSharding(mesh, P())
            state_sds = jax.tree.map(
                lambda sd: jax.ShapeDtypeStruct(sd.shape, sd.dtype, sharding=repl),
                state1dp,
            )
            bsh = batch_sharding(mesh)
            batch = {
                k: jax.ShapeDtypeStruct(
                    (b, m.image_size, m.image_size, 3), np.float32, sharding=bsh
                )
                for k in ("image", "future_image")
            }
            return step, (state_sds, batch)

        cases.append((f"stage1_dp_{dp_tag}", make_s1dp))

    if "stage2_dp" in graphs:
        from kpvid_tpu.parallel import make_dp_reduce_step

        s2dp = Stage2Trainer(config)
        state2dp = jax.eval_shape(s2dp.init_state, jax.random.PRNGKey(0))

        def make_s2dp(mesh, min_shard, state2dp=state2dp):
            del min_shard
            step = make_dp_reduce_step(config, mesh, stage=2)
            repl = NamedSharding(mesh, P())
            state_sds = jax.tree.map(
                lambda sd: jax.ShapeDtypeStruct(sd.shape, sd.dtype, sharding=repl),
                state2dp,
            )
            bsh = batch_sharding(mesh)
            batch = {
                "image": jax.ShapeDtypeStruct(
                    (b, m.image_size, m.image_size, 3), np.float32, sharding=bsh
                ),
                "keypoints": jax.ShapeDtypeStruct((b, m.n_pts, 2), np.float32, sharding=bsh),
                "real_seq": jax.ShapeDtypeStruct(
                    (b, m.n_future_frames, m.n_pts, 2), np.float32, sharding=bsh
                ),
                "action_code": jax.ShapeDtypeStruct((b, m.n_action), np.float32, sharding=bsh),
            }
            return step, (state_sds, batch, jax.random.PRNGKey(1))

        cases.append((f"stage2_dp_{dp_tag}", make_s2dp))

    return cases


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--batch", type=int, default=None, help="override batch size")
    ap.add_argument("--min-shard", type=int, default=1024)
    ap.add_argument("--graphs", default="stage1,stage2,serving")
    ap.add_argument("--meshes", default=None,
                    help="comma list like 8x1,4x2 (default: Nx1 and N/2x2)")
    ap.add_argument("--json", default=None, help="write results to this path")
    ap.add_argument("--dp-grad-dtype", default="bfloat16",
                    choices=("float32", "bfloat16"),
                    help="reduction dtype for the stage1_dp/stage2_dp graphs")
    ap.add_argument("--topology", default=None,
                    help="compile against a deviceless TPU topology (e.g. "
                         "'v5e:2x4') instead of virtual CPU devices — needs "
                         "libtpu, shows the REAL wire dtypes (bf16 "
                         "all-reduces; the CPU backend promotes them to f32)")
    args = ap.parse_args()

    topo_devices = None
    if args.topology:
        import jax
        from jax.experimental import topologies

        topo = topologies.get_topology_desc(
            platform="tpu", topology_name=args.topology
        )
        topo_devices = list(topo.devices)
        args.devices = len(topo_devices)
        _log(f"TPU topology {args.topology}: {args.devices} devices (no hardware)")
    else:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.devices}"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")

    from kpvid_tpu.utils.cache import (
        enable_compilation_cache,
        install_benign_aot_warning_filter,
    )

    enable_compilation_cache()
    install_benign_aot_warning_filter()

    from kpvid_tpu.configs import Config
    from kpvid_tpu.parallel import inventory_compiled, make_mesh

    config = Config()
    if args.batch:
        config.training.batch_size = args.batch
    config.training.dp_grad_dtype = args.dp_grad_dtype
    # Pin the pair layout to what a production MULTI-CHIP run resolves:
    # 'auto' resolves by the VISIBLE device count, and this pricing process
    # sees the host's devices (1 under --topology), not the mesh being
    # priced — 'auto' would silently price the 'concat' layout, whose
    # cross-shard resharding is exactly what interleave exists to avoid
    # (measured: +289 MB/step of collective-permute on the v5e stage-1
    # graph). ops/batching.py has the full story.
    config.training.pair_batching = "interleave"
    n = args.devices
    if args.meshes:
        meshes = [tuple(int(x) for x in s.split("x")) for s in args.meshes.split(",")]
    else:
        meshes = [(n, 1)] + ([(n // 2, 2)] if n % 2 == 0 and n > 1 else [])

    _log(
        f"config: penn production widths, batch={config.training.batch_size}, "
        f"compute={config.training.compute_dtype}, min_shard={args.min_shard}, "
        f"meshes={['x'.join(map(str, ms)) for ms in meshes]}"
    )
    cases = build_cases(config, args.graphs.split(","))

    results = []
    for name, make in cases:
        for n_data, n_model in meshes:
            if "_dp_" in name and n_model != 1:
                continue  # the shard_map DP step is pure-DP by design
            mesh = make_mesh(
                n_data=n_data, n_model=n_model, devices=topo_devices
            )
            fn, fn_args = make(mesh, args.min_shard)
            t0 = time.time()
            compiled = fn.lower(*fn_args).compile()
            dt = time.time() - t0
            inv = inventory_compiled(compiled)
            try:
                cost = compiled.cost_analysis()
                flops = float(cost.get("flops", 0.0))
            except Exception:
                flops = 0.0
            row = {
                "graph": name,
                "mesh": f"{n_data}x{n_model}",
                "counts": inv.counts,
                "payload_bytes": inv.bytes,
                "group_sizes": inv.group_sizes,
                "total_ops": inv.total_ops,
                "total_bytes": inv.total_bytes,
                "flops_per_step": flops,
                "compile_s": round(dt, 1),
            }
            results.append(row)
            _log(
                f"{name} on {n_data}x{n_model}: {inv.total_ops} collectives, "
                f"{inv.total_bytes / 1e6:.1f} MB payload "
                f"({ {k: v for k, v in sorted(inv.counts.items())} }), "
                f"group sizes {inv.group_sizes}, compile {dt:.0f}s"
            )

    print()
    print("| graph | mesh | all-reduce | all-gather | all-to-all | coll-permute | reduce-scatter | payload MB |")
    print("|---|---|---|---|---|---|---|---|")
    for r in results:
        c, by = r["counts"], r["payload_bytes"]

        def cell(op):
            k = c.get(op, 0)
            return f"{k} ({by.get(op, 0) / 1e6:.1f} MB)" if k else "0"

        print(
            f"| {r['graph']} | {r['mesh']} | {cell('all-reduce')} | {cell('all-gather')} "
            f"| {cell('all-to-all')} | {cell('collective-permute')} "
            f"| {cell('reduce-scatter')} | {r['total_bytes'] / 1e6:.1f} |"
        )

    if args.json:
        Path(args.json).write_text(json.dumps(results, indent=2))
        _log(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
