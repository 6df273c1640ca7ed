#!/usr/bin/env python
"""Serving daemon: micro-batched image+action -> video generation over HTTP.

    python serve.py --config kpvid_tpu/configs/penn.yaml \
        --checkpoint_stage1 results/stage1 --checkpoint_stage2 results/stage2 \
        --port 8000

or from a one-file serving artifact (tools/export_serving.py — no config,
checkpoints, or model sources needed on the host):

    python serve.py --artifact serving.npz --port 8000

Then:

    curl -s localhost:8000/healthz
    python - <<'EOF'
    import base64, json, urllib.request
    body = {"image": base64.b64encode(open("frame.png","rb").read()).decode(),
            "action": 2, "seed": 7, "format": "gif"}
    r = urllib.request.urlopen(urllib.request.Request(
        "http://localhost:8000/v1/generate", json.dumps(body).encode(),
        {"Content-Type": "application/json"}))
    open("pred.gif","wb").write(r.read())
    EOF

No reference counterpart (the reference only ships the offline
evaluate.py sweep); see kpvid_tpu/eval/server.py for the design. The
checkpoint composition (stage-1 vars + stage-2 params merged by name
intersection) matches evaluate.py / reference evaluate.py:76-77.
"""

from __future__ import annotations

import signal
import threading
from argparse import ArgumentParser


def main():
    parser = ArgumentParser()
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--checkpoint_stage1", type=str, default=None)
    parser.add_argument("--checkpoint_stage2", type=str, default=None)
    parser.add_argument("--artifact", type=str, default=None,
                        help="serve from a serialized serving artifact "
                             "(tools/export_serving.py) instead of config + "
                             "checkpoints: ONE file, no model sources on the "
                             "host. Buckets are the artifact's exported batch "
                             "sizes; --mesh does not apply (artifact graphs "
                             "are single-device programs).")
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--buckets", type=int, nargs="+", default=None,
                        help="micro-batch bucket sizes (one compiled program "
                             "each; default 1 2 4 8 16 32 — 32 is the measured "
                             "serving knee, docs/PERF.md)")
    parser.add_argument("--max_wait_ms", type=float, default=5.0,
                        help="linger after the first queued request before "
                             "dispatching a partial batch")
    parser.add_argument("--max_queue", type=int, default=256,
                        help="pending-request bound; beyond it requests get 503")
    parser.add_argument("--no_warmup", action="store_true",
                        help="skip compiling all buckets before binding the port")
    parser.add_argument("--no_pipeline", action="store_true",
                        help="disable the depth-1 dispatch pipeline (overlap "
                             "of batch N compute with batch N-1 readback); "
                             "outputs are identical either way")
    parser.add_argument("--verbose", action="store_true",
                        help="log one line per HTTP request")
    parser.add_argument("--mesh", action="store_true",
                        help="serve batch-parallel over a pure-DP ('data') "
                             "mesh spanning all visible devices (params "
                             "replicated, micro-batches sharded over 'data'; "
                             "exact — tests/test_parallel.py::"
                             "test_serving_generate_dp). Bucket sizes round "
                             "up to multiples of the mesh size.")
    args = parser.parse_args()

    from kpvid_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from kpvid_tpu.eval.server import DEFAULT_BUCKETS, make_server
    from kpvid_tpu.utils.logging import logger

    if args.artifact:
        if args.config or args.checkpoint_stage1 or args.checkpoint_stage2:
            raise SystemExit("--artifact replaces --config/--checkpoint_stage1/"
                             "--checkpoint_stage2; pass one or the other")
        if args.mesh:
            raise SystemExit("--mesh does not apply to --artifact (artifact "
                             "graphs are single-device programs)")
        from kpvid_tpu.eval.export import load_serving
        from kpvid_tpu.eval.server import ArtifactEngine

        artifact = load_serving(args.artifact)
        engine = ArtifactEngine(artifact)
        logger.info(
            "serving artifact %s: buckets %s, platforms %s",
            args.artifact, list(engine.buckets), artifact.meta["platforms"],
        )
        buckets = tuple(args.buckets) if args.buckets else engine.buckets
        unknown = set(buckets) - set(engine.buckets)
        if unknown:
            raise SystemExit(f"buckets {sorted(unknown)} not exported in the "
                             f"artifact (has {list(engine.buckets)})")
    else:
        if not (args.config and args.checkpoint_stage1 and args.checkpoint_stage2):
            raise SystemExit("pass --config + --checkpoint_stage1 + "
                             "--checkpoint_stage2 (or --artifact)")
        from evaluate import _resolve_ckpt
        from kpvid_tpu.configs import load_config
        from kpvid_tpu.eval import FinalGenerator
        from kpvid_tpu.eval.server import InferenceEngine
        from kpvid_tpu.utils.checkpoint import merge_restore, restore_checkpoint

        config = load_config(args.config)
        ck1 = _resolve_ckpt(args.checkpoint_stage1, "--checkpoint_stage1")
        ck2 = _resolve_ckpt(args.checkpoint_stage2, "--checkpoint_stage2")

        final = FinalGenerator(config)
        s1_vars, s2_vars = final.init_variables(jax.random.PRNGKey(0))
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

        mesh = None
        if args.mesh:
            from kpvid_tpu.parallel import make_mesh

            mesh = make_mesh(n_model=1)
            logger.info("serving over %d-device 'data' mesh", mesh.shape["data"])
        engine = InferenceEngine(config, s1_merged, s2_params, mesh=mesh)
        buckets = tuple(args.buckets) if args.buckets else DEFAULT_BUCKETS
    if not args.no_warmup:
        logger.info("warming up %d buckets %s ...", len(buckets), list(buckets))
    server, batcher = make_server(
        engine, host=args.host, port=args.port, buckets=buckets,
        max_wait_ms=args.max_wait_ms, max_queue=args.max_queue,
        warmup=not args.no_warmup, quiet=not args.verbose,
        pipeline=not args.no_pipeline,
    )
    logger.info("serving on http://%s:%d (POST /v1/generate)", args.host, args.port)

    stop = threading.Event()
    for sig in (signal.SIGINT, signal.SIGTERM):
        signal.signal(sig, lambda *_: stop.set())
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    stop.wait()
    logger.info("shutting down")
    server.shutdown()
    batcher.stop()


if __name__ == "__main__":
    main()
