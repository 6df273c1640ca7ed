#!/usr/bin/env python
"""Serving-daemon profile: readback format cost + HTTP end-to-end rate.

Quantifies the two claims in kpvid_tpu/eval/server.py:

1. **uint8-on-the-wire**: per-call cost of the batch-32 serving program
   when the image outputs are read back as f32 (the bare
   FinalGenerator.generate contract: pred [B,T,S,S,3] f32 + mask f32)
   vs the daemon's device-quantized uint8 epilogue. Reports ms/call and
   MB moved device->host for both.
2. **Daemon end-to-end**: spins the real ThreadingHTTPServer +
   MicroBatcher on localhost, fires concurrent /v1/generate requests
   (base64 PNG in, npz out), reports sustained requests/s, the batcher's
   p50/p95 queueing latency, and the mean coalesced batch size.

Run on the real TPU (no flags) or CPU (--cpu). Under the axon tunnel the
D2H readback rides the tunnel, so format savings are AMPLIFIED vs a real
TPU VM's PCIe — both absolute numbers and the compute-only dispatch rate
are printed so the split is explicit.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def time_calls(fn, warmup: int = 2, iters: int = 6) -> float:
    """Best-of-iters wall time of fn() (fn must hard-sync itself)."""
    for _ in range(warmup):
        fn()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="run on CPU (tiny shapes)")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--requests", type=int, default=96,
                    help="total HTTP requests in the load phase")
    ap.add_argument("--clients", type=int, default=8,
                    help="concurrent client threads")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from kpvid_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from kpvid_tpu.configs import Config, ModelConfig, TrainingConfig
    from kpvid_tpu.eval import FinalGenerator
    from kpvid_tpu.eval.server import InferenceEngine, make_server

    if args.cpu:
        config = Config(
            model=ModelConfig(
                n_pts=4, n_action=5, cell_info=(16, 16), vae_dim=8,
                image_size=32, heatmap_size=8, n_future_frames=6,
            ),
            training=TrainingConfig(batch_size=2, compute_dtype="float32"),
        ).validate()
    else:
        config = Config()  # production: 128^2, K=40, T=32
    m = config.model

    final = FinalGenerator(config)
    s1_vars, s2_vars = final.init_variables(jax.random.PRNGKey(0))
    s2_params = s2_vars["params"]
    engine = InferenceEngine(config, s1_vars, s2_params)

    B, S, T = args.batch, m.image_size, m.n_future_frames
    rng = np.random.default_rng(0)
    images = rng.uniform(-1, 1, (B, S, S, 3)).astype(np.float32)
    actions = np.zeros((B,), np.int64)
    z = rng.standard_normal((B, m.vae_dim)).astype(np.float32)

    # ---- 1. readback format: f32 contract vs the uint8 epilogue --------
    act1h = np.zeros((B, m.n_action), np.float32)
    act1h[np.arange(B), actions] = 1.0
    jitted_f32 = jax.jit(final.generate)

    def run_f32():
        out = jitted_f32(s1_vars, s2_params, images, act1h, None,
                         z=jax.numpy.asarray(z))
        return {k: np.asarray(jax.device_get(out[k]))
                for k in InferenceEngine.OUTPUT_KEYS}

    def run_u8():
        return engine.run(images, actions, z)

    def dispatch_only():
        # compute cost alone: run the uint8 program, sync on one scalar
        out = engine._jit_serve(engine.s1_vars, engine.s2_params,
                                images, act1h, z)
        return float(out["current_points"][0, 0, 0])

    t_f32 = time_calls(run_f32)
    t_u8 = time_calls(run_u8)
    t_disp = time_calls(dispatch_only)

    frame_px = B * T * S * S
    mb_f32 = (frame_px * 3 * 4 + frame_px * 1 * 4) / 1e6  # pred f32 + mask f32
    mb_u8 = (frame_px * 3 + frame_px * 1) / 1e6
    print(json.dumps({
        "phase": "readback_format", "batch": B, "image_size": S, "frames": T,
        "f32_ms_per_call": round(t_f32 * 1e3, 1),
        "uint8_ms_per_call": round(t_u8 * 1e3, 1),
        "compute_only_ms": round(t_disp * 1e3, 1),
        "f32_mb_per_call": round(mb_f32, 1),
        "uint8_mb_per_call": round(mb_u8, 1),
        "uint8_speedup": round(t_f32 / t_u8, 2),
        "frames_per_s_uint8": round(B * T / t_u8, 1),
    }))

    # ---- 2. HTTP end-to-end --------------------------------------------
    from PIL import Image
    import urllib.request

    buf = io.BytesIO()
    Image.fromarray(
        (rng.uniform(0, 255, (S, S, 3))).astype(np.uint8)
    ).save(buf, format="PNG")
    img_b64 = base64.b64encode(buf.getvalue()).decode()

    # compile every bucket ONCE up front (the engine's jit cache is shared
    # by both server instances) so no compile lands inside a timed window
    for b in (1, 2, 4, 8, 16, 32):
        engine.run(np.zeros((b, S, S, 3), np.float32),
                   np.zeros((b,), np.int64),
                   np.zeros((b, m.vae_dim), np.float32))

    for pipelined in (False, True):
        server, batcher = make_server(engine, port=0, warmup=False,
                                      quiet=True, pipeline=pipelined)
        srv_thread = threading.Thread(target=server.serve_forever, daemon=True)
        srv_thread.start()
        port = server.server_address[1]
        url = f"http://127.0.0.1:{port}/v1/generate"
        body = json.dumps({"image": img_b64, "action": 0, "seed": 1,
                           "format": "npz"}).encode()

        def one_request():
            req = urllib.request.Request(
                url, data=body, headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=600) as resp:
                resp.read()

        one_request()  # compile the buckets traffic actually lands in

        errors = []

        def client(n: int):
            for _ in range(n):
                try:
                    one_request()
                except Exception as exc:  # noqa: BLE001 — report, don't hang
                    errors.append(repr(exc))

        per = args.requests // args.clients
        threads = [threading.Thread(target=client, args=(per,))
                   for _ in range(args.clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0

        stats = batcher.stats()
        server.shutdown()
        server.server_close()  # release the listening socket between phases
        batcher.stop()
        print(json.dumps({
            "phase": "http_daemon", "pipeline": pipelined,
            "requests": per * args.clients,
            "clients": args.clients, "errors": len(errors),
            "requests_per_s": round(per * args.clients / dt, 2),
            "frames_per_s": round(per * args.clients * T / dt, 1),
            "mean_batch_rows": round(stats["mean_batch_rows"], 2),
            "pad_fraction": round(stats["pad_fraction"], 3),
            "latency_ms_p50": round(stats["latency_ms_p50"], 1),
            "latency_ms_p95": round(stats["latency_ms_p95"], 1),
        }))
        if errors:
            print(json.dumps({"errors_sample": errors[:3]}))


if __name__ == "__main__":
    main()
