#!/usr/bin/env python
"""End-to-end serving effect of the Pallas conv backend, by layer subset.

The per-layer kernel wins (tools/profile_pallas_conv.py: x1.14 at
32^2x256, x1.27 at 64^2x128 @ 1024 frames) — but in the COMPOSED graph
XLA assigns conv-friendly layouts ({3,0,2,1:T(8,128)}) to the big
activations, while a Mosaic custom call requires default layouts, so
every XLA-conv <-> Pallas boundary inserts a layout-conversion copy
(~0.5-2.7 ms per GB-scale activation). This sweep measures the NET
effect per eligible-layer subset to pick the gate that actually pays.

Subsets are selected by monkeypatching ops/pallas_conv.conv3x3_wins
before the model traces (the module reads it at trace time).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from kpvid_tpu.utils.cache import enable_compilation_cache


def run(final, s1_vars, s2_params, im, act, iters=8, rounds=3):
    gen = jax.jit(final.generate)
    for i in range(3):
        out = gen(s1_vars, s2_params, im, act, jax.random.PRNGKey(100 + i))
        _ = float(out["pred_im_seq"][0, 0, 0, 0, 0])
    best = float("inf")
    for r in range(rounds):
        t0 = time.perf_counter()
        for i in range(iters):
            out = gen(s1_vars, s2_params, im, act, jax.random.PRNGKey(r * iters + i))
        _ = float(out["pred_im_seq"][0, 0, 0, 0, 0])
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    enable_compilation_cache()
    from kpvid_tpu.configs import Config
    from kpvid_tpu.eval import FinalGenerator
    from kpvid_tpu.ops import pallas_conv

    config = Config()
    m = config.model
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    im = jax.random.uniform(
        jax.random.PRNGKey(2), (batch, m.image_size, m.image_size, 3),
        jnp.float32, -1.0, 1.0,
    )
    act = jax.nn.one_hot(jnp.zeros((batch,), jnp.int32), m.n_action)

    base_wins = pallas_conv.conv3x3_wins
    gates = {
        "xla-only": lambda shape, cout: False,
        "oct0 (32^2x256)": lambda shape, cout: min(shape[-1], cout) >= 256,
        "oct1 (64^2x128)": lambda shape, cout: min(shape[-1], cout) == 128,
        "oct0+oct1": base_wins,
    }
    frames = batch * m.n_future_frames
    for name, gate in gates.items():
        pallas_conv.conv3x3_wins = gate
        try:
            final = FinalGenerator(config, conv_backend="pallas")
            s1_vars, s2_vars = final.init_variables(jax.random.PRNGKey(0))
            dt = run(final, s1_vars, s2_vars["params"], im, act)
        finally:
            pallas_conv.conv3x3_wins = base_wins
        print(f"{name:18s}: {dt*1e3:7.2f} ms/call = {frames/dt:8.1f} frames/s", flush=True)


if __name__ == "__main__":
    main()
