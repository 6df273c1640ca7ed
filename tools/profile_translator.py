#!/usr/bin/env python
"""Per-op profile of the serving translator + layout experiments (TPU).

VERDICT item: "per-conv profile of the translator (which octave burns the
99.6 ms)" plus layout experiments (channel-pad the 64-ch octave to 128,
NCHW trial). Times every conv / upsample / bn-relu of the translator in
isolation at the serving workload (batch 16 x 32 frames = 512 images,
bf16), reports achieved TFLOP/s and GB/s against v5e peaks, then runs the
experiments. Results table lives in docs/PERF.md.

Method per op: inputs are generated ON DEVICE inside a jitted builder
(the axon tunnel moves ~5 MB/s host<->device; a single 2 GB activation
would take minutes to upload). Timing: warm twice with a scalar-readback
hard sync (block_until_ready is unreliable under axon; CLAUDE.md), then
N dispatches + ONE readback.

Isolated-op times exclude XLA's cross-op fusion so the sum slightly
overstates the fused program; ratios between ops are what matter.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from kpvid_tpu.ops.resize import upsample2x
from kpvid_tpu.utils.cache import enable_compilation_cache

V5E_PEAK_TFLOPS = 197.0  # bf16
V5E_PEAK_GBS = 819.0  # HBM
B = 512  # batch 16 x 32 frames


from functools import partial


@partial(jax.jit, static_argnums=1)
def _mk(key, shape):
    return jax.random.normal(key, shape, jnp.float32).astype(jnp.bfloat16)


def mk(seed, shape, scale=1.0):
    out = _mk(jax.random.PRNGKey(seed), shape)
    if scale != 1.0:
        out = jax.jit(lambda x: x * scale)(out)
    _ = float(jnp.asarray(out).ravel()[0])
    return out


def timeit(fn, args, iters=20):
    fn = jax.jit(fn)
    for _ in range(2):
        out = fn(*args)
        _ = float(jnp.asarray(out).ravel()[0])  # hard sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters


def conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def conv_nchw(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW")
    )


def main():
    enable_compilation_cache()
    rows = []

    def bench_conv(name, hw, cin, cout, nchw=False, iters=20):
        if nchw:
            x = mk(1, (B, cin, hw, hw))
            k = mk(2, (cout, cin, 3, 3), 0.05)
            fn = conv_nchw
        else:
            x = mk(1, (B, hw, hw, cin))
            k = mk(2, (3, 3, cin, cout), 0.05)
            fn = conv
        dt = timeit(fn, (x, k), iters)
        flops = 2 * 9 * B * hw * hw * cin * cout
        byts = 2 * (B * hw * hw * (cin + cout) + 9 * cin * cout)
        rows.append((name, dt * 1e3, flops / dt / 1e12, byts / dt / 1e9))
        print(f"{name:44s} {dt*1e3:8.2f} ms {flops/dt/1e12:7.1f} TF/s "
              f"{byts/dt/1e9:6.0f} GB/s", flush=True)
        return dt

    def bench_misc(name, fn, x, byts, iters=20):
        dt = timeit(fn, (x,), iters)
        rows.append((name, dt * 1e3, 0.0, byts / dt / 1e9))
        print(f"{name:44s} {dt*1e3:8.2f} ms {'':11s} {byts/dt/1e9:6.0f} GB/s",
              flush=True)
        return dt

    print(f"serving workload: {B} frames/call, bf16, v5e peaks "
          f"{V5E_PEAK_TFLOPS:.0f} TF/s | {V5E_PEAK_GBS:.0f} GB/s\n", flush=True)

    # ---- the translator's convs at serving shapes (128^2 model, K=40)
    bench_conv("oct0a 32^2 208->256", 32, 208, 256)
    bench_conv("oct0a-dyn 32^2 80->256 (split path)", 32, 80, 256)
    bench_conv("oct0bcd 32^2 256->256 (x3)", 32, 256, 256)
    bench_conv("oct1a 64^2 256->128", 64, 256, 128)
    bench_conv("oct1bcd 64^2 128->128 (x3)", 64, 128, 128)
    bench_conv("oct2a 128^2 128->64", 128, 128, 64)
    bench_conv("oct2b 128^2 64->64", 128, 64, 64)
    bench_conv("heads 128^2 64->4 (crude+mask)", 128, 64, 4)

    # ---- non-conv ops
    for hw, c in ((32, 256), (64, 128)):
        x = mk(3, (B, hw, hw, c))
        nb = 2 * (B * hw * hw * c * 5)  # read + 4x write
        bench_misc(f"upsample2x {hw}->{2*hw} {c}ch", upsample2x, x, nb)
    for hw, c in ((32, 256), (64, 128), (128, 64)):
        x = mk(4, (B, hw, hw, c))
        nb = 2 * (2 * B * hw * hw * c)
        bench_misc(f"bn+relu {hw}^2 {c}ch",
                   lambda t: jax.nn.relu(t * 1.1 + 0.1), x, nb)

    # ---- layout experiments -------------------------------------------
    print("\n--- layout experiments (same math, different layout) ---", flush=True)
    bench_conv("pad oct2a: 128^2 128->128", 128, 128, 128)
    bench_conv("NCHW oct2a 128^2 128->64", 128, 128, 64, nchw=True)
    bench_conv("NCHW oct2b 128^2 64->64", 128, 64, 64, nchw=True)
    bench_conv("NCHW oct1bcd 64^2 128->128", 64, 128, 128, nchw=True)
    bench_conv("NCHW oct0bcd 32^2 256->256", 32, 256, 256, nchw=True)

    # fuse test: up2x immediately followed by conv (can XLA fuse away the
    # materialized 2x activation?)
    x64 = mk(5, (B, 64, 64, 128))
    k = mk(6, (3, 3, 128, 64), 0.05)
    dt = timeit(lambda x, kk: conv(upsample2x(x), kk), (x64, k))
    flops = 2 * 9 * B * 128 * 128 * 128 * 64
    print(f"{'up2x+conv 64->128^2 128->64 (interleave)':44s} {dt*1e3:8.2f} ms "
          f"{flops/dt/1e12:7.1f} TF/s", flush=True)

    def up_matmul_conv(x, kk):
        return conv(upsample2x(x, mode="matmul"), kk)

    dt = timeit(up_matmul_conv, (x64, k))
    print(f"{'upmm+conv 64->128^2 128->64 (current)':44s} {dt*1e3:8.2f} ms "
          f"{flops/dt/1e12:7.1f} TF/s", flush=True)

    # candidate: fold the 2x upsample INTO the conv as one 5x5 stride-2
    # transposed conv (composed kernel = bilinear stencil (*) 3x3 weights;
    # exact up to edge handling). Effective taps 25/4 ~= 6.25 vs 9 IF XLA
    # phase-decomposes the input-dilated conv; full 25 if it doesn't.
    k5 = mk(7, (5, 5, 128, 64), 0.05)

    def convT(x, kk):
        return jax.lax.conv_transpose(
            x, kk, strides=(2, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    dt = timeit(convT, (x64, k5))
    print(f"{'convT5x5s2 64->128^2 128->64 (candidate)':44s} {dt*1e3:8.2f} ms "
          f"{flops/dt/1e12:7.1f} TF/s (same useful math)", flush=True)


if __name__ == "__main__":
    main()
