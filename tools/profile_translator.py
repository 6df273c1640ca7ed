#!/usr/bin/env python
"""Per-op profile of the serving translator + layout experiments (TPU).

VERDICT item: "per-conv profile of the translator (which octave burns the
99.6 ms)" plus layout experiments (channel-pad the 64-ch octave to 128,
NCHW trial). Times every conv / upsample / bn-relu of the translator in
isolation at the serving workload (batch 16 x 32 frames = 512 images,
bf16), reports achieved TFLOP/s and GB/s against v5e peaks, then runs the
experiments. Results table lives in docs/PERF.md.

Method per op: jit the op alone, warm it, dispatch N iters, ONE scalar
readback (axon tunnel: block_until_ready is unreliable; see CLAUDE.md).
Isolated-op times exclude XLA's cross-op fusion so the sum slightly
overstates the fused program; ratios between ops are what matter.
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from kpvid_tpu.ops.resize import upsample2x
from kpvid_tpu.utils.cache import enable_compilation_cache

V5E_PEAK_TFLOPS = 197.0  # bf16
V5E_PEAK_GBS = 819.0  # HBM


def timeit(fn, args, iters=20):
    out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])  # hard sync (compile + warm)
    out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
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


def bn_relu(x, scale, bias):
    return jax.nn.relu(x * scale + bias)


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    B = 512  # batch 16 x 32 frames
    rows = []

    def bench_conv(name, hw, cin, cout, nchw=False, iters=20):
        if nchw:
            x = jnp.asarray(rng.standard_normal((B, cin, hw, hw)), jnp.bfloat16)
            k = jnp.asarray(rng.standard_normal((cout, cin, 3, 3)) * 0.05, jnp.bfloat16)
            fn = jax.jit(conv_nchw)
        else:
            x = jnp.asarray(rng.standard_normal((B, hw, hw, cin)), jnp.bfloat16)
            k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05, jnp.bfloat16)
            fn = jax.jit(conv)
        dt = timeit(fn, (x, k), iters)
        flops = 2 * 9 * B * hw * hw * cin * cout
        byts = 2 * (B * hw * hw * (cin + cout) + 9 * cin * cout)
        rows.append((name, dt * 1e3, flops / dt / 1e12, byts / dt / 1e9))
        return dt

    def bench_misc(name, fn, x, flops=0, byts=0, iters=20):
        dt = timeit(jax.jit(fn), (x,), iters)
        rows.append((name, dt * 1e3, flops / dt / 1e12 if flops else 0.0,
                     byts / dt / 1e9 if byts else 0.0))
        return dt

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
        x = jnp.asarray(rng.standard_normal((B, hw, hw, c)), jnp.bfloat16)
        nb = 2 * (B * hw * hw * c * 5)  # read + 4x write
        bench_misc(f"upsample2x {hw}->{2*hw} {c}ch", upsample2x, x, byts=nb)
    for hw, c in ((32, 256), (64, 128), (128, 64)):
        x = jnp.asarray(rng.standard_normal((B, hw, hw, c)), jnp.bfloat16)
        s = jnp.asarray(rng.standard_normal((c,)), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((c,)), jnp.bfloat16)
        nb = 2 * (2 * B * hw * hw * c)
        dt = timeit(jax.jit(partial(bn_relu)), (x, s, b))
        rows.append((f"bn+relu {hw}^2 {c}ch", dt * 1e3, 0.0, nb / dt / 1e9))

    print(f"\n{'op':42s} {'ms':>8s} {'TFLOP/s':>9s} {'GB/s':>7s}  (v5e peaks: "
          f"{V5E_PEAK_TFLOPS:.0f} TF/s, {V5E_PEAK_GBS:.0f} GB/s)")
    for name, ms, tf, gb in rows:
        print(f"{name:42s} {ms:8.2f} {tf:9.1f} {gb:7.0f}")
    rows.clear()

    # ---- layout experiments -------------------------------------------
    print("\n--- layout experiments (same math, different layout) ---")
    bench_conv("pad oct2a: 128^2 128->128", 128, 128, 128)
    bench_conv("pad oct2b: 128^2 128->128", 128, 128, 128)
    bench_conv("NCHW oct2a 128^2 128->64", 128, 128, 64, nchw=True)
    bench_conv("NCHW oct2b 128^2 64->64", 128, 64, 64, nchw=True)
    bench_conv("NCHW oct1bcd 64^2 128->128", 64, 128, 128, nchw=True)
    bench_conv("NCHW oct0bcd 32^2 256->256", 32, 256, 256, nchw=True)

    # fused alternative for the 128^2 octave: fold upsample2x into oct2a by
    # a stride-2 transposed conv with the composed kernel (exact: upsample
    # is linear). kernel k' has taps k * bilinear weights -> 6x6 stride 2.
    x64 = jnp.asarray(rng.standard_normal((B, 64, 64, 128)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, 128, 64)) * 0.05, jnp.bfloat16)

    def up_then_conv(x, k):
        return conv(upsample2x(x), k)

    dt = timeit(jax.jit(up_then_conv), (x64, k))
    flops = 2 * 9 * B * 128 * 128 * 128 * 64
    print(f"{'up2x+conv 64->128^2 128->64 (current)':42s} {dt*1e3:8.2f} "
          f"{flops/dt/1e12:9.1f}")

    print(f"\n{'op':42s} {'ms':>8s} {'TFLOP/s':>9s} {'GB/s':>7s}")
    for name, ms, tf, gb in rows:
        print(f"{name:42s} {ms:8.2f} {tf:9.1f} {gb:7.0f}")


if __name__ == "__main__":
    main()
