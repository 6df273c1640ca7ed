#!/usr/bin/env python
"""Pallas conv3x3+affine+relu vs XLA at the translator's serving shapes.

Compares, per shape, the FUSED layer both ways (what serving actually
runs between activations — conv, BN-inference affine, relu):

  XLA:    jit(relu(conv3x3(x, k) * scale + shift))   (XLA fuses the epilogue)
  Pallas: ops/pallas_conv.py::conv3x3_affine         (one kernel)

Timing discipline: on-device inputs, 2 warm calls with scalar-readback
hard sync, then N dispatches + one readback (axon tunnel; CLAUDE.md).
Results recorded in docs/PERF.md "Pallas kernels".
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from kpvid_tpu.ops.pallas_conv import conv3x3_affine, conv3x3_affine_packed
from kpvid_tpu.utils.cache import enable_compilation_cache

V5E_PEAK_TFLOPS = 197.0
B = 512  # batch 16 x 32 frames


def mk(seed, shape, scale=1.0, dtype=jnp.bfloat16):
    out = jax.jit(
        lambda k: (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)
    )(jax.random.PRNGKey(seed))
    _ = float(jnp.asarray(out).ravel()[0])
    return out


def timeit(fn, args, iters=20):
    for _ in range(2):
        out = fn(*args)
        _ = float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters


@jax.jit
def xla_layer(x, k, scale, shift):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return jnp.maximum(y * scale.astype(y.dtype) + shift.astype(y.dtype), 0)


def main():
    enable_compilation_cache()
    shapes = [
        ("oct0bcd 32^2 256->256", 32, 256, 256),
        ("oct1bcd 64^2 128->128", 64, 128, 128),
        ("oct2b  128^2  64->64 ", 128, 64, 64),
    ]
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else B
    print(f"{batch} frames/call, bf16, v5e peak {V5E_PEAK_TFLOPS:.0f} TF/s\n")
    for name, hw, cin, cout in shapes:
        x = mk(1, (batch, hw, hw, cin))
        k = mk(2, (3, 3, cin, cout), 0.05)
        scale = mk(3, (cout,), 1.0, jnp.float32)
        shift = mk(4, (cout,), 0.1, jnp.float32)
        flops = 2 * 9 * batch * hw * hw * cin * cout

        dt_x = timeit(xla_layer, (x, k, scale, shift))
        dt_p = timeit(conv3x3_affine, (x, k, scale, shift))
        # correctness spot-check on the warm outputs
        a = xla_layer(x, k, scale, shift).astype(jnp.float32)
        b = conv3x3_affine(x, k, scale, shift).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
        print(
            f"{name}: XLA {dt_x*1e3:7.2f} ms ({flops/dt_x/1e12:5.1f} TF/s) | "
            f"pallas {dt_p*1e3:7.2f} ms ({flops/dt_p/1e12:5.1f} TF/s) | "
            f"x{dt_x/dt_p:4.2f} | rel-err {err:.2e}",
            flush=True,
        )
        if cin < 128:  # W-packed variant (free reshape to 2C lanes)
            dt_w = timeit(conv3x3_affine_packed, (x, k, scale, shift))
            c = conv3x3_affine_packed(x, k, scale, shift).astype(jnp.float32)
            errw = float(jnp.max(jnp.abs(a - c)) / (jnp.max(jnp.abs(a)) + 1e-9))
            print(
                f"{name}: W-packed pallas {dt_w*1e3:7.2f} ms "
                f"({flops/dt_w/1e12:5.1f} TF/s) | x{dt_x/dt_w:4.2f} vs XLA | "
                f"rel-err {errw:.2e}",
                flush=True,
            )


if __name__ == "__main__":
    main()
