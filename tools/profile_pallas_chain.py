"""Per-stage profile of the full-Mosaic translator chain vs XLA.

Times cumulative PREFIXES of the serving decode (oct0 block, +oct1a fold,
+oct1 block, +oct2a fold packed, +oct2b packed, +heads) in both engines
at the real serving shape ([N, 32, 32, 256] -> [N, 128, 128, 4]), so the
deltas attribute cost per stage and boundary effects inside the composed
jit are visible (isolated per-op microbenches mislead here: an isolated
XLA conv pays an input relayout that vanishes in the composed graph).

Timing: N dispatches then ONE scalar readback (axon sync rule).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from kpvid_tpu.ops.pallas_conv import (
    conv3x3_affine,
    pack_w_kernel,
    up2_conv3_affine,
)
from kpvid_tpu.ops.resize import up2_conv3
from kpvid_tpu.utils.cache import enable_compilation_cache

N_FRAMES = 1024
REPS = 20


def mk(seed, shape, s=1.0, dt=jnp.bfloat16):
    return (jax.random.normal(jax.random.PRNGKey(seed), shape) * s).astype(dt)


def build_params():
    """Random folded (kernel, scale, shift) per layer at penn shapes."""
    p = {}
    chans = {
        "oct0b": (256, 256), "oct0c": (256, 256), "oct0d": (256, 256),
        "oct1a": (256, 128), "oct1b": (128, 128), "oct1c": (128, 128),
        "oct1d": (128, 128),
        "oct2a": (128, 64), "oct2b": (64, 64), "heads": (64, 4),
    }
    for i, (name, (c, f)) in enumerate(chans.items()):
        p[name] = (
            mk(10 + 3 * i, (3, 3, c, f), 0.05),
            jnp.ones((f,), jnp.float32),
            mk(12 + 3 * i, (f,), 0.1, jnp.float32),
        )
    return p


def xla_conv(x, k, s, t, relu=True):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ).astype(jnp.float32) * s + t
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


def xla_up2(x, k, s, t):
    y = up2_conv3(x, k).astype(jnp.float32) * s + t
    return jnp.maximum(y, 0.0).astype(x.dtype)


STAGES = [
    "oct0", "oct1a", "oct1bcd", "oct2a", "oct2b", "heads",
]


def chain_prefix(x, p, upto, engine):
    """Run stages 0..upto (inclusive) of the decode in the given engine."""
    pal = engine == "pallas"

    def conv(x, name, relu=True):
        k, s, t = p[name]
        if pal:
            return conv3x3_affine(x, k, s, t, relu=relu)
        return xla_conv(x, k, s, t, relu=relu)

    for name in ("oct0b", "oct0c", "oct0d"):
        x = conv(x, name)
    if upto >= 1:
        k, s, t = p["oct1a"]
        x = up2_conv3_affine(x, k, s, t) if pal else xla_up2(x, k, s, t)
    if upto >= 2:
        for name in ("oct1b", "oct1c", "oct1d"):
            x = conv(x, name)
    if upto >= 3:
        k, s, t = p["oct2a"]
        if pal:
            x = up2_conv3_affine(x, k, s, t, pack_w_out=True)
        else:
            x = xla_up2(x, k, s, t)
    if upto >= 4:
        k, s, t = p["oct2b"]
        if pal:
            x = conv3x3_affine(x, pack_w_kernel(k), jnp.tile(s, 2), jnp.tile(t, 2))
        else:
            x = xla_conv(x, k, s, t)
    if upto >= 5:
        k, s, t = p["heads"]
        if pal:
            y = conv3x3_affine(
                x, pack_w_kernel(k), jnp.tile(s, 2), jnp.tile(t, 2), relu=False
            )
            x = y.reshape(y.shape[0], y.shape[1], 2 * y.shape[2], 4)
        else:
            x = xla_conv(x, k, s, t, relu=False)
    return x


def timeit(fn, *args):
    out = fn(*args)
    float(jnp.sum(out[0, 0, 0]))  # hard sync
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    float(jnp.sum(out[0, 0, 0]))
    return (time.perf_counter() - t0) / REPS


def main():
    enable_compilation_cache()
    print(f"device: {jax.devices()[0]}, {N_FRAMES} frames, {REPS} reps")
    p = build_params()
    x = mk(1, (N_FRAMES, 32, 32, 256))
    prev = {"xla": 0.0, "pallas": 0.0}
    for upto, stage in enumerate(STAGES):
        line = f"prefix ..{stage:8s}"
        for engine in ("xla", "pallas"):
            fn = jax.jit(
                lambda x, upto=upto, engine=engine: chain_prefix(x, p, upto, engine)
            )
            dt = timeit(fn, x)
            line += (
                f" | {engine} {dt*1e3:7.2f} ms (+{(dt-prev[engine])*1e3:6.2f})"
            )
            prev[engine] = dt
        print(line, flush=True)


if __name__ == "__main__":
    main()
