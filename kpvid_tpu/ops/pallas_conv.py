"""Pallas TPU kernel: fused 3x3 SAME conv + affine (folded BN/bias) + ReLU.

Motivation (docs/PERF.md, round-2 per-op profile): the translator's plain
3x3 stride-1 convs are the serving ceiling — XLA's conv emitter runs them
at 46-99 TFLOP/s (oct2b 128^2x64: 46, oct1bcd 64^2x128: 59) against a
~3.1 ms speed-of-light per 618-GFLOP layer. The shapes underfill the MXU:
contraction depth C (64/128) and output width C' are both far below what
the systolic array wants per pass.

This kernel reshapes the SAME 3x3 conv into ONE large matmul per H-strip:

- the 3 horizontal taps are folded into the CONTRACTION dim: for each
  output column w build xcat[.., w, :] = [x[w-1] | x[w] | x[w+1]] (zero at
  the W edges), giving contraction depth 3C (192/384/768 — MXU-deep);
- the 3 vertical taps are folded into the OUTPUT dim: the weight matrix is
  Kbig [3C, 3C'] whose column block dy holds the kernel's row dy, so the
  strip product P[r, dy-block] = xrow[r] @ K[dy]; the true conv output is
  recovered with two row-shifted VPU adds
  (out[h] = sum_dy P[h+dy, block dy] over a strip padded by 1 row);
- the BN-inference affine and the conv bias fold into a per-channel
  (scale, shift) epilogue with optional ReLU, so bn+relu never touch HBM
  as separate passes (XLA cannot fuse elementwise work into a pallas op).

FLOP overhead vs the plain conv: (S+2)/S halo rows per strip (6% at S=32)
— repaid by the MXU-shaped [rows, 3C] @ [3C, 3C'] contraction.

Accumulation is f32 (preferred_element_type) like XLA's conv; results
match lax.conv_general_dilated to reassociation-level tolerance.

Parity note: this computes the same op as models/layers.py::_ConvCore's
plain path (reference models/networks/layers.py:4-10 conv + :13-14 BN) —
it is a serving-path backend, selected per-layer by eval/final.py; the
checkpoint layout and the training path are untouched.

MEASURED (v5e, 2026-08-18, tools/profile_pallas_conv.py @ 1024 frames):
x1.14 over XLA at 32^2 C256->256 (146.6 TF/s), x1.27 at 64^2 C128->128
(138.6 TF/s), x0.59 at 128^2 C64->64 (C=64 half-fills the 128-lane
registers). END-TO-END, however, the backend is net-NEGATIVE
(tools/profile_pallas_e2e.py: 10,693 -> 8,396 frames/s with both
eligible octaves): XLA assigns conv-friendly layouts
({3,0,2,1:T(8,128)}) to the GB-scale activations while a Mosaic custom
call requires default layouts, so every XLA-conv <-> Pallas boundary
materializes a layout-conversion copy that costs more than the kernel
saves. Verdict in docs/PERF.md "Pallas kernels": available via
conv_backend='pallas', default stays 'xla'.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM working-set budget used to auto-pick the strip height (bytes).
# ~16 MB physical; leave room for Mosaic's own buffers and the
# double-buffered in/out blocks.
_VMEM_BUDGET = 10 * 1024 * 1024


def _kernel(x_ref, kbig_ref, scale_ref, shift_ref, out_ref, xpad_ref, *, strip, relu):
    j = pl.program_id(1)
    h, w, c = x_ref.shape[1:]
    cout = out_ref.shape[-1]

    # Per frame (first strip): stage the zero-padded-H copy of the frame.
    @pl.when(j == 0)
    def _():
        xpad_ref[0:1] = jnp.zeros_like(xpad_ref[0:1])
        xpad_ref[pl.ds(1, h)] = x_ref[0]
        xpad_ref[h + 1 : h + 2] = jnp.zeros_like(xpad_ref[0:1])

    xs = xpad_ref[pl.ds(j * strip, strip + 2)]  # [S+2, W, C], rows r0-1..r0+S
    zc = jnp.zeros((strip + 2, 1, c), xs.dtype)
    # Contraction blocks [x(w-1) | x(w) | x(w+1)], zero at the W edges.
    xcat = jnp.concatenate(
        [jnp.concatenate([zc, xs[:, :-1]], 1), xs, jnp.concatenate([xs[:, 1:], zc], 1)],
        axis=-1,
    ).reshape((strip + 2) * w, 3 * c)
    p = jax.lax.dot_general(
        xcat,
        kbig_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [(S+2)*W, 3*Cout], column block dy = contribution of kernel row dy

    def blk(dy):
        return p[:, dy * cout : (dy + 1) * cout].reshape(strip + 2, w, cout)

    # out[h] = sum_dy P[h+dy, block dy]  (rows of xs are offset by -1)
    y = blk(0)[0:strip] + blk(1)[1 : strip + 1] + blk(2)[2 : strip + 2]
    y = y * scale_ref[0] + shift_ref[0]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[0] = y.astype(out_ref.dtype)


def _pick_strip(h: int, w: int, c: int, cout: int, dtype) -> int:
    """Largest power-of-two strip height dividing H whose working set
    (xcat + f32 strip product + staged frame pad) fits the VMEM budget."""
    esize = jnp.dtype(dtype).itemsize
    fixed = (h + 2) * w * c * esize  # xpad scratch
    s = h
    while s > 8:
        rows = (s + 2) * w
        need = rows * 3 * c * esize + rows * 3 * cout * 4 + fixed
        if need <= _VMEM_BUDGET:
            break
        s //= 2
    if h % s:  # h not a power of two — fall back to full frame
        return h
    return s


@functools.partial(jax.jit, static_argnames=("relu", "strip", "interpret"))
def conv3x3_affine(
    x: jax.Array,
    kernel: jax.Array,
    scale: jax.Array,
    shift: jax.Array,
    relu: bool = True,
    strip: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """act(conv3x3_SAME(x, kernel) * scale + shift), one fused kernel.

    x: [B, H, W, C] (compute dtype, bf16 on the serving path);
    kernel: [3, 3, C, Cout] HWIO; scale/shift: [Cout] f32 — for a folded
    conv+BN(inference) layer pass scale = gamma*rsqrt(var+eps) and
    shift = beta + (bias - mean) * scale; for a bare biased conv pass
    scale = 1, shift = bias, relu=False.
    """
    b, h, w, c = x.shape
    kh, kw, kc, cout = kernel.shape
    if (kh, kw) != (3, 3) or kc != c:
        raise ValueError(f"need a [3,3,{c},Cout] kernel, got {kernel.shape}")
    s = strip or _pick_strip(h, w, c, cout, x.dtype)
    if h % s:
        raise ValueError(f"strip {s} must divide H={h}")
    kbig = jnp.concatenate(
        [kernel[dy].reshape(3 * c, cout) for dy in range(3)], axis=1
    ).astype(x.dtype)
    kern = functools.partial(_kernel, strip=s, relu=relu)
    return pl.pallas_call(
        kern,
        grid=(b, h // s),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * c, 3 * cout), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, s, w, cout), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((h + 2, w, c), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (h + 2 * (h // s)) * w * 3 * c * 3 * cout,
            bytes_accessed=x.size * x.dtype.itemsize + b * h * w * cout * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, kbig, scale.reshape(1, cout).astype(jnp.float32), shift.reshape(1, cout).astype(jnp.float32))


def conv3x3_wins(shape: tuple, cout: int) -> bool:
    """True where the strip-matmul kernel beats XLA's conv emitter,
    per the v5e measurement (tools/profile_pallas_conv.py; docs/PERF.md
    "Pallas kernels"): x1.29 at 64^2 C128->128, x1.13 at 32^2 C256->256,
    but x0.59 at 128^2 C64->64 — C=64 leaves the 128-lane registers half
    empty, so every VPU shuffle building the [.., 3C] contraction runs at
    half throughput. Gate on both channel dims being a full lane (>=128);
    H must admit a strip decomposition (multiple of 8)."""
    h, w, c = shape[-3], shape[-2], shape[-1]
    return min(c, cout) >= 128 and h % 8 == 0 and w >= 8


def fold_bn(
    bias: jax.Array | None,
    gamma: jax.Array,
    beta: jax.Array,
    mean: jax.Array,
    var: jax.Array,
    eps: float = 1e-5,
) -> tuple[jax.Array, jax.Array]:
    """(scale, shift) of the inference-mode conv+BN affine epilogue:
    bn(conv(x) + bias) = conv(x) * scale + shift with
    scale = gamma * rsqrt(var + eps), shift = beta + (bias - mean) * scale.
    All in f32 (parity: models/layers.py::BatchNorm, eps 1e-5)."""
    scale = gamma.astype(jnp.float32) * jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    b = 0.0 if bias is None else bias.astype(jnp.float32)
    shift = beta.astype(jnp.float32) + (b - mean.astype(jnp.float32)) * scale
    return scale, shift
