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
registers). Those isolated wins are ARTIFACTS, however: an isolated XLA
conv pays an input layout conversion that vanishes in the composed
graph. The composed-prefix profile (tools/profile_pallas_chain.py)
shows XLA running the full serving decode at ~178 TF/s effective (~90%
of v5e bf16 peak) — in composed context this kernel only ties XLA at
its best shape and loses elsewhere, and the full-Mosaic chain
(ops/pallas_chain.py, zero interior boundaries) still loses 140.5 ms
vs 76.7 ms. Verdict in docs/PERF.md "Pallas kernels": available via
conv_backend='pallas' / 'pallas_chain', default stays 'xla'; the
serving decode has no kernel headroom.
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
    fits the VMEM budget: xcat + f32 strip product + staged frame pad +
    the double-buffered in (full frame) and out (strip) blocks + Kbig."""
    esize = jnp.dtype(dtype).itemsize
    fixed = (
        (h + 2) * w * c * esize      # xpad scratch
        + 2 * h * w * c * esize      # in block (full frame), double-buffered
        + 3 * c * 3 * cout * esize   # Kbig
    )
    s = h
    while s > 8:
        rows = (s + 2) * w
        need = (
            rows * 3 * c * esize      # xcat
            + rows * 3 * cout * 4     # f32 strip product
            + 2 * s * w * cout * esize  # out block, double-buffered
            + fixed
        )
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


_A0 = ((0.5, 0.0, 0.0), (0.5, 1.0, 0.5), (0.0, 0.0, 0.5))
_A1 = ((0.0, 0.0, 0.0), (1.0, 0.5, 0.0), (0.0, 0.5, 1.0))


def _up2_phase_kbig(k3: jax.Array) -> jax.Array:
    """[3C, 12F] phase-decomposed weight matrix for up2_conv3 as ONE
    strip matmul. The TF1-legacy 2x upsample (out[2i]=x[i],
    out[2i+1]=avg(x[i],x[i+1])) followed by a SAME 3x3 conv factorizes
    per output phase (a, b) in (H, W) into a 3x3 conv of x with kernel
    K_ab[e, f] = sum_{dy,dx} k3[dy, dx] * A_a[e, dy] * A_b[f, dx]
    (A_0/A_1 rows are input-offset taps e in {-1,0,1}; derivation in
    docs/PERF.md). Rows of the result match conv3x3_affine's xcat layout
    (f-major, then C); columns are blocked (e, a, b) with b innermost so
    each (e, a) block is the W-phase-packed [2F] output."""
    a_mats = (jnp.asarray(_A0, jnp.float32), jnp.asarray(_A1, jnp.float32))
    c, f = k3.shape[2], k3.shape[3]
    k32 = k3.astype(jnp.float32)
    cols = []
    for e in range(3):
        for a in range(2):
            for b in range(2):
                # K_ab[e, f-tap, c, o] = sum_{dy,dx} A_a[e,dy] A_b[f,dx] k3
                kab = jnp.einsum("y,fx,yxco->fco", a_mats[a][e], a_mats[b], k32)
                cols.append(kab.reshape(3 * c, f))
    return jnp.concatenate(cols, axis=1).astype(k3.dtype)


def pack_w_kernel(kernel: jax.Array) -> jax.Array:
    """Remap a [3, 3, C, F] conv kernel so that the SAME conv on the
    W-packed view of x equals the W-packed view of the SAME conv on x.

    W-packing is FREE on TPU row-major layouts: [H, W, C] -> [H, W/2, 2C]
    is a pure reshape (channel is the fastest-varying axis), with packed
    column w2 holding [x[2*w2] | x[2*w2+1]]. A 3x3 conv on the original
    grid becomes a 3x3 conv on the packed grid with this sparse
    [3, 3, 2C, 2F] kernel: the packed-output half b at absolute column
    2*w2+b pulls tap dx from packed column dxp, half s, where
    dx = 2*dxp + s - b — six (dxp, s, b) triples land in {-1, 0, 1}, the
    rest are structural zeros. SAME zero-padding commutes with the packing
    (W even), so edges are exact.

    Purpose: the strip-matmul kernel LOSES at C=64 (128-lane registers
    half-empty, docs/PERF.md x0.59 at 128^2 C64); packing turns that
    workload into the C=128 shape where it wins. The ~2x FLOP padding
    (structural zeros) is repaid by the 128-lane occupancy."""
    kh, kw, c, f = kernel.shape
    if (kh, kw) != (3, 3):
        raise ValueError(f"need a 3x3 kernel, got {kernel.shape}")
    k = jnp.zeros((3, 3, 2 * c, 2 * f), kernel.dtype)
    # (dxp, s, b) with dx = 2*dxp + s - b in {-1, 0, 1}; dxp index is 1+dxp
    k = k.at[:, 0, c:, :f].set(kernel[:, 0])      # dxp=-1, s=1, b=0 -> dx=-1
    k = k.at[:, 1, :c, :f].set(kernel[:, 1])      # dxp=0,  s=0, b=0 -> dx=0
    k = k.at[:, 1, c:, :f].set(kernel[:, 2])      # dxp=0,  s=1, b=0 -> dx=+1
    k = k.at[:, 1, :c, f:].set(kernel[:, 0])      # dxp=0,  s=0, b=1 -> dx=-1
    k = k.at[:, 1, c:, f:].set(kernel[:, 1])      # dxp=0,  s=1, b=1 -> dx=0
    k = k.at[:, 2, :c, f:].set(kernel[:, 2])      # dxp=+1, s=0, b=1 -> dx=+1
    return k


@functools.partial(jax.jit, static_argnames=("relu", "interpret"))
def conv3x3_affine_packed(
    x: jax.Array,
    kernel: jax.Array,
    scale: jax.Array,
    shift: jax.Array,
    relu: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """conv3x3_affine on the free W-packed view — for C<128 layers where
    the unpacked strip-matmul loses to XLA. x: [B, H, W, C] with W even;
    the packing reshape, kernel remap (pack_w_kernel), and unpacking
    reshape are exact, so this computes the same op as conv3x3_affine."""
    b, h, w, c = x.shape
    f = kernel.shape[-1]
    xp = x.reshape(b, h, w // 2, 2 * c)
    kp = pack_w_kernel(kernel)
    sp = jnp.concatenate([scale, scale])
    tp = jnp.concatenate([shift, shift])
    y = conv3x3_affine(xp, kp, sp, tp, relu=relu, interpret=interpret)
    return y.reshape(b, h, w, f)


def _up2_kernel(
    x_ref, kbig_ref, scale_ref, shift_ref, rows_ref, colsl_ref, colsr_ref,
    out_ref, xpad_ref, *, strip, relu,
):
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    h, w, c = x_ref.shape[1:]
    f = scale_ref.shape[-1] // 2  # scale/shift arrive pre-tiled to [2F]
    s = strip

    @pl.when(j == 0)
    def _():
        xpad_ref[0:1] = jnp.zeros_like(xpad_ref[0:1])
        xpad_ref[pl.ds(1, h)] = x_ref[0]
        xpad_ref[h + 1 : h + 2] = jnp.zeros_like(xpad_ref[0:1])

    xs = xpad_ref[pl.ds(j * s, s + 2)]  # [S+2, W, C], input rows r0-1..r0+S
    zc = jnp.zeros((s + 2, 1, c), xs.dtype)
    xcat = jnp.concatenate(
        [jnp.concatenate([zc, xs[:, :-1]], 1), xs, jnp.concatenate([xs[:, 1:], zc], 1)],
        axis=-1,
    ).reshape((s + 2) * w, 3 * c)
    p = jax.lax.dot_general(
        xcat,
        kbig_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [(S+2)*W, 12F], column blocks (e, a, b) with b innermost

    def blk(e, a):
        i0 = (e * 2 + a) * 2 * f
        return p[:, i0 : i0 + 2 * f].reshape(s + 2, w, 2 * f)

    def phase(a):  # out rows 2h+a for the strip's h range: [S, W, 2F]
        return blk(0, a)[0:s] + blk(1, a)[1 : s + 1] + blk(2, a)[2 : s + 2]

    # interleave the two H phases: [S, 2, W, 2F] -> [2S, W, 2F]
    y = jnp.stack([phase(0), phase(1)], axis=1).reshape(2 * s, w, 2 * f)
    y = y * scale_ref[0] + shift_ref[0]
    if relu:
        y = jnp.maximum(y, 0.0)
    y = y.astype(out_ref.dtype)

    # exact out cols, spliced in the packed layout (Mosaic rejects both
    # the pair->lane [2S,2,F]->[2S,1,2F] reshape and the lane-unpack
    # [2S,W,2F]->[2S,2W,F] when the lane dim drops below 128, so the
    # kernel ALWAYS emits packed; the wrapper unpacks in XLA if asked):
    # colsl = exact col 0 [2S, 1, F]; colsr = packed pair {2W-2, 2W-1}
    # [2S, 1, 2F], pre-packed in XLA.
    cl, cr = colsl_ref[0], colsr_ref[0]
    left = jnp.concatenate([cl, y[:, 0:1, f:]], axis=-1)
    y = jnp.concatenate([left, y[:, 1 : w - 1], cr], axis=1)
    out_ref[0] = y

    # exact border rows (authoritative at the corners)
    @pl.when(j == 0)
    def _():
        out_ref[0, 0:1] = rows_ref[0, 0:1]

    @pl.when(j == nj - 1)
    def _():
        out_ref[0, 2 * s - 2 : 2 * s] = rows_ref[0, 1:3]


def _pick_strip_up2(h: int, w: int, c: int, f: int, ow: int, oc: int, dtype) -> int:
    esize = jnp.dtype(dtype).itemsize
    fixed = (
        (h + 2) * w * c * esize      # xpad scratch
        + 2 * h * w * c * esize      # in block, double-buffered
        + 3 * c * 12 * f * esize     # Kbig
    )
    s = h
    while s > 8:
        rows = (s + 2) * w
        need = (
            rows * 3 * c * esize       # xcat
            + rows * 12 * f * 4        # f32 phase product
            + 2 * 2 * s * ow * oc * esize  # out block, double-buffered
            + fixed
        )
        if need <= _VMEM_BUDGET:
            break
        s //= 2
    if h % s:
        return h
    return s


@functools.partial(
    jax.jit, static_argnames=("relu", "pack_w_out", "strip", "interpret")
)
def up2_conv3_affine(
    x: jax.Array,
    k3: jax.Array,
    scale: jax.Array,
    shift: jax.Array,
    relu: bool = True,
    pack_w_out: bool = False,
    strip: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """act(conv3x3_SAME(upsample2x_tf1(x), k3) * scale + shift) as ONE
    Pallas kernel — the Mosaic counterpart of ops/resize.py::up2_conv3
    (reference parity chain models/networks/__init__.py:64,97 resize +
    :75-102 convs), with the BN-inference affine folded like
    conv3x3_affine.

    Formulation: the fold factorizes per output phase (a, b) into four
    3x3 convs of x (kernel transform A_a (x) A_b, see _up2_phase_kbig),
    all sharing conv3x3_affine's [.., 3C] strip contraction — one
    [rows, 3C] @ [3C, 12F] matmul per strip yields every phase; H phases
    interleave by row stacking, W phases are adjacent lanes. The phase
    formula with zero-padded x is exact except on output rows/cols
    {0, 2H-2, 2H-1} / {0, 2W-2, 2W-1} (the upsample's edge clamp and the
    conv's zero padding interact there); those six border lines are
    computed EXACTLY in XLA from 2-row/2-col slabs of x via the two-step
    up2_conv3 and spliced in-kernel (cols by lane concat each strip,
    rows on the first/last grid step, rows authoritative at corners).

    pack_w_out=True emits [B, 2H, W, 2F] with packed column w2 holding
    [out[2*w2] | out[2*w2+1]] — the free-reshape W-packed layout that
    feeds conv3x3_affine_packed C<128 chains with zero repacking cost.

    x: [B, H, W, C]; k3: [3, 3, C, F] -> [B, 2H, 2W, F] (or packed).
    """
    from .resize import up2_conv3

    b, h, w, c = x.shape
    f = k3.shape[-1]
    if k3.shape[:3] != (3, 3, c):
        raise ValueError(f"need a [3,3,{c},F] kernel, got {k3.shape}")
    ow, oc = w, 2 * f  # the kernel always emits the W-packed layout
    s = strip or _pick_strip_up2(h, w, c, f, ow, oc, x.dtype)
    if h % s:
        raise ValueError(f"strip {s} must divide H={h}")

    kc = k3.astype(x.dtype)
    kbig = _up2_phase_kbig(kc)
    scf = scale.astype(jnp.float32)
    shf = shift.astype(jnp.float32)
    sc = jnp.tile(scf, 2).reshape(1, 2 * f)  # per W-phase-packed channel
    sh = jnp.tile(shf, 2).reshape(1, 2 * f)

    def slab(v):  # exact two-step computation on a thin slab of x
        y = up2_conv3(v, kc).astype(jnp.float32) * scf + shf
        if relu:
            y = jnp.maximum(y, 0.0)
        return y.astype(x.dtype)

    top = slab(x[:, 0:2])[:, 0:1]
    bot = slab(x[:, -2:])[:, -2:]
    lef = slab(x[:, :, 0:2])[:, :, 0:1]
    rig = slab(x[:, :, -2:])[:, :, -2:]
    rows_fix = jnp.concatenate([top, bot], axis=1)  # [B, 3, 2W, F]
    rows_fix = rows_fix.reshape(b, 3, w, 2 * f)  # free row-major W-pack
    rig = rig.reshape(b, 2 * h, 1, 2 * f)  # pre-pack the col pair
    rw, rc = rig.shape[2], rig.shape[3]

    kern = functools.partial(_up2_kernel, strip=s, relu=relu)
    out = pl.pallas_call(
        kern,
        grid=(b, h // s),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * c, 12 * f), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * f), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * f), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, ow, oc), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * s, 1, f), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * s, rw, rc), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 2 * s, ow, oc), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, 2 * h, ow, oc), x.dtype),
        scratch_shapes=[pltpu.VMEM((h + 2, w, c), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (h + 2 * (h // s)) * w * 3 * c * 12 * f,
            bytes_accessed=x.size * x.dtype.itemsize
            + b * 2 * h * ow * oc * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, kbig, sc, sh, rows_fix, lef, rig)
    if pack_w_out:
        return out
    return out.reshape(b, 2 * h, 2 * w, f)  # unpack the W phases in XLA


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
