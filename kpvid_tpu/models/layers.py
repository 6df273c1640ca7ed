"""Primitive NN layers.

Counterpart of reference models/networks/layers.py (conv, batch_norm,
lstm_model, to_coord), rebuilt as Flax modules with TPU-first choices:

- convs default to a compute dtype (bf16 on TPU) with f32 params; XLA keeps
  MXU accumulation in f32 via preferred_element_type,
- the stacked LSTM is ONE `lax.scan` over time with the per-layer gate
  matmuls fused as [x, h] @ W (kernel layout [input+hidden, 4*units] with
  TF's i, j, f, o gate order and forget_bias=1.0, so TF1 checkpoints can be
  transcoded weight-for-weight; reference models/networks/layers.py:17-21),
- cell state is kept in f32 regardless of compute dtype for recurrence
  stability.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

xavier_uniform = nn.initializers.xavier_uniform()


class _ConvCore(nn.Module):
    """Parameter-owning conv core. Named "Conv_0" by its parent so the
    param tree ({Conv_0: {kernel, bias}}) and the per-path param RNG stay
    IDENTICAL to the nn.Conv wrapper this replaced — checkpoints, the TF1
    transcoder, and init values are all unchanged. Owning the params lets
    the serving path reuse them in the fused upsample+conv kernel
    (ops/resize.py::up2_conv3) without a second parameter set."""

    features: int
    kernel: int
    stride: int
    use_bias: bool
    dtype: Dtype

    @nn.compact
    def __call__(
        self, x: jax.Array, pre_up2: bool = False, skip: jax.Array | None = None
    ) -> jax.Array:
        c_in = x.shape[-1] + (0 if skip is None else skip.shape[-1])
        k = self.param(
            "kernel", xavier_uniform,
            (self.kernel, self.kernel, c_in, self.features), jnp.float32,
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        x = x.astype(self.dtype)
        k = k.astype(self.dtype)
        b = None if b is None else b.astype(self.dtype)

        def plain(inp, kk):
            return jax.lax.conv_general_dilated(
                inp, kk,
                window_strides=(self.stride, self.stride),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        if pre_up2:
            # fused conv3x3_SAME(upsample2x(x) [++ skip]): exact, ~2.5x
            # faster than materializing the upsample (serving path;
            # docs/PERF.md). With `skip`, the kernel splits by input
            # channel (conv of a concat = sum of per-part convs).
            if self.kernel != 3 or self.stride != 1:
                raise ValueError(
                    f"pre_up2 requires kernel=3 stride=1, got "
                    f"kernel={self.kernel} stride={self.stride}"
                )
            from ..ops.resize import up2_conv3

            y = up2_conv3(x, k[:, :, : x.shape[-1], :])
            if skip is not None:
                y = y + plain(skip.astype(self.dtype), k[:, :, x.shape[-1]:, :])
            return y if b is None else y + b
        if skip is not None:
            x = jnp.concatenate([x, skip.astype(self.dtype)], axis=-1)
        y = plain(x, k)
        return y if b is None else y + b


class Conv(nn.Module):
    """2D conv, Xavier init, SAME padding, optional explicit pre-pad.

    Parity: reference models/networks/layers.py:4-10 (pre-pad + SAME conv is
    the reference's PatchGAN padding idiom).

    `pre_up2=True` computes conv(upsample2x(input)) in one fused op
    (kernel 3, stride 1 only; see _ConvCore / ops/resize.py::up2_conv3).
    """

    features: int
    kernel: int = 4
    stride: int = 2
    pad: int = 0
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, pre_up2: bool = False, skip: jax.Array | None = None
    ) -> jax.Array:
        if self.pad:
            if pre_up2:
                # pre-pad would land BEFORE the upsample (conv(up2(pad(x))),
                # not conv(pad(up2(x)))) — no caller needs that combination,
                # so reject rather than silently compute the wrong thing
                raise ValueError("pre_up2=True is incompatible with pad != 0")
            x = jnp.pad(x, ((0, 0), (self.pad, self.pad), (self.pad, self.pad), (0, 0)))
        return _ConvCore(
            features=self.features,
            kernel=self.kernel,
            stride=self.stride,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="Conv_0",
        )(x, pre_up2=pre_up2, skip=skip)


class BatchNorm(nn.Module):
    """BN eps=1e-5, center+scale, moving stats (reference layers.py:13-14;
    tf.contrib defaults: decay 0.999).

    `axis_name`: cross-replica (sync) BN for shard_map-based data
    parallelism (parallel/dp_step.py) — batch statistics pmean over the
    named mesh axis, so a per-shard forward sees the GLOBAL-batch stats,
    matching the jit-SPMD semantics exactly. None (default) outside
    shard_map."""

    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.999,
            epsilon=1e-5,
            use_bias=True,
            use_scale=True,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            axis_name=self.axis_name,
        )(x)


def conv_bn_relu(
    x: jax.Array,
    features: int,
    kernel: int,
    stride: int,
    train: bool,
    dtype: Dtype,
    name: str,
    pre_up2: bool = False,
    skip: jax.Array | None = None,
    mdl: nn.Module | None = None,
    backend: str = "xla",
    bn_axis: str | None = None,
) -> jax.Array:
    """conv + BN + relu. `backend='pallas'` (serving only; requires `mdl`,
    the calling module, for parameter access) routes eligible layers —
    inference mode, plain 3x3 stride-1, MXU-deep channels — through the
    fused strip-matmul kernel (ops/pallas_conv.py): the conv, the folded
    BN-inference affine, and the relu run as ONE Pallas op instead of
    XLA's conv + fused epilogue. Parameters, init, and checkpoints are
    identical in both backends — the Conv/BatchNorm modules below own the
    params either way; the Pallas path merely reads them via
    `mdl.variables` and computes differently."""
    conv = Conv(features, kernel, stride, dtype=dtype, name=f"{name}_conv")
    bn = BatchNorm(dtype=dtype, axis_name=bn_axis, name=f"{name}_bn")
    if (
        backend == "pallas"
        and mdl is not None
        and not train
        and not pre_up2
        and skip is None
        and kernel == 3
        and stride == 1
        and not mdl.is_initializing()
    ):
        from ..ops.pallas_conv import conv3x3_affine, conv3x3_wins, fold_bn

        if conv3x3_wins(x.shape, features):
            v = mdl.variables
            cp = v["params"][f"{name}_conv"]["Conv_0"]
            bnp = v["params"][f"{name}_bn"]["BatchNorm_0"]
            bns = v["batch_stats"][f"{name}_bn"]["BatchNorm_0"]
            scale, shift = fold_bn(
                cp["bias"], bnp["scale"], bnp["bias"], bns["mean"], bns["var"]
            )
            return conv3x3_affine(
                x.astype(dtype),
                cp["kernel"].astype(dtype),
                scale,
                shift,
                relu=True,
                interpret=jax.default_backend() != "tpu",
            )
    x = conv(x, pre_up2=pre_up2, skip=skip)
    x = bn(x, train)
    return nn.relu(x)


class StackedLSTM(nn.Module):
    """Multi-layer LSTM over a full sequence via a single `lax.scan`.

    The reference builds tf.nn.rnn_cell.LSTMCell stacks and either
    `dynamic_rnn`s or Python-unrolls them 32 times (reference
    models/networks/__init__.py:105-138). Here one scan carries all layers'
    (c, h); per step each layer does one fused [B, D+H] @ [D+H, 4H] matmul
    on the MXU.

    Gate order i, j, f, o with forget_bias=1.0 matches TF LSTMCell for
    checkpoint transcoding.
    """

    features: Sequence[int]
    dtype: Dtype = jnp.float32
    # lax.scan unroll factor: >1 trades compile time/code size for fewer
    # loop iterations and cross-step fusion (SURVEY §5.7 "lax.scan with
    # unroll tuning"); numerics identical. Sweep: tools/profile_train_step.
    unroll: int = 1

    @nn.compact
    def __call__(self, xs: jax.Array, return_final_state: bool = False):
        """xs: [B, T, D] -> outputs [B, T, features[-1]]."""
        batch = xs.shape[0]
        in_dims = [xs.shape[-1]] + [int(f) for f in self.features[:-1]]
        kernels = []
        biases = []
        for li, (d, h) in enumerate(zip(in_dims, self.features)):
            kernels.append(
                self.param(f"lstm_{li}_kernel", xavier_uniform, (d + h, 4 * h), jnp.float32)
            )
            biases.append(
                self.param(f"lstm_{li}_bias", nn.initializers.zeros, (4 * h,), jnp.float32)
            )

        # full f32 matmul precision when not in bf16 compute (XLA's default
        # 'default' precision may compute f32 matmuls at reduced precision)
        precision = None if self.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST

        def cell_step(c, h, x, kernel, bias, units):
            gates = jnp.dot(
                jnp.concatenate([x, h], axis=-1).astype(self.dtype),
                kernel.astype(self.dtype),
                preferred_element_type=jnp.float32,
                precision=precision,
            ) + bias
            i, j, f, o = jnp.split(gates, 4, axis=-1)
            new_c = jax.nn.sigmoid(f + 1.0) * c + jax.nn.sigmoid(i) * jnp.tanh(j)
            new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
            del units
            return new_c, new_h

        def scan_body(carry, x_t):
            new_carry = []
            inp = x_t
            for (c, h), k, b, u in zip(carry, kernels, biases, self.features):
                c2, h2 = cell_step(c, h, inp, k, b, u)
                new_carry.append((c2, h2))
                inp = h2
            return tuple(new_carry), inp

        init = tuple(
            (
                jnp.zeros((batch, h), jnp.float32),
                jnp.zeros((batch, h), jnp.float32),
            )
            for h in self.features
        )
        xs_t = jnp.swapaxes(xs, 0, 1)  # [T, B, D]
        final_state, ys = jax.lax.scan(scan_body, init, xs_t, unroll=self.unroll)
        outputs = jnp.swapaxes(ys, 0, 1)  # [B, T, H]
        if return_final_state:
            return outputs, final_state
        return outputs


class Dense(nn.Module):
    """FC layer with the reference's two flavors:

    - `tanh_coord=True`: the shared `to_coord` head — normal(0.02) init,
      zero bias, tanh (reference models/networks/layers.py:24-28).
    - `relu=True`: tf.contrib.layers.fully_connected's DEFAULT relu
      activation, which the reference's vae_encoder/vae_decoder/seq_discr
      all rely on implicitly (quirk Q6-revised; see networks.py docstring).
    - both False: plain linear, Xavier init.
    """

    features: int
    tanh_coord: bool = False
    relu: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        init = (
            nn.initializers.normal(stddev=0.02) if self.tanh_coord else xavier_uniform
        )
        y = nn.Dense(
            self.features,
            kernel_init=init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        if self.tanh_coord:
            return jnp.tanh(y)
        if self.relu:
            return nn.relu(y)
        return y
