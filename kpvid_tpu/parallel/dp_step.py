"""Comm-efficient pure-DP train steps: explicit bf16 gradient all-reduce.

The ordinary train steps (train/stage1.py, train/stage2.py under plain
jax.jit with sharded inputs) leave collective placement to XLA, which
all-reduces the f32 gradients — 201.5 MB/step for stage-1 and 155.2 MB
for stage-2 at production widths, and that payload is the ENTIRE
multi-chip cost of pure data parallelism here (docs/PERF.md "Multi-chip
scaling"; the compiled graphs contain no other collectives).

This module runs the SAME trainer step functions inside `jax.shard_map`
over the 'data' mesh axis with explicit reductions instead:

- gradients: cross-replica pmean in `training.dp_grad_dtype` —
  'bfloat16' HALVES the ICI bytes per step. Params, Adam state, and the
  update math stay f32 on every chip; only the cross-chip gradient
  average is rounded to bf16 (train/state.py::make_reduce_hooks).
- stage-1 BN: sync-BN over the same axis (flax `axis_name` pmean inside
  BatchNorm) — per-shard forwards see GLOBAL-batch statistics, exactly
  the jit-SPMD semantics; running stats stay replicated-consistent.
- stage-2 VAE noise: drawn for the GLOBAL batch from the shared key and
  sliced per shard (Stage2Trainer._make_noise) — byte-identical stream
  to the whole-array jit step.
- metrics: f32 pmean (global batch means, same values the jit step logs).

The step signature, state pytree, and checkpoints are IDENTICAL to the
jit-SPMD path, so the two are freely interchangeable mid-run. Pure-DP
only: with a 'model' axis the params would be TP-sharded and the
per-shard replicated-update assumption breaks (config.validate rejects
the combination).

No reference counterpart — the reference trains on one device (reference
train.py:25-29). Equivalence and collective-payload tests:
tests/test_dp_step.py; production-width pricing: tools/multichip_cost.py
--dp-grad-dtype bfloat16.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P


def make_dp_reduce_step(
    config,
    mesh: Mesh,
    stage: int,
    vgg_params: dict | None = None,
    mode: str | None = None,
    donate: bool = True,
):
    """Build the shard_map DP train step for `stage` (1 or 2) over `mesh`.

    Returns a jitted function with the SAME signature as the
    corresponding trainer's jitted step:
      stage 1: (state, batch) / (state, batch_d, batch_g)   for two_batch
      stage 2: (state, batch, rng) / (state, batch_d, batch_g, rng)
    State must be replicated on the mesh, batches sharded over 'data'
    (parallel/sharding.py does both); outputs are replicated.

    `mode` defaults to config.training.gan_step_mode. The gradient
    reduction dtype comes from config.training.dp_grad_dtype ('float32'
    reduces in f32 — same bytes as the jit path, useful as a control;
    'bfloat16' halves them).
    """
    if mesh.shape.get("model", 1) != 1:
        raise ValueError(
            "make_dp_reduce_step is pure-DP only: mesh has a 'model' axis "
            f"of size {mesh.shape.get('model')} (params must be replicated "
            "for the per-shard optimizer update to stay consistent)"
        )
    mode = mode or config.training.gan_step_mode
    if mode not in ("fused", "fused_dg", "two_batch"):
        raise ValueError(f"unknown gan_step_mode {mode!r}")

    # Inside shard_map every pair-batch site is SHARD-LOCAL (the body sees
    # only its own rows), so the mesh-alignment reason for 'interleave'
    # (ops/batching.py) vanishes and the single-chip-fastest 'concat'
    # layout is safe — resolve 'auto' to it regardless of visible device
    # count (identical per-row math; BN stats to summation order).
    # An explicit pair_batching setting is respected.
    if config.training.pair_batching == "auto":
        import copy

        config = copy.deepcopy(config)
        config.training.pair_batching = "concat"

    if stage == 1:
        from ..train.stage1 import Stage1Trainer

        if vgg_params is None:
            raise ValueError("stage 1 needs vgg_params")
        trainer = Stage1Trainer(config, vgg_params, reduce_axis="data")
        rng_specs = ()
    elif stage == 2:
        from ..train.stage2 import Stage2Trainer

        trainer = Stage2Trainer(
            config, reduce_axis="data", reduce_axis_size=mesh.shape["data"]
        )
        rng_specs = (P(),)  # the PRNG key is shared by every shard
    else:
        raise ValueError(f"stage must be 1 or 2, got {stage!r}")

    # grad_accum composes: the accum step calls self._reduce_grads ONCE on
    # the K-micro average, so the cross-replica traffic stays one set of
    # grad bytes per optimizer update regardless of K
    fused_step = (
        trainer.train_step_accum
        if config.training.grad_accum > 1
        else trainer.train_step
    )
    fn = {
        "fused": fused_step,
        "fused_dg": trainer.train_step_dg,
        "two_batch": trainer.train_step_two_batch,
    }[mode]
    n_batches = 2 if mode == "two_batch" else 1
    in_specs = (P(),) + (P("data"),) * n_batches + rng_specs
    # check_vma=False: the varying-manual-axes type checker rejects
    # lax.scan carries whose init is unvarying (zeros) but whose output is
    # varying (the LSTM state) — a known friction, see jax shard_map docs
    # "scan vma". Replication of the outputs is guaranteed by construction
    # here: grads/metrics are pmean'd and BN stats are sync'd, so every
    # shard computes the identical update.
    mapped = jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=(P(), P()), check_vma=False
    )
    return jax.jit(mapped, donate_argnums=(0,) if donate else ())
