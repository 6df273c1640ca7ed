"""Worker process for tests/test_multiprocess.py.

Runs the REAL production components — parallel.maybe_initialize (from the
KPVID_* env contract), make_mesh over the GLOBAL device set, shard_state,
HostDataPipeline with per-host local batches, device_prefetch's
make_array_from_process_local_data assembly, both trainers' fused steps,
and the multi-process AsyncCheckpointManager path — then dumps final
params/metrics to an .npz for the parent to compare.

Single-process mode (no KPVID_COORDINATOR in env): 2 local CPU devices.
Multi-process mode: 2 processes x 1 local CPU device = the same 2-device
'data' mesh. With local batch 1, each host's strided index shard IS the
single-process stream position of its device slot, so the assembled
global batches are IDENTICAL (same order, not just the same set) — the
comparison is exact up to cross-process reduction order. (At local batch
>= 2 the strided interleave permutes the batch axis; batch-mean losses
and BN stats are invariant, but stage-2's per-sample VAE noise would pair
with different samples — an exchangeable, distributionally-identical
draw, but not step-wise comparable.)
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

n_local = int(os.environ.get("MP_WORKER_LOCAL_DEVICES", "2"))
os.environ["XLA_FLAGS"] = (
    os.environ.get("MP_WORKER_XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={n_local}"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from kpvid_tpu.parallel import maybe_initialize  # noqa: E402

maybe_initialize()

from kpvid_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kpvid_tpu.configs import Config, ModelConfig, TrainingConfig  # noqa: E402
from kpvid_tpu.data.base import HostDataPipeline, device_prefetch  # noqa: E402
from kpvid_tpu.losses import synthesize_vgg19_params  # noqa: E402
from kpvid_tpu.parallel import (  # noqa: E402
    batch_sharding,
    local_batch_size,
    make_mesh,
    shard_state,
)
from kpvid_tpu.train.stage1 import Stage1Trainer  # noqa: E402
from kpvid_tpu.train.stage2 import Stage2Trainer  # noqa: E402
from kpvid_tpu.utils.checkpoint import AsyncCheckpointManager  # noqa: E402

GLOBAL_BATCH = 2
N_STEPS = 2


def tiny_config() -> Config:
    return Config(
        model=ModelConfig(
            n_pts=6, n_action=4, cell_info=(32, 32), vae_dim=8,
            image_size=32, heatmap_size=8, n_future_frames=8,
            encoder_filters=8, translator_filters=16,
            pose_decoder_filters=16, discriminator_filters=8,
        ),
        training=TrainingConfig(batch_size=GLOBAL_BATCH, compute_dtype="float32"),
    ).validate()


class PairDataset:
    """Deterministic image pairs: content depends only on (seed,epoch,idx)
    via the pipeline's sample rng, so every process sees the same data."""

    def __len__(self):
        return 16

    def sample(self, idx, rng):
        return {
            "image": rng.uniform(-1, 1, (32, 32, 3)).astype(np.float32),
            "future_image": rng.uniform(-1, 1, (32, 32, 3)).astype(np.float32),
        }


class SeqDataset:
    def __len__(self):
        return 16

    def sample(self, idx, rng):
        return {
            "keypoints": rng.uniform(-1, 1, (6, 2)).astype(np.float32),
            "real_seq": rng.uniform(-1, 1, (8, 6, 2)).astype(np.float32),
            "action_code": np.eye(4, dtype=np.float32)[idx % 4],
        }


def make_iter(ds, mesh):
    pipe = HostDataPipeline(
        ds, local_batch_size(GLOBAL_BATCH), shuffle=True, repeat=True,
        num_workers=2, prefetch=2, seed=0,
        shard_id=jax.process_index(), num_shards=jax.process_count(),
    )
    return device_prefetch(pipe.batches(), size=2, sharding=batch_sharding(mesh))


def compile_then_sync(jitted, name, *args):
    """Production synced_compile (AOT-compile each shape -> coordination
    barrier -> execute; the Gloo first-collective window is ~30s, less
    than cross-process compile skew on this 1-core host). Using it here
    gives the wrapper real 2-process coverage."""
    from kpvid_tpu.parallel import synced_compile

    return synced_compile(jitted, name)


def to_np(tree):
    return {
        "/".join(str(p) for p in path): np.asarray(leaf, np.float32)
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def main():
    out_path, ckpt_dir = sys.argv[1], sys.argv[2]
    cfg = tiny_config()
    mesh = make_mesh(n_model=1)
    assert len(jax.devices()) == GLOBAL_BATCH, jax.devices()

    result = {}

    # ---- stage 1 -------------------------------------------------------
    tr1 = Stage1Trainer(cfg, synthesize_vgg19_params(max_width=16))
    state = shard_state(mesh, tr1.init_state(jax.random.PRNGKey(0)), min_shard_dim=64)
    it = make_iter(PairDataset(), mesh)
    batch = next(it)
    step1 = compile_then_sync(tr1.jitted_train_step, "s1_compile", state, batch)
    for step in range(N_STEPS):
        state, metrics = step1(state, batch)
        if step == 0:
            result.update({f"s1_m0_{k}": float(v) for k, v in metrics.items()})
        if step + 1 < N_STEPS:
            batch = next(it)
    result.update({f"s1_g/{k}": v for k, v in to_np(state.g_params).items()})
    result.update({f"s1_d/{k}": v for k, v in to_np(state.d_params).items()})
    result.update({f"s1_bs/{k}": v for k, v in to_np(state.batch_stats).items()})

    # multi-process checkpoint path: collective gather, primary-only write
    ckpt = AsyncCheckpointManager(ckpt_dir, "detector_translator")
    ckpt.save(N_STEPS, state)
    ckpt.wait()

    # ---- stage 2 -------------------------------------------------------
    tr2 = Stage2Trainer(cfg)
    state2 = shard_state(mesh, tr2.init_state(jax.random.PRNGKey(1)), min_shard_dim=64)
    it2 = make_iter(SeqDataset(), mesh)
    batch2 = next(it2)
    step2 = compile_then_sync(
        tr2.jitted_train_step, "s2_compile", state2, batch2, jax.random.PRNGKey(100)
    )
    for step in range(N_STEPS):
        state2, metrics2 = step2(state2, batch2, jax.random.PRNGKey(100 + step))
        if step == 0:
            result.update({f"s2_m0_{k}": float(v) for k, v in metrics2.items()})
        if step + 1 < N_STEPS:
            batch2 = next(it2)
    result.update({f"s2_g/{k}": v for k, v in to_np(state2.g_params).items()})
    result.update({f"s2_d/{k}": v for k, v in to_np(state2.d_params).items()})

    # ---- stage 2, comm-efficient dp step (shard_map, bf16 grad psum) ----
    # Same init/batches/rng as the jit stage-2 run above, through
    # parallel/dp_step.py with the mesh spanning BOTH processes: the
    # explicit bf16 pmean crosses hosts. The dp noise stream equals the
    # jit step's (global draw, per-shard slice), so the first-step
    # metrics must match s2_m0 tightly in every mode.
    import dataclasses

    from kpvid_tpu.parallel import make_dp_reduce_step

    cfg16 = dataclasses.replace(
        cfg, training=dataclasses.replace(cfg.training, dp_grad_dtype="bfloat16")
    ).validate()
    state2b = shard_state(
        mesh, Stage2Trainer(cfg).init_state(jax.random.PRNGKey(1)), min_shard_dim=64
    )
    dp_jitted = make_dp_reduce_step(cfg16, mesh, stage=2)
    it3 = make_iter(SeqDataset(), mesh)
    batch3 = next(it3)
    dp_step = compile_then_sync(
        dp_jitted, "s2dp_compile", state2b, batch3, jax.random.PRNGKey(100)
    )
    for step in range(N_STEPS):
        state2b, metrics3 = dp_step(state2b, batch3, jax.random.PRNGKey(100 + step))
        if step == 0:
            result.update({f"s2dp_m0_{k}": float(v) for k, v in metrics3.items()})
        if step + 1 < N_STEPS:
            batch3 = next(it3)
    result.update({f"s2dp_g/{k}": v for k, v in to_np(state2b.g_params).items()})
    result.update({f"s2dp_d/{k}": v for k, v in to_np(state2b.d_params).items()})

    if jax.process_index() == 0:
        np.savez(out_path, **result)
    print(f"mp_worker proc {jax.process_index()}/{jax.process_count()}: done", flush=True)


if __name__ == "__main__":
    main()
