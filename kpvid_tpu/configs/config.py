"""Typed, validated configuration.

The reference uses one YAML file loaded into a plain dict with zero
validation (reference: utils/__init__.py:8-10, configs/penn.yaml) and a set
of hard-coded constants scattered through the code (IMAGE_SIZE=128,
N_SEQUENCE_LEN=33, N_FUTURE_FRAMES=32, MIN_IMAGE_SEQ_LEN=663,
heatmap inv_std=14.3, eval batch 8).

Here everything is a dataclass with defaults equal to the reference values,
loadable from the same YAML schema (the reference's penn.yaml parses
unchanged), with the previously hard-coded constants promoted to real config
fields.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any

import yaml


@dataclasses.dataclass
class PathsConfig:
    data_dir: str = "./data/penn"
    vggnet: str = "./data/vgg19.npy"
    log_dir: str = "results/"


@dataclasses.dataclass
class LRConfig:
    # reference: configs/penn.yaml:13-16 (Adam 1e-4, exp decay x0.95 / 20k)
    start_val: float = 1e-4
    step: int = 20_000
    decay: float = 0.95
    # DP batch-scaling knobs (no reference equivalent — single device,
    # fixed batch). The round-3 equal-step control (docs/PERF.md) showed
    # per-step learning is batch-insensitive at the reference's fixed lr,
    # so scaling the global batch across chips without scaling lr wastes
    # the extra examples. The canonical recipe (linear scaling + warmup):
    #   scale: multiply start_val by the batch growth factor k
    #          (e.g. 8 for 8-way DP at the same per-chip batch),
    #   warmup_steps: ramp the lr linearly 0 -> scaled value over the
    #          first N steps to keep early Adam steps stable at large k.
    # Defaults leave the reference schedule bit-identical.
    scale: float = 1.0
    warmup_steps: int = 0


@dataclasses.dataclass
class TrainingConfig:
    # reference: configs/penn.yaml:6-16
    n_steps: int = 30_000_000
    summary_interval: int = 500
    test_interval: int = 500
    checkpoint_interval: int = 20_000
    log_interval: int = 250
    batch_size: int = 16
    lr: LRConfig = dataclasses.field(default_factory=LRConfig)
    # TPU additions (no reference equivalent):
    seed: int = 0
    # 'fused': D and G updates in ONE jitted step on the SAME batch, BOTH
    #   computed against the pre-update opponent (simultaneous update).
    #   DELIBERATE order flip vs the reference: one G forward serves both
    #   updates, the cheapest step (docs/PERF.md).
    # 'fused_dg': one batch, reference ORDER — D updates first (no-grad G
    #   forward), then G trains against the updated D. Costs one extra G
    #   forward per step vs 'fused'.
    # 'two_batch': fully reference-faithful quirk Q2 — D and G as two
    #   separate updates that each pull a fresh batch, D first
    #   (reference: models/detector_translator_model.py:92-94).
    gan_step_mode: str = "fused"
    # bf16 matmuls/convs with f32 params+loss; 'float32' for exact math.
    compute_dtype: str = "bfloat16"
    # rematerialize the frozen-VGG perceptual tower in the stage-1 backward
    # (jax.checkpoint): trades ~VGG-forward FLOPs for not keeping its 16
    # conv activations live. Measured in docs/PERF.md "Training
    # throughput" — off by default.
    remat_vgg: bool = False
    # number of most-recent checkpoints to keep (None = keep all, like the
    # reference's max_to_keep=None; reference: models/base_model.py:74)
    keep_checkpoints: int | None = None
    resume: bool = True  # fix of reference quirk Q3 (resume was unwired)
    # BN statistics mode during in-training test sweeps:
    # 'inference': use the moving averages (the mathematically-right mode,
    #   the round-1 default).
    # 'train': bug-compat with reference quirk Q5 — the reference's test
    #   sweeps run through the TRAIN graph, so BN normalizes with the test
    #   batch's own statistics (reference train.py:46 +
    #   detector_translator_model.py:165-167). Use this to compare loss
    #   curves 1:1 against a reference run. Moving averages are still only
    #   updated by the G train pass, never by eval.
    bn_eval_mode: str = "inference"
    # BN mode for the periodic summary IMAGES:
    # 'inference': moving-average BN (default; stable pictures early on).
    # 'train': render from the train-mode graph like the reference's image
    #   summaries do (detector_translator_model.py:205-244 hang off the
    #   train forward) — use for 1:1 visual comparison against a reference
    #   run while moving stats are still stale. Never updates the stats.
    summary_bn_mode: str = "inference"
    # How the four shared-weight pair forwards (pose encoder, both
    # discriminators, VGG) batch their two inputs (ops/batching.py):
    # 'interleave': rows [a0,b0,a1,b1,...] — shard-aligned under a
    #   batch-sharded mesh (zero-collective pure-DP graphs), ~6% slower
    #   stage-1 step on one chip (strided row shuffle; docs/PERF.md).
    # 'concat': rows [a0..aB,b0..bB] (the reference's tf.concat shape) —
    #   fastest on a single device, collective-poison under a mesh.
    # 'auto' (default): 'concat' when exactly one device is visible,
    #   'interleave' otherwise. Both modes run identical per-row math
    #   (equivalence-tested); checkpoints are interchangeable.
    pair_batching: str = "auto"
    # Gradient cross-replica reduction dtype under pure-DP meshes
    # (parallel/dp_step.py; no reference equivalent — single device):
    # 'float32' (default): the jit-SPMD path — XLA inserts f32 grad psums.
    # 'bfloat16': a shard_map train step that pmean's the per-shard
    #   gradients in bf16 before the (replicated, f32) Adam update —
    #   HALVES the per-step ICI payload (docs/PERF.md "Multi-chip
    #   scaling"). BN stays global-batch (sync BN over the mesh axis) and
    #   the VAE noise stream is identical to the jit path; the only
    #   numeric delta is bf16 rounding of the averaged gradients
    #   (equivalence-tested in tests/test_dp_step.py). Pure-DP only
    #   (parallel.mesh_model must be 1).
    dp_grad_dtype: str = "float32"
    # Gradient accumulation: K microbatches of batch_size/K rows per
    # optimizer update ('fused' step mode only). Activation memory of a
    # K-times-smaller forward at the same global batch. Stage-2: exactly
    # the full-batch step (no BN, noise split from one draw). Stage-1:
    # standard grad-accum BN semantics (per-micro statistics, EMA applied
    # K times/step). Composes with dp_grad_dtype (reduction happens once,
    # on the averaged grads). See train/stage1.py::train_step_accum.
    grad_accum: int = 1


@dataclasses.dataclass
class ModelConfig:
    # reference: configs/penn.yaml:18-23
    n_pts: int = 40
    n_action: int = 9
    cell_info: tuple[int, ...] = (1024, 1024)
    vae_dim: int = 64
    # constants hard-coded in the reference, promoted to config:
    image_size: int = 128          # data/image_pair_dataloader.py:13
    n_future_frames: int = 32      # models/motion_generator_model.py:11
    heatmap_inv_std: float = 14.3  # utils/model.py:49
    heatmap_size: int = 32         # detector_translator_model.py:168-169
    # encoder trunk base filters (reference: networks/__init__.py:7)
    encoder_filters: int = 32
    translator_filters: int = 256  # networks/__init__.py:75
    pose_decoder_filters: int = 128  # networks/__init__.py:36
    discriminator_filters: int = 64  # PatchGAN base width, networks/__init__.py:141
    # 2x upsample formulation in the translator — purely a speed knob
    # (ops/resize.py; measured in docs/PERF.md):
    # 'tf1'    elementwise interleave (training default),
    # 'matmul' the same legacy-bilinear stencil as two dense matmuls on
    #          the MXU; matches 'tf1' within 1 bf16 ulp (weights 1 and
    #          0.5 are exact power-of-two scalings; only the accumulation
    #          order differs — verified in test_matmul_mode_matches_tf1),
    # 'fused'  fold each upsample into the following conv as one
    #          input-dilated 5x5 conv (exact; serving default).
    upsample_mode: str = "tf1"
    # lax.scan unroll for the LSTM stacks (identical numerics; fewer loop
    # iterations + cross-step fusion at the cost of code size / compile
    # time; SURVEY §5.7). Swept in tools/profile_train_step.py.
    lstm_unroll: int = 1


@dataclasses.dataclass
class DataConfig:
    """Host pipeline knobs (reference: data/base_dataloader.py:32-54).

    No shuffle-buffer knob: the reference's shuffle(2000) window is
    superseded by full-epoch permutation in HostDataPipeline (strictly
    better mixing, deterministic per (seed, epoch))."""

    # None -> min(12, 4 * cpu_count): the reference's 12 map-threads assume
    # a multi-core host; on few-core hosts 12 threads thrash the scheduler
    # (measured 27 samples/s at 12 workers vs 107 at 4 on one core —
    # docs/PERF.md "Host input pipeline").
    num_workers: int | None = None
    prefetch: int = 2
    # decoded-frame LRU budget (MB) for stage-1 training; 0 = off. Exact
    # numerics (caches post-decode RGB pixels). Full Penn Action decoded is
    # ~32 GB — size to available host RAM. See data/cache.py.
    decode_cache_mb: float = 0.0
    # C++ geometry backend for the per-frame chain (rotate / bicubic
    # resize / to-float): byte-identical to the PIL path (kpvid_tpu/native;
    # proven in tests/test_native.py + an import-time self-check).
    # 'auto' = use it when it builds and verifies on this host;
    # 'on' = require it; 'off' = PIL only.
    native_ops: str = "auto"
    # sequence loading (reference: data/sequence_dataloader.py:14)
    sequence_len: int = 33
    # pseudo-labeling (reference: data/keypoint_dataloader.py:13). The TPU
    # pipeline chunks videos instead of padding to 663; this is only the
    # fallback pad length for compat mode.
    min_image_seq_len: int = 663
    # chunk size for streaming video frames through the pose encoder
    labeler_chunk: int = 128
    eval_batch_size: int = 8       # evaluate.py:27
    synthetic: bool = False        # use the synthetic dataset (tests/bench)


@dataclasses.dataclass
class ParallelConfig:
    """Multi-chip layout (no reference equivalent: the reference is strictly
    single-device, reference train.py:25-29). A ('data', 'model') mesh is
    built whenever more than one device is visible (or mesh_model > 1);
    batches shard over 'data', wide kernels (>= min_shard_dim output dim)
    shard over 'model', gradients all-reduce over ICI via XLA psum."""

    mesh_data: int | None = None  # None = all visible devices / mesh_model
    mesh_model: int = 1
    min_shard_dim: int = 1024     # narrower kernels stay replicated


@dataclasses.dataclass
class Config:
    paths: PathsConfig = dataclasses.field(default_factory=PathsConfig)
    training: TrainingConfig = dataclasses.field(default_factory=TrainingConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    parallel: ParallelConfig = dataclasses.field(default_factory=ParallelConfig)

    def validate(self) -> "Config":
        m, t = self.model, self.training
        if m.n_pts <= 0 or m.n_action <= 0:
            raise ValueError("model.n_pts and model.n_action must be positive")
        if m.image_size != 4 * m.heatmap_size:
            # the translator upsamples the heatmap-resolution joint embedding
            # exactly 2 octaves (reference networks/__init__.py:75-102), so
            # any other ratio would trace into a shape error mid-model
            raise ValueError(
                f"image_size ({m.image_size}) must be exactly 4 * heatmap_size "
                f"({m.heatmap_size}): the translator has two 2x upsample octaves"
            )
        if t.gan_step_mode not in ("fused", "fused_dg", "two_batch"):
            raise ValueError(f"unknown gan_step_mode {t.gan_step_mode!r}")
        if t.bn_eval_mode not in ("inference", "train"):
            raise ValueError(f"unknown bn_eval_mode {t.bn_eval_mode!r}")
        if t.summary_bn_mode not in ("inference", "train"):
            raise ValueError(f"unknown summary_bn_mode {t.summary_bn_mode!r}")
        if t.pair_batching not in ("auto", "interleave", "concat"):
            raise ValueError(f"unknown pair_batching {t.pair_batching!r}")
        if m.upsample_mode not in ("tf1", "matmul", "fused"):
            raise ValueError(f"unknown model.upsample_mode {m.upsample_mode!r}")
        if m.lstm_unroll < 1:
            raise ValueError("model.lstm_unroll must be >= 1")
        if self.data.native_ops not in ("auto", "on", "off"):
            raise ValueError(
                f"data.native_ops must be auto|on|off, got {self.data.native_ops!r}"
            )
        if t.compute_dtype not in ("bfloat16", "float32"):
            raise ValueError(f"unknown compute_dtype {t.compute_dtype!r}")
        if t.dp_grad_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"unknown dp_grad_dtype {t.dp_grad_dtype!r}")
        if t.lr.scale <= 0:
            raise ValueError("training.lr.scale must be positive")
        if t.lr.warmup_steps < 0:
            raise ValueError("training.lr.warmup_steps must be >= 0")
        if t.grad_accum < 1:
            raise ValueError("training.grad_accum must be >= 1")
        if t.grad_accum > 1:
            if t.batch_size % t.grad_accum:
                raise ValueError(
                    f"batch_size ({t.batch_size}) must be divisible by "
                    f"grad_accum ({t.grad_accum})"
                )
            if t.gan_step_mode != "fused":
                raise ValueError(
                    "grad_accum > 1 implements the 'fused' step semantics "
                    f"only (got gan_step_mode={t.gan_step_mode!r})"
                )
        if t.dp_grad_dtype == "bfloat16" and self.parallel.mesh_model > 1:
            raise ValueError(
                "training.dp_grad_dtype='bfloat16' is pure-DP only "
                "(parallel.mesh_model must be 1; see parallel/dp_step.py)"
            )
        if t.batch_size <= 0:
            raise ValueError("batch_size must be positive")
        p = self.parallel
        if p.mesh_model < 1 or (p.mesh_data is not None and p.mesh_data < 1):
            raise ValueError("parallel.mesh_data/mesh_model must be >= 1")
        return self


def _build(cls, raw: dict[str, Any]):
    """Recursively build a dataclass from a dict, rejecting unknown keys."""
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for key, val in raw.items():
        if key not in fields:
            raise ValueError(f"unknown config key {key!r} for {cls.__name__}")
        ftype = fields[key].type
        nested = {
            "lr": LRConfig,
            "paths": PathsConfig,
            "training": TrainingConfig,
            "model": ModelConfig,
            "data": DataConfig,
            "parallel": ParallelConfig,
        }
        if key in nested and isinstance(val, dict):
            kwargs[key] = _build(nested[key], val)
        elif key == "cell_info":
            kwargs[key] = tuple(int(v) for v in val)
        else:
            kwargs[key] = val
        del ftype
    return cls(**kwargs)


def load_config(path: str | Path) -> Config:
    """Load a YAML config. The reference's penn.yaml schema parses as-is."""
    with open(path, "r") as f:
        raw = yaml.safe_load(f) or {}
    return _build(Config, raw).validate()


def config_to_dict(cfg: Config) -> dict[str, Any]:
    return dataclasses.asdict(cfg)
