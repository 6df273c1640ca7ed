"""kpvid_tpu — TPU-native framework for unsupervised-keypoint-guided,
class-conditional video prediction.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
YunjiKim/Unsupervised-Keypoint-Learning-for-Guiding-Class-conditional-Video-Prediction
(NeurIPS 2019). The reference is a single-GPU TensorFlow-1 monolith; this
framework is designed TPU-first:

- compute path is pure-functional JAX, jitted end-to-end; convs/matmuls run
  bf16 on the MXU with f32 accumulation and f32 losses,
- time recurrence (32-step keypoint LSTMs) is `lax.scan`, not Python unrolls,
- the keypoint "pose head" (spatial soft-argmax + Gaussian re-render) has a
  fused Pallas kernel for the bandwidth-bound path,
- scaling is `jax.sharding.Mesh` + pjit data/model sharding with XLA
  collectives over ICI — no hand-written communication layer,
- checkpoints are pytree-native with name-filtered merge restore, preserving
  the reference's two-checkpoint composition semantics
  (reference: models/base_model.py:83-92).

Subpackage map:
  configs/   dataclass config + YAML loader (parity with configs/penn.yaml)
  ops/       numeric core: soft-argmax, Gaussian heatmaps, blend, resize,
             colorize; Pallas fusions of the hot ones
  models/    flax networks + the four model graphs (stage1, stage2,
             keypoint labeler, fused final generator)
  losses/    VGG19 perceptual, GAN BCE, VAE KL (raw-sigma convention)
  data/      host-side loaders (Penn Action + synthetic), augment, prefetch
  train/     train states (separate G/D Adam), jitted steps, loops, metrics
  parallel/  mesh construction + sharding rules
  eval/      fused generation, image/PNG writers
  utils/     checkpointing, logging, colors
"""

__version__ = "0.1.0"
