"""Portable serving artifacts: the fused generate graph as serialized StableHLO.

The reference's deployment unit is a TF1 checkpoint PLUS the model source —
its evaluate.py rebuilds the whole graph from code before it can run one
video (reference evaluate.py:40-77). Here the compiled serving graph itself
is the artifact: `export_serving` lowers `FinalGenerator.generate` through
`jax.export` with the checkpoint weights baked in as module constants and
writes ONE self-contained file. Loading (`load_serving`) needs jax only —
no kpvid_tpu model code, no config, no checkpoint tree — and runs on every
platform chosen at export time (default 'tpu' + 'cpu' via jax.export's
multi-platform lowering, so one artifact serves a TPU fleet and still
smoke-tests on a CPU dev box).

Contract: a video is a pure function of (image, action one-hot, z) — the
same batching-invariant signature the serving daemon uses (eval/server.py
draws one z per request), so exported graphs take z explicitly and carry no
RNG state. Graphs are exported per batch size (XLA wants static shapes;
the daemon's compile-once batch buckets use the same discipline).

Artifact format — a single .npz:
    meta         uint8 blob of a JSON dict (shapes, platforms, jax version)
    graph_b{B}   uint8 blob: jax.export.Exported.serialize() at batch B

Numerics: weights are compile-time constants in the artifact, so XLA may
fold them differently than the live graph's runtime-argument params —
outputs match to float-reassociation tolerance, not bit-for-bit (measured
max |diff| ~4e-8 on CPU, ~2e-5 on a real v5e chip for f32 [-1,1] images;
tests/test_export.py).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from .final import FinalGenerator

_FORMAT_VERSION = 1


def export_serving(
    final: FinalGenerator,
    stage1_vars: dict,
    stage2_params: dict,
    path: str | Path,
    batch_sizes: Sequence[int] = (1, 32),
    platforms: Sequence[str] = ("cpu", "tpu"),
) -> dict:
    """Serialize the fused serving graph (weights baked in) to `path`.

    One graph per batch size in `batch_sizes`; each runs on every platform
    in `platforms`. Returns the artifact's meta dict.
    """
    m = final.config.model
    batch_sizes = sorted(set(int(b) for b in batch_sizes))
    if not batch_sizes or min(batch_sizes) < 1:
        raise ValueError(f"batch_sizes must be positive ints, got {batch_sizes}")

    def fn(im, action_code, z):
        # weights enter via the closure -> baked into the module as
        # constants; z explicit -> no RNG state in the artifact
        return final.generate(
            stage1_vars, stage2_params, im, action_code, rng=None, z=z
        )

    arrays: dict[str, np.ndarray] = {}
    out_names: list[str] = []
    for b in batch_sizes:
        specs = (
            jax.ShapeDtypeStruct((b, m.image_size, m.image_size, 3), jnp.float32),
            jax.ShapeDtypeStruct((b, m.n_action), jnp.float32),
            jax.ShapeDtypeStruct((b, m.vae_dim), jnp.float32),
        )
        exp = jax.export.export(jax.jit(fn), platforms=list(platforms))(*specs)
        out_names = sorted(jax.eval_shape(fn, *specs).keys())
        arrays[f"graph_b{b}"] = np.frombuffer(exp.serialize(), dtype=np.uint8)

    meta = {
        "format_version": _FORMAT_VERSION,
        "image_size": m.image_size,
        "n_action": m.n_action,
        "vae_dim": m.vae_dim,
        "n_future_frames": m.n_future_frames,
        "batch_sizes": batch_sizes,
        "platforms": list(platforms),
        "outputs": out_names,
        "jax_version": jax.__version__,
    }
    arrays["meta"] = np.frombuffer(json.dumps(meta).encode("utf-8"), dtype=np.uint8)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        np.savez(f, **arrays)
    return meta


class ServingArtifact:
    """A loaded serving artifact: call `generate(im, action_code, z)`.

    Each batch bucket's deserialized graph is wrapped in one `jax.jit` at
    load time (compile-once-per-bucket, like the serving daemon)."""

    def __init__(self, meta: dict, exported: dict[int, "jax.export.Exported"]):
        self.meta = meta
        self.batch_sizes = sorted(exported)
        # kept public: exported graphs are traceable, so callers may re-wrap
        # them with epilogues (eval/server.py::ArtifactEngine jits a
        # device-side uint8 quantizer around them)
        self.exported = exported
        self._calls = {b: jax.jit(e.call) for b, e in exported.items()}

    def generate(self, im, action_code, z) -> dict:
        """im [B,S,S,3] in [-1,1], action_code [B,A] one-hot, z [B,vae_dim].
        B must be one of the exported batch buckets."""
        b = im.shape[0]
        if b not in self._calls:
            raise ValueError(
                f"batch size {b} not in exported buckets {self.batch_sizes}"
            )
        return self._calls[b](
            jnp.asarray(im, jnp.float32),
            jnp.asarray(action_code, jnp.float32),
            jnp.asarray(z, jnp.float32),
        )


def load_serving(path: str | Path) -> ServingArtifact:
    """Load an artifact written by `export_serving`. Needs jax only."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["meta"]).decode("utf-8"))
        if meta.get("format_version") != _FORMAT_VERSION:
            raise ValueError(
                f"unsupported artifact format {meta.get('format_version')!r}"
            )
        exported = {
            b: jax.export.deserialize(bytearray(data[f"graph_b{b}"].tobytes()))
            for b in meta["batch_sizes"]
        }
    return ServingArtifact(meta, exported)
