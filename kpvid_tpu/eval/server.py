"""Production serving daemon: micro-batched video generation over HTTP.

No reference counterpart — the reference ships only the offline
evaluate.py sweep (reference evaluate.py:41-131); this is the rebuild's
own production-serving subsystem, built on the same fused serving graph
(eval/final.py) that bench.py measures.

Design:

- ``MicroBatcher``: incoming requests land in a queue; a single
  dispatcher thread drains up to ``max_batch`` of them (waiting at most
  ``max_wait_ms`` after the first pending request so singletons don't
  stall), pads the batch up to a fixed BUCKET size, and runs the jitted
  generator once. Fixed buckets mean XLA compiles one program per bucket
  (compiled lazily or at ``warmup()``), never per request pattern.
- **Batching-invariant determinism**: the motion latent ``z`` is derived
  from the request's seed on the host (one ``np.random.default_rng(seed)``
  standard normal per request) and fed through
  ``FinalGenerator.generate(z=...)``, so each sample's video depends only
  on its own (image, action, seed) — never on which micro-batch it rode
  in. Same seed -> same video, under any traffic.
- HTTP layer: stdlib ``ThreadingHTTPServer`` — handler threads do the
  host work (decode, preprocess, response encoding) while the dispatcher
  thread owns the device, so the TPU never waits on PNG codecs.
- **uint8 on the wire, quantized on device**: the serving program
  converts ``pred_im_seq``/``mask`` to uint8 *inside* the jitted graph
  (same truncating ``*255`` rounding as the PNG writer — byte-equality
  vs the host ``to_uint8`` is tested), so the device→host readback moves
  4x fewer bytes (268 MB -> 67 MB per batch-32 call at 128^2). Readback
  is the daemon's dominant non-compute cost; see docs/PERF.md.

Endpoints:
    POST /v1/generate   JSON {"image": <base64 PNG/JPEG>, "action": int,
                              "seed": int?, "format": "npz"|"gif"}
                        -> npz (pred_im_seq/mask uint8, keypoints f32)
                           or animated GIF of the predicted video
    GET  /healthz       liveness + model/bucket info
    GET  /stats         request/batch counters and latency percentiles

Input preprocessing matches the evaluation pipeline exactly (short side
-> image_size, center crop, [-1,1]; data/sequence.py eval path), so the
served distribution is the one the model was evaluated on.
"""

from __future__ import annotations

import base64
import io
import json
import queue
import threading
import time
from collections import deque
from concurrent.futures import Future
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

import jax
import jax.numpy as jnp

from ..configs import Config
from ..data import augment
from .final import FinalGenerator

DEFAULT_BUCKETS = (1, 2, 4, 8, 16, 32)


def preprocess_image(pil_image, image_size: int, ops=None) -> np.ndarray:
    """Decode-side geometry chain, identical to the eval dataset's
    (data/sequence.py: short side -> image_size via the reference
    center-crop box, then [-1,1] float32). Returns [S, S, 3]."""
    ops = ops or augment.resolve_frame_ops("auto")
    frame = ops.prepare(pil_image.convert("RGB"))
    box, ratio = augment.center_crop_box(ops.size(frame), image_size)
    w, h = ops.size(frame)
    frame = ops.crop(ops.resize(frame, (int(w / ratio), int(h / ratio))), box)
    return ops.to_pm1(frame)


def request_z(seed: int, vae_dim: int) -> np.ndarray:
    """The request's motion latent: z ~ N(0,1)^vae_dim from a host-side
    Philox stream keyed by the request seed. Host-side (not
    jax.random) so enqueueing a request never touches the device."""
    return np.random.default_rng(seed).standard_normal(vae_dim).astype(np.float32)


def to_uint8(x: np.ndarray, rescale: bool = True) -> np.ndarray:
    """[-1,1] (or [0,1] with rescale=False) -> uint8, same rounding as
    evaluate.py's PNG writer (truncating cast after *255)."""
    if rescale:
        x = 0.5 * (x + 1.0)
    return (np.clip(x, 0.0, 1.0) * 255).astype(np.uint8)


def device_quantize(x: jax.Array, rescale: bool = True) -> jax.Array:
    """On-device mirror of :func:`to_uint8` — same f32 arithmetic, same
    truncating float->uint8 cast (XLA ConvertElementType rounds toward
    zero, like numpy's astype), asserted byte-equal in
    tests/test_server.py::test_device_quantize_matches_host. Runs inside
    the jitted serving program so the D2H readback is uint8."""
    x = x.astype(jnp.float32)
    if rescale:
        x = 0.5 * (x + 1.0)
    return (jnp.clip(x, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def encode_gif(frames_u8: np.ndarray, fps: int = 8) -> bytes:
    """[T, H, W, 3] uint8 -> animated GIF bytes."""
    from PIL import Image

    ims = [Image.fromarray(f) for f in frames_u8]
    buf = io.BytesIO()
    ims[0].save(
        buf, format="GIF", save_all=True, append_images=ims[1:],
        duration=int(1000 / fps), loop=0,
    )
    return buf.getvalue()


class InferenceEngine:
    """Owns the merged parameters and the jitted serving graph; maps a
    host-side (images, actions, z) batch to host-side numpy outputs.

    The serving program wraps ``FinalGenerator.generate`` with a
    device-side uint8 epilogue for the image-valued outputs
    (``pred_im_seq``, ``mask``), shrinking the per-call readback 4x —
    the wire format is uint8 anyway (npz/GIF/PNG)."""

    OUTPUT_KEYS = ("pred_im_seq", "mask", "current_points", "future_points")

    def __init__(
        self,
        config: Config,
        stage1_vars: dict,
        stage2_params: dict,
        mesh=None,
    ):
        """mesh: optional jax.sharding.Mesh for multi-chip serving — params
        replicate, request batches shard over the 'data' axis (the
        batch-parallel layout proven exact in
        tests/test_parallel.py::test_serving_generate_dp). The MicroBatcher
        aligns its buckets to the data-axis size so every padded batch
        divides evenly."""
        self.config = config
        self.final = FinalGenerator(config)
        self.mesh = mesh
        if mesh is not None:
            from ..parallel import batch_sharding, replicate

            stage1_vars = replicate(mesh, stage1_vars)
            stage2_params = replicate(mesh, stage2_params)
            self._batch_sharding = batch_sharding(mesh)
            self.n_data = mesh.shape["data"]
        else:
            self.n_data = 1
        self.s1_vars = stage1_vars
        self.s2_params = stage2_params
        self.vae_dim = config.model.vae_dim
        self.image_size = config.model.image_size
        self.n_action = config.model.n_action
        self.n_future_frames = config.model.n_future_frames
        self._jit_serve = jax.jit(self._serve_program)

    def _serve_program(self, s1_vars, s2_params, images, act, z) -> dict:
        out = self.final.generate(s1_vars, s2_params, images, act, None, z=z)
        return {
            "pred_im_seq": device_quantize(out["pred_im_seq"]),
            "mask": device_quantize(out["mask"], rescale=False),
            "current_points": out["current_points"].astype(jnp.float32),
            "future_points": out["future_points"].astype(jnp.float32),
        }

    def dispatch(self, images: np.ndarray, actions: np.ndarray, z: np.ndarray) -> dict:
        """Async half: enqueue the jitted serving program, return DEVICE
        arrays immediately (no sync). Pair with :meth:`fetch`; the
        MicroBatcher uses the split to overlap batch N's compute with
        batch N-1's device->host readback."""
        act = np.zeros((actions.shape[0], self.n_action), np.float32)
        act[np.arange(actions.shape[0]), actions] = 1.0
        if self.mesh is not None:
            images = jax.device_put(images, self._batch_sharding)
            act = jax.device_put(act, self._batch_sharding)
            z = jax.device_put(z, self._batch_sharding)
        return self._jit_serve(self.s1_vars, self.s2_params, images, act, z)

    @staticmethod
    def fetch(out: dict) -> dict:
        """Blocking half: device arrays -> host numpy. np.asarray is the
        hard sync (jax.block_until_ready is unreliable under the axon
        tunnel — CLAUDE.md); never drop a dispatched batch without
        fetching it, the tunnel backlogs."""
        return {k: np.asarray(jax.device_get(v)) for k, v in out.items()}

    def run(self, images: np.ndarray, actions: np.ndarray, z: np.ndarray) -> dict:
        """images [B,S,S,3] f32 in [-1,1]; actions [B] int; z [B,vae_dim].
        Returns pred_im_seq/mask as uint8, points as f32."""
        return self.fetch(self.dispatch(images, actions, z))


class ArtifactEngine:
    """InferenceEngine drop-in backed by a serialized serving artifact
    (eval/export.py): the daemon runs from ONE file — no model code path,
    config, or checkpoint tree on the serving host. Batch buckets are the
    artifact's exported batch sizes (jax.export graphs have static shapes,
    like the MicroBatcher's compile-once buckets). The device-side uint8
    epilogue wraps each deserialized graph in an outer jit — exported
    graphs are traceable — so the wire format and 4x-smaller readback
    match InferenceEngine exactly. Outputs agree with a live
    InferenceEngine to float-reassociation tolerance (<= 1 uint8 step at
    quantization boundaries; tests/test_server.py)."""

    OUTPUT_KEYS = InferenceEngine.OUTPUT_KEYS

    def __init__(self, artifact):
        meta = artifact.meta
        self.vae_dim = int(meta["vae_dim"])
        self.image_size = int(meta["image_size"])
        self.n_action = int(meta["n_action"])
        self.n_future_frames = int(meta["n_future_frames"])
        self.n_data = 1  # artifact graphs are single-device programs
        self.buckets = tuple(artifact.batch_sizes)

        def quantized(exp):
            def fn(images, act, z):
                out = exp.call(images, act, z)
                return {
                    "pred_im_seq": device_quantize(out["pred_im_seq"]),
                    "mask": device_quantize(out["mask"], rescale=False),
                    "current_points": out["current_points"].astype(jnp.float32),
                    "future_points": out["future_points"].astype(jnp.float32),
                }

            return jax.jit(fn)

        self._fns = {b: quantized(e) for b, e in artifact.exported.items()}

    def dispatch(self, images: np.ndarray, actions: np.ndarray, z: np.ndarray) -> dict:
        b = images.shape[0]
        if b not in self._fns:
            raise ValueError(
                f"batch size {b} not in the artifact's exported buckets "
                f"{list(self.buckets)}"
            )
        act = np.zeros((b, self.n_action), np.float32)
        act[np.arange(b), actions] = 1.0
        return self._fns[b](images, act, z)

    fetch = staticmethod(InferenceEngine.fetch)

    def run(self, images: np.ndarray, actions: np.ndarray, z: np.ndarray) -> dict:
        return self.fetch(self.dispatch(images, actions, z))


@dataclass
class _Pending:
    image: np.ndarray
    action: int
    z: np.ndarray
    future: Future = field(default_factory=Future)
    enqueued_at: float = field(default_factory=time.monotonic)


class MicroBatcher:
    """Request coalescing in front of an InferenceEngine.

    One dispatcher thread drains the queue: it waits up to ``max_wait_ms``
    after the first pending request for companions, takes at most
    ``max_batch`` (= the largest bucket), zero-pads up to the smallest
    bucket that fits, runs the engine once, and completes each request's
    Future with its own slice. Pad rows are zeros (image, one-hot, z) and
    are computed-then-discarded; with inference-mode BN there is no
    cross-row coupling, so padding changes nothing but the program shape.

    **Depth-1 dispatch pipeline** (``pipeline=True``, default): under
    sustained load the dispatcher enqueues batch N on the device BEFORE
    reading back batch N-1, so N's TPU compute overlaps N-1's
    device->host transfer + future completion (the daemon's dominant
    non-compute cost; measured in docs/PERF.md "Serving daemon"). When
    the queue goes idle the in-flight batch is drained immediately, so a
    singleton request sees no added latency. Outputs are identical
    either way — pipelining only reorders host-side waits.
    """

    def __init__(
        self,
        engine: InferenceEngine,
        buckets: tuple[int, ...] = DEFAULT_BUCKETS,
        max_wait_ms: float = 5.0,
        max_queue: int = 256,
        pipeline: bool = True,
    ):
        if not buckets or any(b <= 0 for b in buckets):
            raise ValueError(f"buckets must be positive, got {buckets}")
        self.engine = engine
        self.pipeline = pipeline
        # mesh-mode engines shard batches over 'data': round every bucket
        # up to a multiple of the data-axis size (pad rows are free rows —
        # computed-then-discarded like all bucket padding)
        n_data = getattr(engine, "n_data", 1)
        buckets = (-(-b // n_data) * n_data for b in buckets)
        self.buckets = tuple(sorted(set(buckets)))
        self.max_batch = self.buckets[-1]
        self.max_wait = max_wait_ms / 1000.0
        self._q: queue.Queue[_Pending | None] = queue.Queue(maxsize=max_queue)
        self._stats_lock = threading.Lock()
        self.requests_total = 0
        self.rejected_total = 0
        self.batches_total = 0
        self.rows_total = 0  # sum of real (unpadded) rows over batches
        self.padded_rows_total = 0
        self._latencies_ms: deque[float] = deque(maxlen=1024)
        self._thread = threading.Thread(target=self._loop, daemon=True, name="kpvid-batcher")
        self._stopped = False
        self._thread.start()

    # ------------------------------------------------------------- client
    def submit(self, image: np.ndarray, action: int, z: np.ndarray) -> Future:
        """Enqueue one request; returns a Future resolving to a dict of
        per-sample outputs. Raises queue.Full when overloaded (callers
        map it to HTTP 503)."""
        if self._stopped:
            raise RuntimeError("MicroBatcher is stopped")
        p = _Pending(image=image, action=int(action), z=z)
        try:
            self._q.put_nowait(p)
        except queue.Full:
            with self._stats_lock:
                self.rejected_total += 1
            raise
        with self._stats_lock:
            self.requests_total += 1
        return p.future

    def stop(self, timeout: float = 10.0):
        self._stopped = True
        self._q.put(None)
        self._thread.join(timeout=timeout)
        # a submit that passed the _stopped check may have enqueued BEHIND
        # the sentinel; the loop has exited, so fail those futures now
        # instead of letting their HTTP handlers hit the request timeout
        while True:
            try:
                p = self._q.get_nowait()
            except queue.Empty:
                break
            if p is not None and not p.future.done():
                p.future.set_exception(RuntimeError("MicroBatcher is stopped"))

    def stats(self) -> dict:
        with self._stats_lock:
            lat = sorted(self._latencies_ms)
            n = len(lat)
            return {
                "requests_total": self.requests_total,
                "rejected_total": self.rejected_total,
                "batches_total": self.batches_total,
                "mean_batch_rows": (self.rows_total / self.batches_total) if self.batches_total else 0.0,
                "pad_fraction": (
                    self.padded_rows_total / (self.rows_total + self.padded_rows_total)
                    if self.rows_total else 0.0
                ),
                "latency_ms_p50": lat[n // 2] if n else 0.0,
                "latency_ms_p95": lat[min(n - 1, int(n * 0.95))] if n else 0.0,
                "queue_depth": self._q.qsize(),
                "buckets": list(self.buckets),
            }

    # --------------------------------------------------------- dispatcher
    def warmup(self):
        """Compile every bucket before taking traffic (zeros batches run
        through the real jitted program; persistent XLA cache makes
        restarts cheap)."""
        s = self.engine.image_size
        for b in self.buckets:
            self.engine.run(
                np.zeros((b, s, s, 3), np.float32),
                np.zeros((b,), np.int64),
                np.zeros((b, self.engine.vae_dim), np.float32),
            )

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        return self.max_batch

    def _collect(self) -> list[_Pending] | None:
        """Block for the first request, then linger max_wait for more.
        Returns None on the stop sentinel."""
        first = self._q.get()
        if first is None:
            return None
        batch = [first]
        deadline = time.monotonic() + self.max_wait
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                self._q.put(None)  # re-arm the sentinel for the outer loop
                break
            batch.append(nxt)
        return batch

    def _loop(self):
        inflight: tuple[list[_Pending], dict] | None = None
        while True:
            # idle queue: drain the in-flight batch NOW so its requesters
            # aren't held hostage to the next arrival
            if inflight is not None and self._q.empty():
                self._finish(*inflight)
                inflight = None
            batch = self._collect()
            if batch is None:
                if inflight is not None:
                    self._finish(*inflight)
                return
            try:
                out = self._dispatch(batch)
            except Exception as exc:  # engine failure -> fail the requests, keep serving
                for p in batch:
                    if not p.future.done():
                        p.future.set_exception(exc)
                continue
            # batch N is now on the device; reading back N-1 overlaps it
            if inflight is not None:
                self._finish(*inflight)
                inflight = None
            if self.pipeline:
                inflight = (batch, out)
            else:
                self._finish(batch, out)

    def _dispatch(self, batch: list[_Pending]) -> dict:
        n = len(batch)
        b = self._bucket_for(n)
        s = self.engine.image_size
        images = np.zeros((b, s, s, 3), np.float32)
        actions = np.zeros((b,), np.int64)
        z = np.zeros((b, self.engine.vae_dim), np.float32)
        for i, p in enumerate(batch):
            images[i] = p.image
            actions[i] = p.action
            z[i] = p.z
        out = self.engine.dispatch(images, actions, z)
        # count only successfully dispatched batches (a raising dispatch
        # must not skew mean_batch_rows / pad_fraction)
        with self._stats_lock:
            self.batches_total += 1
            self.rows_total += n
            self.padded_rows_total += b - n
        return out

    def _finish(self, batch: list[_Pending], device_out: dict):
        """Blocking readback of a dispatched batch -> complete its futures.
        A fetch failure fails exactly this batch's requests."""
        try:
            out = self.engine.fetch(device_out)
        except Exception as exc:  # noqa: BLE001 — surface to the requesters
            for p in batch:
                if not p.future.done():
                    p.future.set_exception(exc)
            return
        now = time.monotonic()
        with self._stats_lock:
            for p in batch:
                self._latencies_ms.append((now - p.enqueued_at) * 1000.0)
        for i, p in enumerate(batch):
            p.future.set_result({k: v[i] for k, v in out.items()})


# ---------------------------------------------------------------- HTTP


class _Handler(BaseHTTPRequestHandler):
    server_version = "kpvid-serve/1.0"
    # set by make_server():
    batcher: MicroBatcher = None
    engine: InferenceEngine = None
    frame_ops = None
    request_timeout_s: float = 60.0
    quiet: bool = True

    def log_message(self, fmt, *args):  # stdlib default spams stderr
        if not self.quiet:
            super().log_message(fmt, *args)

    # -------------------------------------------------------------- GET
    def do_GET(self):
        if self.path == "/healthz":
            self._send_json(200, {
                "status": "ok",
                "image_size": self.engine.image_size,
                "n_action": self.engine.n_action,
                "n_future_frames": self.engine.n_future_frames,
                "buckets": list(self.batcher.buckets),
            })
        elif self.path == "/stats":
            self._send_json(200, self.batcher.stats())
        else:
            self._send_json(404, {"error": f"no route {self.path}"})

    # ------------------------------------------------------------- POST
    def do_POST(self):
        if self.path != "/v1/generate":
            self._send_json(404, {"error": f"no route {self.path}"})
            return
        try:
            req = self._parse_request()
        except ValueError as exc:
            self._send_json(400, {"error": str(exc)})
            return
        try:
            fut = self.batcher.submit(req["image"], req["action"], req["z"])
        except queue.Full:
            self._send_json(503, {"error": "server overloaded, retry"})
            return
        try:
            out = fut.result(timeout=self.request_timeout_s)
        except Exception as exc:  # noqa: BLE001 — report engine errors as 500s
            self._send_json(500, {"error": f"{type(exc).__name__}: {exc}"})
            return
        self._send_output(out, req)

    def _parse_request(self) -> dict:
        length = int(self.headers.get("Content-Length", 0))
        if length <= 0:
            raise ValueError("empty body")
        try:
            body = json.loads(self.rfile.read(length))
        except json.JSONDecodeError as exc:
            raise ValueError(f"invalid JSON: {exc}") from exc
        if "image" not in body or "action" not in body:
            raise ValueError("body must have 'image' (base64) and 'action' (int)")
        action = int(body["action"])
        if not 0 <= action < self.engine.n_action:
            raise ValueError(f"action must be in [0, {self.engine.n_action})")
        fmt = body.get("format", "npz")
        if fmt not in ("npz", "gif"):
            raise ValueError("format must be 'npz' or 'gif'")
        from PIL import Image, UnidentifiedImageError

        try:
            raw = base64.b64decode(body["image"], validate=True)
            pil = Image.open(io.BytesIO(raw))
            pil.load()
        except (ValueError, UnidentifiedImageError, OSError) as exc:
            raise ValueError(f"could not decode image: {exc}") from exc
        seed = int(body.get("seed", time.time_ns() & 0x7FFFFFFF))
        return {
            "image": preprocess_image(pil, self.engine.image_size, self.frame_ops),
            "action": action,
            "z": request_z(seed, self.engine.vae_dim),
            "seed": seed,
            "format": fmt,
        }

    def _send_output(self, out: dict, req: dict):
        # the engine quantizes on device (uint8 on the wire); to_uint8 is
        # the fallback for f32 outputs from a bare FinalGenerator
        pred = out["pred_im_seq"]
        pred_u8 = pred if pred.dtype == np.uint8 else to_uint8(pred)
        mask = out["mask"]
        mask_u8 = mask if mask.dtype == np.uint8 else to_uint8(mask, rescale=False)
        if req["format"] == "gif":
            self._send_bytes(200, encode_gif(pred_u8), "image/gif",
                             extra={"X-Kpvid-Seed": str(req["seed"])})
            return
        buf = io.BytesIO()
        np.savez_compressed(
            buf,
            pred_im_seq=pred_u8,
            mask=mask_u8,
            current_points=out["current_points"].astype(np.float32),
            future_points=out["future_points"].astype(np.float32),
            seed=np.int64(req["seed"]),
        )
        self._send_bytes(200, buf.getvalue(), "application/x-npz",
                         extra={"X-Kpvid-Seed": str(req["seed"])})

    # ---------------------------------------------------------- plumbing
    def _send_json(self, code: int, payload: dict):
        self._send_bytes(code, json.dumps(payload).encode(), "application/json")

    def _send_bytes(self, code: int, data: bytes, ctype: str, extra: dict | None = None):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(data)))
        for k, v in (extra or {}).items():
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(data)


def make_server(
    engine: InferenceEngine,
    host: str = "127.0.0.1",
    port: int = 8000,
    buckets: tuple[int, ...] = DEFAULT_BUCKETS,
    max_wait_ms: float = 5.0,
    max_queue: int = 256,
    warmup: bool = False,
    quiet: bool = True,
    pipeline: bool = True,
) -> tuple[ThreadingHTTPServer, MicroBatcher]:
    """Wire a MicroBatcher + HTTP server around an engine. The caller owns
    serve_forever() (usually on a thread) and shutdown ordering:
    server.shutdown() then batcher.stop()."""
    batcher = MicroBatcher(engine, buckets=buckets, max_wait_ms=max_wait_ms,
                           max_queue=max_queue, pipeline=pipeline)
    if warmup:
        batcher.warmup()
    handler = type("BoundHandler", (_Handler,), {
        "batcher": batcher,
        "engine": engine,
        "frame_ops": augment.resolve_frame_ops("auto"),
        "quiet": quiet,
    })
    server = ThreadingHTTPServer((host, port), handler)
    return server, batcher
