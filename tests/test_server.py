"""Serving daemon tests: explicit-z generation, micro-batching semantics,
and the HTTP surface (kpvid_tpu/eval/server.py)."""

import base64
import io
import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kpvid_tpu.configs import Config, ModelConfig, TrainingConfig
from kpvid_tpu.eval import FinalGenerator, InferenceEngine, MicroBatcher, make_server
from kpvid_tpu.eval.server import preprocess_image, request_z, to_uint8


@pytest.fixture(scope="module")
def engine():
    cfg = Config(
        model=ModelConfig(
            n_pts=4, n_action=5, cell_info=(16, 16), vae_dim=8,
            image_size=32, heatmap_size=8, n_future_frames=6,
            encoder_filters=8, translator_filters=16,
            pose_decoder_filters=16, discriminator_filters=8,
        ),
        training=TrainingConfig(batch_size=2, compute_dtype="float32"),
    ).validate()
    gen = FinalGenerator(cfg)
    s1_vars, s2_vars = gen.init_variables(jax.random.PRNGKey(0))
    return InferenceEngine(cfg, s1_vars, s2_vars["params"])


def _images(rng, n, s=32):
    return rng.uniform(-1, 1, (n, s, s, 3)).astype(np.float32)


def test_explicit_z_matches_rng_draw(engine, rng):
    """generate(z=...) with the rng's own draw is identical to the rng
    path — the serving z-injection changes nothing but who draws."""
    gen = engine.final
    im = jnp.asarray(_images(rng, 2))
    act = jax.nn.one_hot(jnp.asarray([0, 3]), 5)
    key = jax.random.PRNGKey(11)
    a = gen.jitted_generate(engine.s1_vars, engine.s2_params, im, act, key)
    z = jax.random.normal(key, (2, gen.vae_dim), jnp.float32)
    b = gen.jitted_generate(engine.s1_vars, engine.s2_params, im, act, None, z=z)
    np.testing.assert_array_equal(
        np.asarray(a["pred_im_seq"]), np.asarray(b["pred_im_seq"])
    )
    np.testing.assert_array_equal(
        np.asarray(a["future_points"]), np.asarray(b["future_points"])
    )


def test_microbatcher_coalesces_and_matches_single(engine, rng):
    """Concurrent requests ride one padded bucket; each sample's output
    matches running it alone (per-request z => batching-invariant)."""
    images = _images(rng, 3)
    zs = [request_z(seed, engine.vae_dim) for seed in (1, 2, 3)]
    actions = [0, 2, 4]

    batcher = MicroBatcher(engine, buckets=(4,), max_wait_ms=400.0)
    try:
        futs = [batcher.submit(images[i], actions[i], zs[i]) for i in range(3)]
        outs = [f.result(timeout=120) for f in futs]
    finally:
        batcher.stop()
    st = batcher.stats()
    assert st["batches_total"] == 1  # coalesced within the linger window
    assert st["requests_total"] == 3
    assert st["pad_fraction"] == pytest.approx(0.25)

    for i in range(3):
        solo = engine.run(images[i : i + 1], np.asarray([actions[i]]), zs[i][None])
        # wire format is uint8 (quantized on device); a different bucket
        # shape can move f32 values by an ulp, so allow a +-1 flip on
        # exact quantization boundaries
        assert outs[i]["pred_im_seq"].dtype == np.uint8
        diff = np.abs(
            outs[i]["pred_im_seq"].astype(np.int16)
            - solo["pred_im_seq"][0].astype(np.int16)
        )
        assert diff.max() <= 1
        np.testing.assert_allclose(
            outs[i]["future_points"], solo["future_points"][0], atol=1e-5
        )


def test_seed_determinism_across_batches(engine, rng):
    """Same (image, action, seed) resubmitted later -> bit-identical video
    (same bucket shape + same z => same program on same inputs)."""
    image = _images(rng, 1)[0]
    z = request_z(7, engine.vae_dim)
    batcher = MicroBatcher(engine, buckets=(4,), max_wait_ms=1.0)
    try:
        a = batcher.submit(image, 1, z).result(timeout=120)
        b = batcher.submit(image, 1, z).result(timeout=120)
    finally:
        batcher.stop()
    np.testing.assert_array_equal(a["pred_im_seq"], b["pred_im_seq"])
    assert batcher.stats()["batches_total"] == 2


def test_preprocess_geometry(rng):
    """Non-square inputs come out [S,S,3] in [-1,1] via the eval crop."""
    from PIL import Image

    arr = (rng.uniform(0, 255, (96, 64, 3))).astype(np.uint8)
    out = preprocess_image(Image.fromarray(arr), 32)
    assert out.shape == (32, 32, 3)
    assert out.dtype == np.float32
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_http_end_to_end(engine, rng):
    from PIL import Image

    server, batcher = make_server(engine, port=0, buckets=(1, 4), max_wait_ms=1.0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"

    def post(body: dict):
        req = urllib.request.Request(
            f"{base}/v1/generate", json.dumps(body).encode(),
            {"Content-Type": "application/json"},
        )
        return urllib.request.urlopen(req, timeout=120)

    try:
        # healthz
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            h = json.loads(r.read())
        assert h["status"] == "ok" and h["image_size"] == 32

        png = io.BytesIO()
        Image.fromarray(rng.uniform(0, 255, (48, 40, 3)).astype(np.uint8)).save(
            png, format="PNG"
        )
        img_b64 = base64.b64encode(png.getvalue()).decode()

        # npz roundtrip + determinism via the seed field
        with post({"image": img_b64, "action": 2, "seed": 5}) as r:
            assert r.headers["Content-Type"] == "application/x-npz"
            first = dict(np.load(io.BytesIO(r.read())))
        assert first["pred_im_seq"].shape == (6, 32, 32, 3)
        assert first["pred_im_seq"].dtype == np.uint8
        assert first["mask"].shape == (6, 32, 32, 1)
        assert first["future_points"].shape == (6, 4, 2)
        assert int(first["seed"]) == 5
        with post({"image": img_b64, "action": 2, "seed": 5}) as r:
            again = dict(np.load(io.BytesIO(r.read())))
        np.testing.assert_array_equal(first["pred_im_seq"], again["pred_im_seq"])

        # gif format
        with post({"image": img_b64, "action": 0, "seed": 1, "format": "gif"}) as r:
            gif = r.read()
        assert gif[:6] in (b"GIF87a", b"GIF89a")
        frames = Image.open(io.BytesIO(gif))
        assert frames.size == (32, 32)
        # PIL's GIF writer merges identical consecutive frames (an
        # untrained net can emit near-constant video), extending their
        # duration — so count playback time, not frames
        total_ms = 0
        for i in range(frames.n_frames):
            frames.seek(i)
            total_ms += frames.info["duration"]
        assert total_ms == 6 * 125  # 6 frames at 8 fps

        # input validation
        for bad in (
            {"image": img_b64},  # missing action
            {"image": img_b64, "action": 99},  # out of range
            {"image": "!!notb64!!", "action": 0},  # undecodable
            {"image": img_b64, "action": 0, "format": "mp4"},  # bad format
        ):
            with pytest.raises(urllib.error.HTTPError) as e:
                post(bad)
            assert e.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"{base}/nope", timeout=30)
        assert e.value.code == 404

        # stats reflect the traffic
        with urllib.request.urlopen(f"{base}/stats", timeout=30) as r:
            st = json.loads(r.read())
        assert st["requests_total"] == 3
        assert st["batches_total"] >= 1
        assert st["latency_ms_p50"] > 0
    finally:
        server.shutdown()
        batcher.stop()


def test_to_uint8_matches_png_writer_rounding():
    x = np.asarray([-1.0, -0.5, 0.0, 0.999, 1.0, 1.5])
    np.testing.assert_array_equal(
        to_uint8(x), (np.clip(0.5 * (x + 1), 0, 1) * 255).astype(np.uint8)
    )


def test_device_quantize_matches_host(rng):
    """The on-device uint8 epilogue is byte-identical to the host
    to_uint8 (same f32 math, truncating cast), including razor-edge
    inputs that land exactly on quantization boundaries."""
    from kpvid_tpu.eval.server import device_quantize

    edges = np.float32(np.arange(256))[None] / 255.0  # exact k/255 grid
    eps = np.float32([0.0, 1e-7, -1e-7, 1e-4, -1e-4])[:, None]
    grid01 = np.clip(edges + eps, 0.0, 1.0).astype(np.float32)
    rand = rng.uniform(-1.2, 1.2, (4, 257)).astype(np.float32)
    for x, rescale in ((grid01 * 2 - 1, True), (rand, True), (grid01, False)):
        np.testing.assert_array_equal(
            np.asarray(device_quantize(jnp.asarray(x), rescale=rescale)),
            to_uint8(x, rescale=rescale),
        )


def test_pipeline_matches_unpipelined(engine, rng):
    """Depth-1 dispatch pipelining (overlap batch N compute with N-1
    readback) reorders host waits only: a back-to-back request stream
    produces bit-identical outputs with pipeline on and off, and every
    future completes without needing further traffic (idle drain)."""
    n = 6
    images = _images(rng, n)
    zs = [request_z(100 + i, engine.vae_dim) for i in range(n)]
    actions = [i % 5 for i in range(n)]

    results = {}
    for pipelined in (False, True):
        batcher = MicroBatcher(
            engine, buckets=(2,), max_wait_ms=0.0, pipeline=pipelined
        )
        try:
            futs = [batcher.submit(images[i], actions[i], zs[i]) for i in range(n)]
            results[pipelined] = [f.result(timeout=120) for f in futs]
        finally:
            batcher.stop()
        assert batcher.stats()["batches_total"] >= 2  # several dispatches

    for a, b in zip(results[False], results[True]):
        np.testing.assert_array_equal(a["pred_im_seq"], b["pred_im_seq"])
        np.testing.assert_array_equal(a["mask"], b["mask"])
        np.testing.assert_array_equal(a["future_points"], b["future_points"])


def test_pipeline_idle_drain_is_prompt(engine, rng):
    """With pipelining on, a single request is drained as soon as the
    queue goes idle — it never waits for a successor batch."""
    image = _images(rng, 1)[0]
    z = request_z(3, engine.vae_dim)
    batcher = MicroBatcher(engine, buckets=(1,), max_wait_ms=0.0, pipeline=True)
    try:
        batcher.warmup()  # compile outside the timed window
        t0 = time.monotonic()
        out = batcher.submit(image, 0, z).result(timeout=30)
        dt = time.monotonic() - t0
    finally:
        batcher.stop()
    assert out["pred_im_seq"].dtype == np.uint8
    assert dt < 20.0  # completes on its own, no successor traffic needed


def test_overload_rejects(engine, rng):
    """Queue bound -> queue.Full for callers (HTTP maps it to 503)."""
    import queue as _q

    image = _images(rng, 1)[0]
    z = request_z(0, engine.vae_dim)
    batcher = MicroBatcher(engine, buckets=(1,), max_wait_ms=0.0, max_queue=2)
    try:
        # stall the dispatcher by flooding faster than it can drain; with
        # maxsize=2 the fourth-or-so submit must raise
        with pytest.raises(_q.Full):
            for _ in range(64):
                batcher.submit(image, 0, z)
    finally:
        batcher.stop()
    assert batcher.stats()["rejected_total"] >= 1


def test_mesh_engine_matches_single_device(engine, rng):
    """Multi-chip serving (InferenceEngine(mesh=...)): buckets round up to
    the data-axis size, and each request's output matches the single-device
    engine — batch-parallel sharding is exact (the same layout proven in
    test_parallel.py::test_serving_generate_dp), so batching-invariant
    determinism carries over."""
    from kpvid_tpu.parallel import make_mesh

    mesh = make_mesh(n_model=1)  # 8 virtual CPU devices (conftest)
    mesh_engine = InferenceEngine(
        engine.config, engine.s1_vars, engine.s2_params, mesh=mesh
    )
    assert mesh_engine.n_data == 8

    batcher = MicroBatcher(mesh_engine, buckets=(2, 4), max_wait_ms=400.0)
    try:
        # bucket alignment: every bucket is a multiple of the mesh size
        assert batcher.buckets == (8,)
        images = _images(rng, 3)
        zs = [request_z(seed, engine.vae_dim) for seed in (1, 2, 3)]
        actions = [0, 2, 4]
        futs = [batcher.submit(images[i], actions[i], zs[i]) for i in range(3)]
        outs = [f.result(timeout=300) for f in futs]
    finally:
        batcher.stop()
    assert batcher.stats()["batches_total"] == 1

    for i in range(3):
        solo = engine.run(images[i : i + 1], np.asarray([actions[i]]), zs[i][None])
        diff = np.abs(
            outs[i]["pred_im_seq"].astype(np.int16)
            - solo["pred_im_seq"][0].astype(np.int16)
        )
        assert diff.max() <= 1  # +-1 ulp quantization flips only
        np.testing.assert_allclose(
            outs[i]["future_points"], solo["future_points"][0], atol=1e-5
        )


def test_artifact_engine_matches_inference_engine(engine, rng, tmp_path):
    """ArtifactEngine (the daemon running from a serialized one-file
    artifact, eval/export.py) agrees with the live InferenceEngine on the
    same weights: quantized image outputs within one uint8 step (float
    reassociation at quantization boundaries — the artifact's weights are
    compile-time constants), keypoints to 1e-5."""
    from kpvid_tpu.eval import ArtifactEngine
    from kpvid_tpu.eval.export import export_serving, load_serving

    path = tmp_path / "art.npz"
    export_serving(
        engine.final, engine.s1_vars, engine.s2_params, path,
        batch_sizes=(2,), platforms=("cpu",),
    )
    art_engine = ArtifactEngine(load_serving(path))
    assert art_engine.buckets == (2,)
    assert art_engine.image_size == 32 and art_engine.n_action == 5
    assert art_engine.n_future_frames == 6

    images = _images(rng, 2)
    actions = np.asarray([1, 4])
    z = np.stack([request_z(s, engine.vae_dim) for s in (7, 8)])
    a = engine.run(images, actions, z)
    b = art_engine.run(images, actions, z)
    assert set(a) == set(b)
    for k in ("pred_im_seq", "mask"):
        assert b[k].dtype == np.uint8, k
        diff = np.abs(a[k].astype(np.int16) - b[k].astype(np.int16))
        assert diff.max() <= 1, (k, diff.max())
    for k in ("current_points", "future_points"):
        np.testing.assert_allclose(a[k], b[k], rtol=1e-5, atol=1e-6, err_msg=k)

    with pytest.raises(ValueError, match="batch size 3"):
        art_engine.dispatch(
            _images(rng, 3), np.zeros(3, np.int64), np.zeros((3, 8), np.float32)
        )


def test_http_serves_from_artifact(engine, rng, tmp_path):
    """The HTTP daemon runs end-to-end from an artifact: healthz reports
    the artifact's meta; a generate roundtrip returns the npz contract."""
    from PIL import Image

    from kpvid_tpu.eval import ArtifactEngine
    from kpvid_tpu.eval.export import export_serving, load_serving

    path = tmp_path / "art.npz"
    export_serving(
        engine.final, engine.s1_vars, engine.s2_params, path,
        batch_sizes=(1,), platforms=("cpu",),
    )
    art_engine = ArtifactEngine(load_serving(path))
    server, batcher = make_server(
        art_engine, port=0, buckets=art_engine.buckets, max_wait_ms=1.0
    )
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            h = json.loads(r.read())
        assert h["status"] == "ok" and h["image_size"] == 32
        assert h["n_future_frames"] == 6 and h["buckets"] == [1]

        png = io.BytesIO()
        Image.fromarray(rng.uniform(0, 255, (48, 40, 3)).astype(np.uint8)).save(
            png, format="PNG"
        )
        body = {"image": base64.b64encode(png.getvalue()).decode(),
                "action": 2, "seed": 5}
        req = urllib.request.Request(
            f"{base}/v1/generate", json.dumps(body).encode(),
            {"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out = dict(np.load(io.BytesIO(r.read())))
        assert out["pred_im_seq"].shape == (6, 32, 32, 3)
        assert out["pred_im_seq"].dtype == np.uint8
        assert out["mask"].shape == (6, 32, 32, 1)
    finally:
        server.shutdown()
        batcher.stop()
