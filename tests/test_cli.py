"""End-to-end CLI tests (train -> label -> train -> evaluate).

Always-on miniatures cover each CLI individually; the chained
train->label->train->evaluate workflow (test_full_chain) and the
multi-process byte-identity batteries live in the slow tier
(`pytest tests/ -m slow`). Narrow network widths keep even the full
chain to minutes warm on a 1-core host."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

from mp_launch import run_coordinated

REPO = Path(__file__).resolve().parent.parent


def run(args, n_devices: int | None = None):
    # KPVID_PLATFORM (not JAX_PLATFORMS): the image's sitecustomize
    # overrides the env var via jax.config; the CLIs honor this one.
    # Drop conftest's 8-virtual-device XLA_FLAGS: these miniatures run
    # single-device (the auto-mesh would otherwise demand batch % 8 == 0);
    # mesh-mode CLI runs are covered by the parallel equivalence tests +
    # the multichip dryrun. n_devices: opt back in to a virtual multi-
    # device CPU for --mesh CLI runs.
    env = dict(os.environ, JAX_PLATFORMS="cpu", KPVID_PLATFORM="cpu",
               KPVID_SYNTH_VGG_WIDTH="16")
    env.pop("XLA_FLAGS", None)
    if n_devices:
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    proc = subprocess.run(
        [sys.executable] + args, cwd=REPO, env=env,
        capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, f"{args}\n--- stdout:\n{proc.stdout}\n--- stderr:\n{proc.stderr}"
    return proc


@pytest.fixture(scope="module")
def mini_env(tmp_path_factory):
    """Shared miniature environment for the always-on CLI tests: a tiny
    config + a 2-step stage-1 run through the REAL train.py (config load,
    synthetic data, pipeline, jitted step, test sweep, checkpoint, logs).
    Shapes match smoke.yaml so the persistent XLA cache keeps this fast;
    the bigger 4-CLI chain below stays opt-in."""
    root = tmp_path_factory.mktemp("cli_mini")
    cfg = root / "cfg.yaml"
    cfg.write_text(f"""
paths:
  data_dir: '{root}/penn'
  vggnet: '{root}/vgg19.npy'
  log_dir: '{root}/results'
training:
  n_steps: 2
  summary_interval: 100
  test_interval: 1
  checkpoint_interval: 100
  log_interval: 1
  batch_size: 4
  compute_dtype: 'float32'
model:
  n_pts: 8
  n_action: 9
  cell_info: [64, 64]
  vae_dim: 16
  image_size: 32
  heatmap_size: 8
  encoder_filters: 8
  translator_filters: 16
  pose_decoder_filters: 16
  discriminator_filters: 8
data:
  num_workers: 2
  labeler_chunk: 32
  eval_batch_size: 2
""")
    run(["train.py", "--mode", "detector_translator", "--config", str(cfg),
         "--synthetic", "--max-steps", "2", "--no-images"])
    return root


def test_train_cli_miniature(mini_env):
    ckpts = list((mini_env / "results" / "detector_translator").glob("ckpt-*"))
    assert ckpts, "final checkpoint not written"
    metrics = list((mini_env / "results").glob("**/*.jsonl"))
    assert metrics, "metric logs not written"


@pytest.fixture(scope="module")
def mini_labels(mini_env):
    """Run the REAL make_pseudo_labels.py on the miniature stage-1 ckpt."""
    run(["make_pseudo_labels.py", "--config", str(mini_env / "cfg.yaml"),
         "--checkpoint", f"{mini_env}/results/detector_translator",
         "--synthetic"])
    return mini_env / "penn" / "pseudo_labels"


def test_labeler_cli_miniature(mini_labels):
    """Always-on labeler smoke: CLI arg plumbing + output .npy layout
    (reference make_pseudo_labels.py contract: one [T, K, 2] float array
    per video, same stem as the video dir)."""
    import numpy as np

    labels = sorted(mini_labels.glob("*.npy"))
    assert len(labels) == 6, labels  # 4 train + 2 test synthetic videos
    arr = np.load(labels[0])
    assert arr.ndim == 3 and arr.shape[1:] == (8, 2), arr.shape
    assert np.abs(arr).max() <= 1.0 + 1e-6


@pytest.fixture(scope="module")
def mini_stage2(mini_env, mini_labels):
    """Run a 2-step stage-2 train through the REAL train.py."""
    run(["train.py", "--mode", "motion_generator", "--config",
         str(mini_env / "cfg.yaml"), "--max-steps", "2", "--no-images"])
    return mini_env / "results" / "motion_generator"


def test_stage2_train_cli_miniature(mini_stage2):
    assert list(mini_stage2.glob("ckpt-*")), "stage-2 checkpoint not written"
    assert list(mini_stage2.glob("*.jsonl")), "stage-2 metric logs not written"


@pytest.mark.slow
def test_train_dp_bf16_cli(mini_env, mini_labels, tmp_path):
    """training.dp_grad_dtype='bfloat16' through the REAL train.py on a
    4-device CPU mesh: config load -> auto mesh -> the shard_map DP step
    with the bf16 gradient all-reduce (parallel/dp_step.py) -> checkpoint.
    Semantics equivalence is pinned in test_dp_step.py; this drives the
    CLI wiring end-to-end."""
    cfg = tmp_path / "cfg.yaml"
    base = (mini_env / "cfg.yaml").read_text()
    assert f"log_dir: '{mini_env}/results'" in base
    cfg.write_text(
        base.replace(f"log_dir: '{mini_env}/results'", f"log_dir: '{tmp_path}/results'")
        .replace("compute_dtype: 'float32'",
                 "compute_dtype: 'float32'\n  dp_grad_dtype: 'bfloat16'")
    )
    run(["train.py", "--mode", "motion_generator", "--config", str(cfg),
         "--max-steps", "2", "--no-images"], n_devices=4)
    out = tmp_path / "results" / "motion_generator"
    assert list(out.glob("ckpt-*")), "dp-bf16 stage-2 checkpoint not written"


@pytest.mark.slow
def test_train_dp_accum_cli(mini_env, mini_labels, tmp_path):
    """dp_grad_dtype + grad_accum COMPOSED through the REAL train.py on a
    4-device CPU mesh (batch 8 -> 2 rows/shard -> 2 micros of 1): each
    shard accumulates locally, grads cross the mesh once per update
    (numerics pinned in test_dp_step::test_grad_accum_composes)."""
    cfg = tmp_path / "cfg.yaml"
    base = (mini_env / "cfg.yaml").read_text()
    assert "batch_size: 4" in base
    cfg.write_text(
        base.replace(f"log_dir: '{mini_env}/results'", f"log_dir: '{tmp_path}/results'")
        .replace("batch_size: 4", "batch_size: 8")
        .replace("compute_dtype: 'float32'",
                 "compute_dtype: 'float32'\n  dp_grad_dtype: 'bfloat16'"
                 "\n  grad_accum: 2")
    )
    run(["train.py", "--mode", "motion_generator", "--config", str(cfg),
         "--max-steps", "2", "--no-images"], n_devices=4)
    out = tmp_path / "results" / "motion_generator"
    assert list(out.glob("ckpt-*")), "dp-accum stage-2 checkpoint not written"


@pytest.mark.slow
def test_labeler_two_process_matches_single(mini_env, mini_labels):
    """Multi-host pseudo-labeling: two coordinated processes (strided
    video shards, shared output dir, coordination barriers, no
    collectives) produce byte-identical labels to the single-process run."""
    import shutil

    import numpy as np

    want = {p.name: np.load(p) for p in sorted(mini_labels.glob("*.npy"))}
    assert want

    # separate data tree so the shared fixture's labels stay intact
    penn2 = mini_env / "penn2"
    if not penn2.exists():
        shutil.copytree(mini_env / "penn", penn2, ignore=shutil.ignore_patterns("pseudo_labels"))
    cfg2 = mini_env / "cfg2.yaml"
    cfg2.write_text(
        (mini_env / "cfg.yaml").read_text().replace(f"{mini_env}/penn", str(penn2))
    )

    run_coordinated(
        ["make_pseudo_labels.py", "--config", str(cfg2),
         "--checkpoint", f"{mini_env}/results/detector_translator"],
        [mini_env / f"labeler_p{pid}.log" for pid in range(2)],
    )

    got = {p.name: np.load(p) for p in sorted((penn2 / "pseudo_labels").glob("*.npy"))}
    assert set(got) == set(want)
    for name in want:
        np.testing.assert_array_equal(got[name], want[name], err_msg=name)


@pytest.mark.slow
def test_train_two_process_cli(mini_env):
    """Multi-host training through the REAL train.py CLI: 2 coordinated
    processes (1 CPU device each -> the 2-device 'data' mesh), per-host
    local batches + global assembly, synced AOT compiles
    (parallel.synced_compile), the multi-process test sweep, and the
    collective checkpoint save. Numerics equivalence of the underlying
    trainers is proven in tests/test_multiprocess.py; this covers
    train.py's own multi-host wiring end to end."""
    import shutil

    penn3 = mini_env / "penn3"
    if not penn3.exists():
        shutil.copytree(mini_env / "penn", penn3,
                        ignore=shutil.ignore_patterns("pseudo_labels"))
    cfg3 = mini_env / "cfg3.yaml"
    cfg3.write_text(
        (mini_env / "cfg.yaml").read_text()
        .replace(f"{mini_env}/penn", str(penn3))
        .replace(f"{mini_env}/results", f"{mini_env}/results_mp")
    )
    run_coordinated(
        ["train.py", "--mode", "detector_translator", "--config", str(cfg3),
         "--max-steps", "2", "--no-images"],
        [mini_env / f"train_p{pid}.log" for pid in range(2)],
    )
    ckpt = mini_env / "results_mp" / "detector_translator" / "ckpt-2"
    assert ckpt.is_dir(), "primary did not write the final checkpoint"
    metrics = list((mini_env / "results_mp").glob("**/*.jsonl"))
    assert metrics, "primary did not write metric logs"


def test_evaluate_cli_miniature(mini_env, mini_stage2):
    """Always-on evaluate smoke: CLI arg plumbing + the reference's
    per-sample PNG tree (evaluate.py:100-131)."""
    run(["evaluate.py", "--config", str(mini_env / "cfg.yaml"),
         "--checkpoint_stage1", f"{mini_env}/results/detector_translator",
         "--checkpoint_stage2", f"{mini_env}/results/motion_generator",
         "--save_dir", f"{mini_env}/eval", "--batch_size", "2"])
    sample = mini_env / "eval" / "0000"
    assert (sample / "input_im.png").exists()
    assert (sample / "current_points.png").exists()
    for sub in ("real_seq", "pred_seq", "mask", "crude", "pred_points"):
        assert len(list((sample / sub).glob("*.png"))) == 32, sub


def test_export_serving_cli_miniature(mini_env, mini_stage2):
    """tools/export_serving.py on the miniature checkpoints: the one-file
    StableHLO artifact (weights baked in, 'cpu'+'tpu' lowerings — no TPU
    needed to export) loads WITHOUT model code or config and generates at
    an exported batch bucket."""
    import json

    import numpy as np

    out = mini_env / "serving_artifact.npz"
    proc = run(
        ["tools/export_serving.py", "--config", str(mini_env / "cfg.yaml"),
         "--checkpoint_stage1", f"{mini_env}/results/detector_translator",
         "--checkpoint_stage2", f"{mini_env}/results/motion_generator",
         "--out", str(out), "--batch-sizes", "1", "--platforms", "cpu,tpu"]
    )
    line = json.loads(proc.stdout.strip().splitlines()[-1])
    assert line["batch_sizes"] == [1], line
    assert line["platforms"] == ["cpu", "tpu"], line
    assert "pred_im_seq" in line["outputs"], line

    from kpvid_tpu.eval.export import load_serving

    art = load_serving(out)
    gen_rng = np.random.default_rng(0)
    vid = art.generate(
        gen_rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32),
        np.eye(9, dtype=np.float32)[:1],
        gen_rng.normal(size=(1, 16)).astype(np.float32),
    )
    pred = np.asarray(vid["pred_im_seq"])
    assert pred.shape == (1, 32, 32, 32, 3), pred.shape  # T=32 future frames
    assert np.all(np.abs(pred) <= 1.0)


@pytest.mark.slow
def test_evaluate_png_workers_identical(mini_env, mini_stage2):
    """The threaded PNG writer (--png-workers) produces a byte-identical
    tree to the serial one."""
    eval_args = ["evaluate.py", "--config", str(mini_env / "cfg.yaml"),
                 "--checkpoint_stage1", f"{mini_env}/results/detector_translator",
                 "--checkpoint_stage2", f"{mini_env}/results/motion_generator",
                 "--batch_size", "2", "--gif"]
    run(eval_args + ["--save_dir", f"{mini_env}/evalP1", "--png-workers", "1"])
    run(eval_args + ["--save_dir", f"{mini_env}/evalP4", "--png-workers", "4"])
    want = sorted(p.relative_to(mini_env / "evalP1")
                  for p in (mini_env / "evalP1").rglob("*.*"))
    got = sorted(p.relative_to(mini_env / "evalP4")
                 for p in (mini_env / "evalP4").rglob("*.*"))
    assert want and got == want
    for rel in want:
        assert (mini_env / "evalP4" / rel).read_bytes() == \
            (mini_env / "evalP1" / rel).read_bytes(), rel


@pytest.mark.slow
def test_evaluate_two_process_matches_single(mini_env, mini_stage2):
    """Multi-host evaluate: two coordinated processes (batch-aligned test
    shards, per-batch fold_in z keys, shared save_dir) write a PNG tree
    byte-identical to the single-process run. batch_size=1 gives the 2-video
    synthetic test set one batch per process."""
    eval_args = ["evaluate.py", "--config", str(mini_env / "cfg.yaml"),
                 "--checkpoint_stage1", f"{mini_env}/results/detector_translator",
                 "--checkpoint_stage2", f"{mini_env}/results/motion_generator",
                 "--batch_size", "1"]
    run(eval_args + ["--save_dir", f"{mini_env}/evalS"])
    run_coordinated(
        eval_args + ["--save_dir", f"{mini_env}/evalM"],
        [mini_env / f"eval_p{pid}.log" for pid in range(2)],
    )

    want = sorted(p.relative_to(mini_env / "evalS")
                  for p in (mini_env / "evalS").rglob("*.png"))
    got = sorted(p.relative_to(mini_env / "evalM")
                 for p in (mini_env / "evalM").rglob("*.png"))
    assert want and got == want
    for rel in want:
        assert (mini_env / "evalM" / rel).read_bytes() == \
            (mini_env / "evalS" / rel).read_bytes(), rel


def test_serve_cli_miniature(mini_env, mini_stage2):
    """Always-on serving-daemon smoke: serve.py restores the miniature
    two-checkpoint composition, warms its bucket, binds, answers
    /healthz and /v1/generate, and exits 0 on SIGTERM."""
    import base64
    import io
    import json
    import socket
    import time
    import urllib.request

    import numpy as np
    from PIL import Image

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ, JAX_PLATFORMS="cpu", KPVID_PLATFORM="cpu",
               KPVID_SYNTH_VGG_WIDTH="16")
    env.pop("XLA_FLAGS", None)
    proc = subprocess.Popen(
        [sys.executable, "serve.py", "--config", str(mini_env / "cfg.yaml"),
         "--checkpoint_stage1", f"{mini_env}/results/detector_translator",
         "--checkpoint_stage2", f"{mini_env}/results/motion_generator",
         "--port", str(port), "--buckets", "1", "--max_wait_ms", "1"],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True,
    )
    base = f"http://127.0.0.1:{port}"
    try:
        deadline = time.time() + 600
        while True:  # restore + warmup happen before the port binds
            try:
                with urllib.request.urlopen(f"{base}/healthz", timeout=5) as r:
                    health = json.loads(r.read())
                break
            except OSError:
                assert proc.poll() is None, f"serve.py died:\n{proc.stdout.read()}"
                assert time.time() < deadline, "serve.py did not come up"
                time.sleep(0.5)
        assert health["status"] == "ok" and health["image_size"] == 32

        png = io.BytesIO()
        Image.fromarray(
            (np.arange(48 * 40 * 3, dtype=np.uint32) % 255).astype(np.uint8)
            .reshape(48, 40, 3)
        ).save(png, format="PNG")
        body = json.dumps({
            "image": base64.b64encode(png.getvalue()).decode(),
            "action": 1, "seed": 3,
        }).encode()
        req = urllib.request.Request(
            f"{base}/v1/generate", body, {"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            out = dict(np.load(io.BytesIO(r.read())))
        assert out["pred_im_seq"].shape == (32, 32, 32, 3)
        assert out["future_points"].shape == (32, 8, 2)
    finally:
        proc.terminate()
        assert proc.wait(timeout=60) == 0, proc.stdout.read()


@pytest.mark.slow
def test_full_chain(tmp_path):
    """The reference README workflow as ONE chained subprocess run:
    train stage-1 -> make_pseudo_labels -> train stage-2 -> evaluate
    (+ a mesh-mode evaluate that must match single-device). Reference:
    /root/reference/README.md training/evaluation instructions."""
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(f"""
paths:
  data_dir: '{tmp_path}/penn'
  vggnet: '{tmp_path}/vgg19.npy'
  log_dir: '{tmp_path}/results'
training:
  n_steps: 4
  summary_interval: 2
  test_interval: 4
  checkpoint_interval: 4
  log_interval: 1
  batch_size: 2
  compute_dtype: 'float32'
model:
  n_pts: 8
  n_action: 9
  cell_info: [64, 64]
  vae_dim: 16
  image_size: 32
  heatmap_size: 8
  encoder_filters: 8
  translator_filters: 16
  pose_decoder_filters: 16
  discriminator_filters: 8
data:
  num_workers: 2
  labeler_chunk: 32
  eval_batch_size: 2
""")
    c = str(cfg)
    run(["train.py", "--mode", "detector_translator", "--config", c,
         "--synthetic", "--max-steps", "3"])
    assert (tmp_path / "results/detector_translator/ckpt-3").is_dir()
    run(["make_pseudo_labels.py", "--config", c,
         "--checkpoint", f"{tmp_path}/results/detector_translator", "--synthetic"])
    labels = list((tmp_path / "penn/pseudo_labels").glob("*.npy"))
    assert len(labels) == 6  # 4 train + 2 test synthetic videos
    run(["train.py", "--mode", "motion_generator", "--config", c,
         "--synthetic", "--max-steps", "3"])
    run(["evaluate.py", "--config", c, "--synthetic",
         "--checkpoint_stage1", f"{tmp_path}/results/detector_translator",
         "--checkpoint_stage2", f"{tmp_path}/results/motion_generator",
         "--save_dir", f"{tmp_path}/eval", "--batch_size", "2", "--gif"])
    sample = tmp_path / "eval/0000"
    assert (sample / "input_im.png").exists()
    assert (sample / "pred.gif").exists()
    assert len(list((sample / "pred_seq").glob("*.png"))) == 32

    # multi-chip serving from the CLI: batch 2 sharded over a 2-device
    # 'data' mesh must reproduce the single-device predictions (DP forward
    # has no cross-device reductions; only uint8 quantization noise allowed)
    run(["evaluate.py", "--config", c, "--synthetic",
         "--checkpoint_stage1", f"{tmp_path}/results/detector_translator",
         "--checkpoint_stage2", f"{tmp_path}/results/motion_generator",
         "--save_dir", f"{tmp_path}/eval_mesh", "--batch_size", "2",
         "--mesh"], n_devices=2)
    from PIL import Image

    import numpy as np

    for name in ("0000/pred_seq/000000.png", "0001/pred_seq/000031.png"):
        a = np.asarray(Image.open(tmp_path / "eval" / name), np.int16)
        b = np.asarray(Image.open(tmp_path / "eval_mesh" / name), np.int16)
        assert np.abs(a - b).max() <= 1, name
