"""Multi-host (multi-process) execution tests.

The heavyweight test launches 2 coordinated CPU processes (2 local devices
each) against a localhost jax.distributed coordinator and asserts the REAL
stage-1/stage-2 train steps — with the REAL per-host data pipeline and
make_array_from_process_local_data batch assembly — match a single-process
4-device run (same global mesh, same data). SURVEY §5.8; the reference is
strictly single-process (reference train.py:25-29).

Cheap construction-level tests cover the per-host batch assembly math
without subprocesses.
"""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute 2-process runs; `pytest -m slow`

from mp_launch import run_coordinated

REPO = Path(__file__).resolve().parent.parent
WORKER = REPO / "tests" / "mp_worker.py"


def _run_single(out: Path, ckpt: Path):
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env.update(JAX_PLATFORMS="cpu", KPVID_PLATFORM="cpu",
               MP_WORKER_LOCAL_DEVICES="2")
    proc = subprocess.run(
        [sys.executable, str(WORKER), str(out), str(ckpt)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, f"single-proc worker:\n{proc.stdout}\n{proc.stderr}"


def _run_two_proc(out: Path, ckpt: Path):
    run_coordinated(
        [WORKER, out, ckpt],
        [out.parent / f"mp_worker_p{pid}.log" for pid in range(2)],
        env_extra={"MP_WORKER_LOCAL_DEVICES": "1"},
    )


def test_two_process_dp_matches_single_process(tmp_path):
    """End-to-end: 2 coordinated processes (1 device each) produce — up to
    cross-process reduction order — the same post-Adam params, first-step
    metrics, and checkpoint as a single process over the identical 2-device
    'data' mesh. Local batch 1 makes the assembled global batches
    IDENTICAL in order, so even stage-2's noise-sample pairing matches
    (see tests/mp_worker.py)."""
    ref_out, ref_ckpt = tmp_path / "ref.npz", tmp_path / "ref_ckpt"
    mp_out, mp_ckpt = tmp_path / "mp.npz", tmp_path / "mp_ckpt"
    _run_single(ref_out, ref_ckpt)
    _run_two_proc(mp_out, mp_ckpt)

    ref = np.load(ref_out)
    got = np.load(mp_out)
    assert set(ref.files) == set(got.files)

    # lr for the post-Adam bound (see test_parallel): one Adam step moves a
    # sign-ambiguous (near-zero-grad) element by up to ~2*lr; after 2 steps
    # allow 2x that. A real bug (missing psum / wrong assembly) blows the
    # MEAN bound by orders of magnitude.
    from kpvid_tpu.configs import TrainingConfig

    lr = TrainingConfig().lr.start_val
    for prefix in ("s1_g/", "s1_d/", "s2_g/", "s2_d/", "s2dp_g/", "s2dp_d/"):
        keys = [k for k in ref.files if k.startswith(prefix)]
        assert keys, prefix
        total, count = 0.0, 0
        for k in keys:
            d = np.abs(ref[k] - got[k])
            assert d.max() <= 4.2 * lr, f"{k}: {d.max()}"
            total += float(d.sum())
            count += d.size
        assert total / count < 0.1 * lr, f"{prefix} mean diff {total / count}"
    # BN stats: plain batch means/vars, permutation-invariant -> tight
    for k in (k for k in ref.files if k.startswith("s1_bs/")):
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-4, atol=1e-6, err_msg=k)
    # first-step metrics: computed from identical pre-update state on the
    # same global batch (as a set) -> tight
    for k in (k for k in ref.files if "_m0_" in k):
        np.testing.assert_allclose(
            float(got[k]), float(ref[k]), rtol=5e-3, atol=1e-5, err_msg=k
        )
    # the multi-process checkpoint was written once, by the primary
    assert (mp_ckpt / "detector_translator" / "ckpt-2").is_dir()
    # the shard_map dp step's noise stream is byte-identical to the jit
    # step's (global draw, per-shard slice), so its first-step FORWARD
    # metrics equal the jit stage-2 ones within each run — in both the
    # single-process and cross-host executions (parallel/dp_step.py)
    for f in (ref, got):
        for k in (k for k in f.files if k.startswith("s2_m0_")):
            np.testing.assert_allclose(
                float(f[k.replace("s2_m0_", "s2dp_m0_")]), float(f[k]),
                rtol=5e-4, atol=1e-6, err_msg=k,
            )


def test_tp_sharded_checkpoint_allgather_branch(tmp_path):
    """_device_to_host_packed's non-fully-addressable branch
    (utils/checkpoint.py:53-62): a 2-process 1x2 'model' mesh TP-shards a
    leaf ACROSS hosts; the collective save all-gathers it, the primary
    writes, every process joins the Orbax restore and gets the exact
    bytes back (asserted inside tests/mp_ckpt_worker.py). SURVEY §5.4."""
    run_coordinated(
        [REPO / "tests" / "mp_ckpt_worker.py", tmp_path / "ckpt"],
        [tmp_path / f"ckpt_p{pid}.log" for pid in range(2)],
        env_extra={"MP_WORKER_LOCAL_DEVICES": "1"},
    )
    # the written checkpoint holds the full (gathered) arrays — readable
    # by a plain single-process restore (values = mp_ckpt_worker's
    # reference_state, duplicated here: importing the worker would mutate
    # this process's env)
    from kpvid_tpu.utils.checkpoint import latest_checkpoint, restore_checkpoint

    restored = restore_checkpoint(latest_checkpoint(tmp_path / "ckpt" / "tp"))
    np.testing.assert_array_equal(
        np.asarray(restored["wide"]),
        np.arange(8 * 16, dtype=np.float32).reshape(8, 16) / 7.0,
    )
    np.testing.assert_array_equal(
        np.asarray(restored["narrow"]), np.arange(4, dtype=np.float32)
    )
    assert int(restored["step"]) == 5


class TestLocalBatchAssembly:
    """Construction-level checks of the per-host batch math (no
    subprocesses)."""

    def test_shards_partition_the_global_stream(self):
        """Two hosts' local batches, interleaved, are a fixed permutation
        of the single-host global batch — per step, not just per epoch."""
        from kpvid_tpu.data.base import HostDataPipeline

        class Ds:
            def __len__(self):
                return 12

            def sample(self, idx, rng):
                return {"x": np.full((2,), idx, np.float32)}

        global_bs = 4
        single = HostDataPipeline(Ds(), global_bs, shuffle=True, repeat=True, seed=7)
        shard0 = HostDataPipeline(
            Ds(), global_bs // 2, shuffle=True, repeat=True, seed=7,
            shard_id=0, num_shards=2,
        )
        shard1 = HostDataPipeline(
            Ds(), global_bs // 2, shuffle=True, repeat=True, seed=7,
            shard_id=1, num_shards=2,
        )
        it_s, it_0, it_1 = single.batches(), shard0.batches(), shard1.batches()
        for _ in range(5):  # crosses an epoch boundary (12 examples)
            want = sorted(next(it_s)["x"][:, 0].tolist())
            got = sorted(
                next(it_0)["x"][:, 0].tolist() + next(it_1)["x"][:, 0].tolist()
            )
            assert got == want

    def test_batch_granularity_shards_are_the_global_batches(self):
        """'batch' granularity: shard p's batches() yields EXACTLY the
        single-host batches at global indices p, p+P, … — including the
        ragged tail batch, owned by whichever shard the last chunk lands
        on. (The multi-host evaluate contract.)"""
        from kpvid_tpu.data.base import HostDataPipeline

        class Ds:
            def __len__(self):
                return 11  # 4 batches of 3: last is ragged (2 samples)

            def sample(self, idx, rng):
                return {"x": np.full((2,), idx, np.float32)}

        def batch_list(pipe):
            return [b["x"][:, 0].tolist() for b in pipe.batches()]

        single = batch_list(HostDataPipeline(Ds(), 3, drop_remainder=False))
        for n_shards in (2, 3):
            shards = [
                batch_list(HostDataPipeline(
                    Ds(), 3, drop_remainder=False,
                    shard_id=p, num_shards=n_shards,
                    shard_granularity="batch",
                ))
                for p in range(n_shards)
            ]
            for gb, want in enumerate(single):
                assert shards[gb % n_shards][gb // n_shards] == want

    def test_synced_compile_single_process_is_identity(self):
        """synced_compile must add zero indirection when single-process —
        the jitted callable is returned unchanged."""
        import jax

        from kpvid_tpu.parallel import synced_compile

        f = jax.jit(lambda x: x + 1)
        assert synced_compile(f, "unit") is f

    def test_local_batch_size_divisibility(self, monkeypatch):
        import jax

        from kpvid_tpu.parallel import local_batch_size

        assert local_batch_size(16) == 16  # single-process: identity
        monkeypatch.setattr(jax, "process_count", lambda: 3)
        with pytest.raises(ValueError, match="divisible"):
            local_batch_size(16)
        assert local_batch_size(15) == 5
