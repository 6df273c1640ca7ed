"""MetricLogger: JSONL, TB image summaries, primary-only gating."""

import glob
import json
import os

import numpy as np

from kpvid_tpu.utils.logging import MetricLogger


def test_jsonl_and_tb_image_summaries(tmp_path):
    """--tensorboard writes scalars AND images (the reference's primary
    visual channel; detector_translator_model.py:205-244)."""
    ml = MetricLogger(tmp_path, "stage", tensorboard=True)
    ml.log_metrics("train", 5, {"loss_D": 0.5, "loss_G": 1.5})
    ml.log_images(
        "train", 5,
        {"im": np.random.default_rng(0).uniform(-1, 1, (3, 16, 16, 3)),
         "mask": np.random.default_rng(1).uniform(0, 1, (3, 16, 16, 1))},
    )
    ml.close()
    rec = json.loads((tmp_path / "stage" / "train_metrics.jsonl").read_text())
    assert rec["loss_D"] == 0.5
    # PNG grids (max_outputs=2 per name)
    pngs = glob.glob(str(tmp_path / "stage" / "train_images" / "*.png"))
    assert len(pngs) == 4
    # TB event file exists and is non-trivial (carries the image payloads)
    evs = glob.glob(str(tmp_path / "stage" / "train" / "events.out*"))
    assert evs and os.path.getsize(evs[0]) > 500


def test_disabled_logger_is_noop(tmp_path):
    """enabled=False (non-primary multi-host processes) writes nothing."""
    ml = MetricLogger(tmp_path, "stage", tensorboard=True, enabled=False)
    ml.log_metrics("train", 1, {"loss": 1.0})
    ml.log_images("train", 1, {"im": np.zeros((1, 8, 8, 3))})
    ml.log_console(1, 1.0, 1.0, 1.0, 1.0)
    ml.close()
    assert not (tmp_path / "stage").exists() or not list(
        (tmp_path / "stage").iterdir()
    )
