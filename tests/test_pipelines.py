"""End-to-end smoke tests at the reference's own 10-image truncation scale."""

import numpy as np

from weaklysuperviseddl_tpu.config import smoke_config
from weaklysuperviseddl_tpu.pipelines import run_weakly_supervised, run_supervised_training


def test_weakly_supervised_end_to_end():
    cfg = smoke_config()
    logs = []
    result = run_weakly_supervised(cfg, log=logs.append)
    m = result.metrics
    assert 0.0 <= m["iou"] <= 1.0 and 0.0 <= m["acc"] <= 1.0
    assert np.isfinite(m["final_loss"])
    assert len(result.mask_store) == 12  # 16 * 0.8 train split, under the cap
    # pseudo-masks should overlap the synthetic fg blobs far better than chance
    _, masks, _ = result.mask_store.as_arrays()
    assert 0.0 < masks.mean() < 0.9
    assert any("Classifier trained." in s for s in logs)


def test_supervised_baseline_end_to_end():
    cfg = smoke_config()
    logs = []
    _, metrics = run_supervised_training(cfg, num_epochs=2, test_runs=2, log=logs.append)
    assert 0.0 <= metrics["iou_mean"] <= 1.0
    assert metrics["iou_std"] >= 0.0
    assert any("Final Test Results:" in s for s in logs)
