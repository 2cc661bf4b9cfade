"""CLI surface (weaklysuperviseddl_tpu/cli.py). The pipeline commands are
covered through their library entry points in the other test modules; these
tests pin the argument surface itself and the serve command's full
HTTP round trip."""

import pytest


def test_unknown_command_rejected(capsys):
    from weaklysuperviseddl_tpu.cli import main

    with pytest.raises(SystemExit) as e:
        main(["frobnicate"])
    assert e.value.code == 2


def test_deep_config_overrides():
    """Dotted overrides must reach arbitrarily nested config dataclasses
    (e.g. the RefineConfig inside AlternatingConfig) and coerce types."""
    from weaklysuperviseddl_tpu.cli import _apply_overrides
    from weaklysuperviseddl_tpu.config import ExperimentConfig

    cfg = _apply_overrides(ExperimentConfig(), {
        "seed": "7",
        "data.image_size": "96",
        "mask.use_crf": "true",
        "alternating.refine.num_steps": "10",
        "alternating.refine.lr": "0.05",
    })
    assert cfg.seed == 7
    assert cfg.data.image_size == 96
    assert cfg.mask.use_crf is True
    assert cfg.alternating.refine.num_steps == 10
    assert cfg.alternating.refine.lr == 0.05
    # untouched siblings keep their defaults
    assert cfg.alternating.num_alternations == 10


def test_weakly_timings_record(tmp_path, capsys):
    """`weakly --timings-out` writes the E2E record from the shipped entry
    point itself: cmd string, per-phase timings (including the attributed
    device_warmup phase), and final metrics."""
    import json

    from weaklysuperviseddl_tpu.cli import main

    out = tmp_path / "timings.json"
    assert main(["weakly", "--smoke", "--timings-out", str(out)]) in (0, None)
    record = json.loads(out.read_text())
    assert record["cmd"].startswith("python -m weaklysuperviseddl_tpu weakly")
    assert "device_warmup" in record["phases"]
    assert record["phases"]["device_warmup"]["seconds"] >= 0.0
    assert record["wall_clock_s"] > 0
    assert 0.0 <= record["metrics"]["iou"] <= 1.0


def test_serve_smoke_round_trip(capsys):
    """`serve --smoke` starts the HTTP front, self-requests one mask, and
    exits 0 — the driveable deployment path."""
    from weaklysuperviseddl_tpu.cli import main

    assert main(["serve", "--smoke"]) == 0
    out = capsys.readouterr().out
    assert "smoke round trip OK" in out
