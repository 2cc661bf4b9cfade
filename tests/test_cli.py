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


def test_client_command(tmp_path, capsys):
    """`client` sends an on-disk image to a running MaskServer via MaskClient
    and writes the mask PNG — bit-equal to a direct Predictor call; `--stats`
    prints the probe JSON."""
    import json

    import jax
    import numpy as np
    from PIL import Image

    from weaklysuperviseddl_tpu.cli import main
    from weaklysuperviseddl_tpu.models.deeplabv3 import DeepLabV3
    from weaklysuperviseddl_tpu.pipelines.serve import Predictor
    from weaklysuperviseddl_tpu.train.segmentation import create_seg_state

    model = DeepLabV3(num_classes=2, backbone_depth=18, width_multiplier=0.25)
    state, _ = create_seg_state(model, jax.random.PRNGKey(0), input_size=48)
    pred = Predictor(model, state, size=48, max_batch=2).warmup()
    server = pred.serve_http()
    try:
        url = f"http://127.0.0.1:{server.port}"
        rng = np.random.default_rng(3)
        img = (rng.uniform(0, 1, (48, 48, 3)) * 255).astype(np.uint8)
        img_path = tmp_path / "photo.png"
        Image.fromarray(img).save(img_path)

        # default --out lands next to the input as <image>_mask.png
        assert main(["client", "--url", url, "--image", str(img_path)]) == 0
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rec["out"] == str(tmp_path / "photo_mask.png")
        assert rec["shape"] == [48, 48]
        got = (np.asarray(Image.open(rec["out"]).convert("L")) > 0
               ).astype(np.uint8)
        np.testing.assert_array_equal(got, pred(img[None])[0])

        # the compressed wire must write the identical mask
        out2 = tmp_path / "mask_png_wire.png"
        assert main(["client", "--url", url, "--wire", "png",
                     "--image", str(img_path), "--out", str(out2)]) == 0
        capsys.readouterr()
        got2 = (np.asarray(Image.open(out2).convert("L")) > 0).astype(np.uint8)
        np.testing.assert_array_equal(got2, got)

        assert main(["client", "--url", url, "--stats"]) == 0
        rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rec["healthz"]["status"] == "ok"
        assert rec["stats"]["total_images"] >= 2
    finally:
        server.stop()


def test_client_unreachable_server_exits_nonzero(tmp_path, capsys):
    """An unreachable server must be a one-line stderr message and exit 1,
    not a raw urllib traceback (advisor round 4)."""
    from PIL import Image
    import numpy as np

    from weaklysuperviseddl_tpu.cli import main

    img_path = tmp_path / "img.png"
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(img_path)
    # a port from the dynamic range with nothing bound to it: connection
    # refused is immediate (no timeout flake on localhost)
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    rc = main(["client", "--url", f"http://127.0.0.1:{port}",
               "--image", str(img_path)])
    assert rc == 1
    err = capsys.readouterr().err
    assert "cannot reach" in err and f":{port}" in err, err
    assert "Traceback" not in err
