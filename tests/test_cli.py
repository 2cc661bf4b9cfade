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


def test_serve_smoke_round_trip(capsys):
    """`serve --smoke` starts the HTTP front, self-requests one mask, and
    exits 0 — the driveable deployment path."""
    from weaklysuperviseddl_tpu.cli import main

    assert main(["serve", "--smoke"]) == 0
    out = capsys.readouterr().out
    assert "smoke round trip OK" in out
