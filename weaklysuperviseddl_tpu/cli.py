"""Command-line entry points.

The reference has no CLI — every experiment is a notebook-exported script with
hardcoded constants (SURVEY.md §5 config). Here each pipeline is reachable as

    python -m weaklysuperviseddl_tpu <command> [--key value ...]

with dotted-config overrides onto ExperimentConfig, e.g.:

    python -m weaklysuperviseddl_tpu weakly --data.image_size 224 --seg.epochs 5
    python -m weaklysuperviseddl_tpu supervised --smoke
    python -m weaklysuperviseddl_tpu ablations --smoke
    python -m weaklysuperviseddl_tpu basnet --weights ./Weights/basnet.pth
    python -m weaklysuperviseddl_tpu dryrun --devices 8
    python -m weaklysuperviseddl_tpu parity --weights-dir ./Weights --pet-root ./data
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys


def _apply_overrides(cfg, overrides: dict):
    """Apply {'data.image_size': '224', ...} onto nested frozen dataclasses."""
    grouped: dict[str, dict] = {}
    for key, value in overrides.items():
        if "." in key:
            section, field = key.split(".", 1)
            grouped.setdefault(section, {})[field] = value
        else:
            grouped.setdefault("", {})[key] = value

    def coerce(current, raw):
        if isinstance(current, bool):
            return raw.lower() in ("1", "true", "yes")
        if current is None:
            return raw
        if isinstance(current, (int, float, str)):
            return type(current)(raw)
        return raw

    updates = {}
    for section, fields in grouped.items():
        if not section:
            for f, raw in fields.items():
                updates[f] = coerce(getattr(cfg, f), raw)
            continue
        sub = getattr(cfg, section)
        sub_updates = {f: coerce(getattr(sub, f), raw) for f, raw in fields.items()}
        updates[section] = dataclasses.replace(sub, **sub_updates)
    return dataclasses.replace(cfg, **updates)


def _base_cfg(args, extra):
    from weaklysuperviseddl_tpu.config import ExperimentConfig, smoke_config

    cfg = smoke_config() if args.smoke else ExperimentConfig()
    overrides = {}
    it = iter(extra)
    for token in it:
        if token.startswith("--"):
            overrides[token[2:]] = next(it)
    return _apply_overrides(cfg, overrides)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv[:1] == ["parity"]:
        # dispatch BEFORE argparse: the main parser's --num-images/--weights/
        # --smoke flags would otherwise swallow the harness's identically
        # named arguments (scripts/parity_harness.py owns its own CLI)
        import runpy

        script = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "parity_harness.py")
        if not os.path.exists(script):
            # the harness drives torch goldens from tests/torch_ref.py, so it
            # lives in the source checkout, not the installed package
            print("error: the 'parity' command requires a source checkout "
                  "(scripts/parity_harness.py not found next to the package); "
                  "run it from the repository root", file=sys.stderr)
            return 2
        saved_argv = sys.argv
        sys.argv = [script] + argv[1:]
        try:
            runpy.run_path(script, run_name="__main__")
        finally:
            sys.argv = saved_argv
        return 0

    parser = argparse.ArgumentParser(prog="weaklysuperviseddl_tpu")
    parser.add_argument("command", choices=[
        "weakly", "supervised", "ablations", "basnet", "foundation", "dryrun",
        "bench", "parity",
    ], help="pipeline to run; 'parity' is dispatched before this parser to "
            "scripts/parity_harness.py (source checkout only) and owns its "
            "own flags — see that script's --help")
    parser.add_argument("--smoke", action="store_true", help="tiny config for smoke runs")
    parser.add_argument("--weights", default="./Weights/basnet.pth")
    parser.add_argument("--devices", type=int, default=8)
    parser.add_argument("--num-images", type=int, default=10)
    args, extra = parser.parse_known_args(argv)

    if args.command == "weakly":
        from weaklysuperviseddl_tpu.pipelines import run_weakly_supervised

        result = run_weakly_supervised(_base_cfg(args, extra))
        print(json.dumps(result.metrics))
    elif args.command == "supervised":
        from weaklysuperviseddl_tpu.pipelines import run_supervised_training

        _, metrics = run_supervised_training(_base_cfg(args, extra))
        print(json.dumps(metrics))
    elif args.command == "ablations":
        from weaklysuperviseddl_tpu.pipelines.ablations import (
            default_grid, run_ablation_experiment,
        )
        from weaklysuperviseddl_tpu.pipelines.weakly import build_classifier

        cfg = _base_cfg(args, extra)
        model, variables = build_classifier(cfg)
        grid = default_grid()
        if args.smoke:
            grid = grid[:1]
        results = run_ablation_experiment(grid, model, variables, cfg,
                                          num_repeats=1 if args.smoke else 3)
        print(json.dumps(results[-1]))
    elif args.command == "basnet":
        from weaklysuperviseddl_tpu.compat.RunInference import main as run_main

        run_main(model_path=args.weights, dataset_root=None, num_images=args.num_images)
    elif args.command == "foundation":
        from weaklysuperviseddl_tpu.compat.two_stage_foundation import (
            evaluate_pipeline_on_dataset,
        )
        from weaklysuperviseddl_tpu.data import download_data

        ds = download_data(None, split="test", synthetic_size=args.num_images)
        evaluate_pipeline_on_dataset(ds, num_images=args.num_images)
    elif args.command == "dryrun":
        # force the host platform with N virtual devices BEFORE jax initializes
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
        import __graft_entry__

        __graft_entry__.dryrun_multichip(args.devices)
    elif args.command == "bench":
        import bench

        bench.main()
    return 0


if __name__ == "__main__":
    sys.exit(main())
