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
    python -m weaklysuperviseddl_tpu serve --port 8765
    python -m weaklysuperviseddl_tpu client --url http://host:8765 --image photo.jpg
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys


def _apply_overrides(cfg, overrides: dict):
    """Apply {'data.image_size': '224', ...} onto nested frozen dataclasses.
    Arbitrary nesting depth: 'alternating.refine.num_steps' reaches the
    RefineConfig inside AlternatingConfig."""

    def coerce(current, raw):
        if isinstance(current, bool):
            return raw.lower() in ("1", "true", "yes")
        if current is None:
            return raw
        if isinstance(current, (int, float, str)):
            return type(current)(raw)
        return raw

    def set_path(node, path: list[str], raw):
        field, rest = path[0], path[1:]
        current = getattr(node, field)
        value = set_path(current, rest, raw) if rest else coerce(current, raw)
        return dataclasses.replace(node, **{field: value})

    for key, raw in overrides.items():
        cfg = set_path(cfg, key.split("."), raw)
    return cfg


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
        "bench", "parity", "serve", "client",
    ], help="pipeline to run; 'parity' is dispatched before this parser to "
            "scripts/parity_harness.py (source checkout only) and owns its "
            "own flags — see that script's --help")
    parser.add_argument("--smoke", action="store_true", help="tiny config for smoke runs")
    parser.add_argument("--weights", default="./Weights/basnet.pth")
    parser.add_argument("--devices", type=int, default=8)
    parser.add_argument("--num-images", type=int, default=10)
    parser.add_argument("--checkpoint", default=None,
                        help="serve: orbax dir saved by utils.checkpoint."
                             "save_state({'params':…, 'batch_stats':…}); "
                             "random init if omitted")
    parser.add_argument("--port", type=int, default=8765)
    parser.add_argument("--size", type=int, default=256)
    # serve defaults = the measured-best config (BASELINE.md serving table):
    # batch 64 + packed readback + int8 PTQ
    parser.add_argument("--max-batch", type=int, default=64)
    parser.add_argument("--packed", default=True,
                        action=argparse.BooleanOptionalAction,
                        help="serve: bit-packed device→host mask readback "
                             "(default on; --no-packed for raw uint8)")
    parser.add_argument("--int8", default=True,
                        action=argparse.BooleanOptionalAction,
                        help="serve: int8 PTQ of the serving program "
                             "(default on; calibrates on --calib-dir images "
                             "or synthetic data). --no-int8 for bf16/f32")
    parser.add_argument("--calib-dir", default=None,
                        help="serve: directory of calibration PNGs/JPGs for "
                             "--int8 (synthetic calibration if omitted)")
    parser.add_argument("--calib-state", default=None,
                        help="serve: persistent int8 calibration artifact "
                             "(JSON). Loaded if it exists (restart without "
                             "re-calibrating), written after calibration "
                             "otherwise")
    parser.add_argument("--alternating", action="store_true",
                        help="weakly: run the full alternating train↔refine "
                             "loop after the initial cycle")
    parser.add_argument("--checkpoint-dir", default=None,
                        help="weakly --alternating: per-alternation snapshot "
                             "dir (full train state + versioned mask store)")
    parser.add_argument("--resume", action="store_true",
                        help="weakly --alternating: restore the latest "
                             "snapshot in --checkpoint-dir and continue")
    parser.add_argument("--url", default="http://127.0.0.1:8765",
                        help="client: base URL of a running MaskServer")
    parser.add_argument("--image", default=None,
                        help="client: PNG/JPEG to send (bytes as-is; the "
                             "server decodes)")
    parser.add_argument("--out", default=None,
                        help="client: mask PNG output path (default: "
                             "<image>_mask.png next to the input)")
    parser.add_argument("--wire", choices=["npy", "png"], default="npy",
                        help="client: response wire format — npy (localhost) "
                             "or compressed 1-bit PNG (WAN)")
    parser.add_argument("--stats", action="store_true",
                        help="client: print the server's /healthz and /stats "
                             "JSON instead of predicting")
    parser.add_argument("--timings-out", default=None,
                        help="weakly: write a per-phase wall-clock/img-per-s "
                             "JSON record of THIS pipeline run (the E2E "
                             "record is produced by the shipped entry point, "
                             "not a measurement script)")
    args, extra = parser.parse_known_args(argv)

    if args.command == "weakly":
        import time

        from weaklysuperviseddl_tpu.utils.profiling import (
            Stopwatch, enable_compile_cache)

        enable_compile_cache()
        cfg = _base_cfg(args, extra)
        sw = Stopwatch()
        t0 = time.perf_counter()
        if args.timings_out:
            # first device contact on an attached relay can stall for minutes
            # (tunnel handshake / a concurrent holder); pay it in its own
            # phase so the pipeline phases measure the pipeline, not the relay
            from weaklysuperviseddl_tpu.utils.profiling import warmup_device

            with sw.phase("device_warmup"):
                warmup_device()
        if args.alternating or args.resume:
            from weaklysuperviseddl_tpu.pipelines import (
                run_weakly_supervised_alternating,
            )

            result = run_weakly_supervised_alternating(
                cfg, checkpoint_dir=args.checkpoint_dir,
                resume=args.resume, stopwatch=sw)
        else:
            from weaklysuperviseddl_tpu.pipelines import run_weakly_supervised

            result = run_weakly_supervised(cfg, stopwatch=sw)
        wall = time.perf_counter() - t0
        if args.timings_out:
            import dataclasses

            import jax

            record = {
                "cmd": "python -m weaklysuperviseddl_tpu weakly"
                       + (" --alternating" if args.alternating else "")
                       + (" --resume" if args.resume else ""),
                "config": dataclasses.asdict(cfg),
                "device": str(jax.devices()[0]),
                "wall_clock_s": round(wall, 2),
                "phases": {
                    name: {
                        "seconds": round(sw.times[name], 3),
                        "calls": sw.counts[name],
                        "img_per_s": round(sw.rate(name), 2),
                        **({"first_call_s": round(sw.first_call_s(name), 3),
                            "marginal_img_per_s": round(sw.marginal_rate(name), 2)}
                           if sw.marginal_rate(name) is not None else {}),
                    } for name in sw.times
                },
                "metrics": result.metrics,
            }
            with open(args.timings_out, "w") as f:
                json.dump(record, f, indent=1)
            sw.report()
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
    elif args.command == "serve":
        import types

        import jax

        from weaklysuperviseddl_tpu.models.deeplabv3 import DeepLabV3
        from weaklysuperviseddl_tpu.pipelines.serve import Predictor
        from weaklysuperviseddl_tpu.train.segmentation import create_seg_state
        from weaklysuperviseddl_tpu.utils.checkpoint import restore_state

        size = 48 if args.smoke else args.size
        model = DeepLabV3(
            num_classes=2,
            backbone_depth=18 if args.smoke else 50,
            width_multiplier=0.25 if args.smoke else 1.0,
        )
        state, _ = create_seg_state(model, jax.random.PRNGKey(0), input_size=size)
        if args.checkpoint:
            tpl = {"params": state.params, "batch_stats": state.batch_stats}
            restored = restore_state(args.checkpoint, tpl)
            state = types.SimpleNamespace(
                params=restored["params"], batch_stats=restored["batch_stats"])
        pred = Predictor(model, state, size=size,
                         max_batch=2 if args.smoke else args.max_batch,
                         packed=args.packed)
        if args.int8 and not args.smoke:
            import numpy as np

            if args.calib_dir:
                from PIL import Image

                exts = {".png", ".jpg", ".jpeg", ".bmp", ".gif", ".webp"}
                files = sorted(
                    f for f in os.listdir(args.calib_dir)
                    if os.path.isfile(os.path.join(args.calib_dir, f))
                    and os.path.splitext(f)[1].lower() in exts
                )[: args.max_batch]
                if not files:
                    parser.error(
                        f"--calib-dir {args.calib_dir} contains no image "
                        f"files ({'/'.join(sorted(exts))})")
                calib = np.stack([
                    np.asarray(Image.open(os.path.join(args.calib_dir, f))
                               .convert("RGB").resize((size, size)), np.uint8)
                    for f in files])
            else:
                from weaklysuperviseddl_tpu.data import download_data

                print("WARNING: --int8 with no --calib-dir calibrates "
                      "activation scales on SYNTHETIC images; pass "
                      "--calib-dir with production-like images (or "
                      "--no-int8) for a real deployment", flush=True)
                ds = download_data(None, split="test",
                                   synthetic_size=args.max_batch,
                                   image_size=size)
                calib = np.stack([np.asarray(ds.images[i], np.uint8)
                                  for i in range(len(ds))])
            reuse = args.calib_state and os.path.exists(args.calib_state)
            print(("loading int8 calibration state from "
                   f"{args.calib_state}...") if reuse else
                  ("calibrating int8 PTQ "
                   f"({'dir' if args.calib_dir else 'synthetic'}, "
                   f"{calib.shape[0]} images)..."))
            # quality gate: int8 masks must agree with the float program on
            # the calibration batch, else serve the float program instead —
            # a silently degraded default is worse than a slower one
            ref_masks = pred(calib)
            pred.quantize(calib, state_path=args.calib_state)
            agree = float(np.mean(pred(calib) == ref_masks))
            if agree < 0.99:
                pred._quantized = None
                print(f"WARNING: int8/float mask agreement {agree:.4f} < "
                      "0.99 on the calibration batch — falling back to the "
                      "float serving program (check calibration coverage)",
                      flush=True)
            else:
                print(f"int8/float mask agreement on calibration batch: "
                      f"{agree:.4f}", flush=True)
        pred.warmup(all_buckets=True)
        server = pred.serve_http(port=0 if args.smoke else args.port)
        print(f"serving uint8 [h,w,3] → {size}² masks on "
              f"http://127.0.0.1:{server.port}/predict "
              f"(np.save bodies; PNG/JPEG via Content-Type: image/*, "
              f"PNG masks via Accept: image/png)")
        if args.smoke:
            # self-request round trip through the shipped client, then exit —
            # the driveable smoke path exercises the same wire code users run
            import numpy as np

            from weaklysuperviseddl_tpu.pipelines.serve import MaskClient

            try:
                mask = MaskClient(
                    f"http://127.0.0.1:{server.port}", timeout=60.0
                ).predict(np.zeros((size, size, 3), np.uint8))
            finally:
                # a failed smoke request must not leave the worker thread
                # running while the exception propagates
                server.stop()
            print(f"smoke round trip OK: mask {mask.shape} "
                  f"values {sorted(set(np.unique(mask)))}")
        else:  # pragma: no cover - long-running server
            try:
                while True:
                    import time

                    time.sleep(3600)
            except KeyboardInterrupt:
                server.stop()
    elif args.command == "client":
        # operator-side twin of `serve`: get a mask out of a running
        # MaskServer with no hand-written urllib (pipelines/serve.MaskClient
        # is the wire-format reference implementation)
        import urllib.error

        from weaklysuperviseddl_tpu.pipelines.serve import MaskClient

        client = MaskClient(args.url, wire=args.wire)
        # network failures are an operator-facing condition, not a bug:
        # one line to stderr + nonzero exit, not a urllib traceback
        try:
            if args.stats:
                print(json.dumps(
                    {"healthz": client.healthz(), "stats": client.stats()}))
                return 0
            if not args.image:
                parser.error("client: pass --image PATH (or --stats)")
            import numpy as np
            from PIL import Image

            mask = client.predict_file(args.image)
        except urllib.error.HTTPError as e:
            print(f"client: server error: HTTP {e.code} {e.reason} "
                  f"({args.url})", file=sys.stderr)
            return 1
        except (urllib.error.URLError, OSError) as e:
            print(f"client: cannot reach {args.url}: "
                  f"{getattr(e, 'reason', e)}", file=sys.stderr)
            return 1
        out = args.out or os.path.splitext(args.image)[0] + "_mask.png"
        Image.fromarray((mask > 0).astype(np.uint8) * 255, "L").convert(
            "1").save(out)
        print(json.dumps({"out": out, "shape": list(mask.shape),
                          "fg_frac": round(float((mask > 0).mean()), 4)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
