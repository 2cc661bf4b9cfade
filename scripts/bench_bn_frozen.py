"""A/B the SegConfig.bn_frozen fast path on the real chip.

FrozenBN fine-tuning (models/deeplabv3.DeepLabV3(bn_frozen=True)) removes the
batch-stat reductions + running-stat updates + fusion breaks of all ~53 BN
layers from the train step. The diagnostic eval-BN A/B (BASELINE.md round 3)
priced that machinery at ~2.2 ms of a ~26.9 ms step; this script measures the
SHIPPED option with bench.py's protocol (in-jit scan of the real train step,
floor-corrected by the scan) so the number in BASELINE.md is the one a user
gets from ``--set seg.bn_frozen=true``.

Run on the TPU host: python scripts/bench_bn_frozen.py [--batch 16 --iters 20]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/wsdl_jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from weaklysuperviseddl_tpu.models.deeplabv3 import DeepLabV3
    from weaklysuperviseddl_tpu.train.segmentation import (
        create_seg_state, make_seg_train_step)

    B, S, iters = args.batch, args.size, args.iters
    rng = np.random.default_rng(0)
    rngkey = jax.random.PRNGKey(0)
    images = jnp.asarray(rng.uniform(-2, 2, (B, S, S, 3)).astype(np.float32))
    masks = jnp.asarray(rng.integers(0, 2, (B, S, S)).astype(np.int32))
    valid = jnp.ones((B,), bool)
    print(f"device={jax.devices()[0].device_kind}  batch={B}  size={S} "
          f"bf16  iters/scan={iters}")

    results = {}
    for bn_frozen in (False, True):
        seg = DeepLabV3(num_classes=2, backbone_depth=50, width_multiplier=1.0,
                        dtype=jnp.bfloat16, bn_frozen=bn_frozen)
        state, tx = create_seg_state(seg, rngkey, input_size=S, lr=1e-4)
        step = make_seg_train_step(seg, tx)
        # the SAME in-jit scan harness bench.py's headline seg stage times —
        # a drifted copy here would silently A/B a different program
        from bench import make_scanned_seg_stage

        stage_n = make_scanned_seg_stage(step, images, masks, valid, rngkey,
                                         iters)

        float(stage_n(state.params, state.batch_stats, state.opt_state))  # compile
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(stage_n(state.params, state.batch_stats, state.opt_state))
            times.append((time.perf_counter() - t0) / iters)
        best = min(times)
        results[bn_frozen] = best
        label = "bn_frozen=True " if bn_frozen else "bn_frozen=False"
        print(f"{label}: {best * 1e3:7.2f} ms/step  {B / best:8.1f} img/s  "
              f"(per-rep ms: {[f'{t*1e3:.2f}' for t in times]})")

    speedup = results[False] / results[True]
    print(f"frozen-BN step speedup: {speedup:.3f}x "
          f"({(results[False] - results[True]) * 1e3:.2f} ms/step)")


if __name__ == "__main__":
    main()
