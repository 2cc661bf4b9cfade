"""Benchmark the dense-CRF paths at reference parameters.

Reference workload (AlternatingDirectionCutLoss.py:183-204): 224x224 RGB,
2 labels, gaussian sxy=1/compat=2 + bilateral sxy=50/srgb=5/compat=10,
5 mean-field iterations. Compares:

  * device lattice  (masks/permutohedral.py, default)
  * device grid     (bilateral grid, round-1 path)
  * host C++ permutohedral (native/wsdl_native.cpp)

Run on the TPU host: `python scripts/bench_crf.py [--batch N] [--skip-grid]`.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--skip-grid", action="store_true")
    ap.add_argument("--skip-lattice", action="store_true")
    ap.add_argument("--skip-host", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from weaklysuperviseddl_tpu.masks.densecrf import densecrf_inference

    B, S = args.batch, args.size
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (B, S, S, 3)).astype(np.float32)
    cam = np.clip(rng.uniform(0.1, 0.9, (B, S, S)).astype(np.float32), 0.02, 0.98)
    probs = np.stack([1 - cam, cam], axis=-1)
    jprobs, jimg = jnp.asarray(probs), jnp.asarray(img)

    def bench(backend):
        # forced scalar readback each iteration: block_until_ready does not
        # reliably await completion on the axon relay (see bench.py notes)
        fn = lambda i: float(
            densecrf_inference(jprobs + i * 1e-9, jimg, bilat_backend=backend).sum()
        )
        fn(0)  # compile
        t0 = time.perf_counter()
        for i in range(1, args.iters + 1):
            fn(i)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"device {backend:8s}: {dt / B * 1e3:8.1f} ms/img "
              f"({B / dt:6.1f} img/s)  [batch {B}]")
        return np.asarray(densecrf_inference(jprobs, jimg, bilat_backend=backend))

    q_lat = bench("attention")
    if not args.skip_lattice:
        q_l = bench("lattice")
        agree = (q_lat.argmax(-1) == q_l.argmax(-1)).mean()
        print(f"attention/lattice argmax agreement: {agree:.4f}")
    if not args.skip_grid:
        q_grid = bench("grid")
        agree = (q_lat.argmax(-1) == q_grid.argmax(-1)).mean()
        print(f"attention/grid argmax agreement: {agree:.4f}")

    if not args.skip_host:
        from weaklysuperviseddl_tpu import native
        unary = -np.log(np.clip(probs, 1e-8, 1.0))
        t0 = time.perf_counter()
        q_host = native.densecrf(unary[0], img[0].astype(np.uint8), exact=False)
        dt = time.perf_counter() - t0
        print(f"host C++ lattice: {dt * 1e3:8.1f} ms/img ({1 / dt:6.1f} img/s)")
        agree = (q_lat[0].argmax(-1) == q_host.argmax(-1)).mean()
        print(f"device-attention/host-lattice argmax agreement: {agree:.4f}")


if __name__ == "__main__":
    main()
