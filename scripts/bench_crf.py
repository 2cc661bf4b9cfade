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
    ap.add_argument("--skip-subsampled", action="store_true")
    ap.add_argument("--strides", default="2,3,4",
                    help="key_stride values to measure for the subsampled "
                         "backend")
    ap.add_argument("--data", choices=("synthetic", "random"),
                    default="synthetic",
                    help="synthetic = Pet-shaped images + blob CAMs (what "
                         "the CRF-on E2E path actually filters); random = "
                         "uniform noise (the adversarial worst case for any "
                         "spatial-smoothness approximation)")
    ap.add_argument("--image-noise", type=float, default=0.0,
                    help="additive uniform color noise (+-units, 0-255 "
                         "scale) on synthetic images — interpolates between "
                         "the blob-flat E2E case and the iid worst case")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from weaklysuperviseddl_tpu.masks.densecrf import densecrf_inference

    B, S = args.batch, args.size
    rng = np.random.default_rng(0)
    if args.data == "synthetic":
        from weaklysuperviseddl_tpu.data import download_data

        ds = download_data(None, split="trainval", synthetic_size=B,
                           image_size=S, seed=0)
        img = np.stack([np.asarray(ds.images[i], np.float32)
                        for i in range(B)])
        if args.image_noise:
            img = np.clip(img + rng.uniform(-args.image_noise,
                                            args.image_noise, img.shape),
                          0, 255).astype(np.float32)
        # CAM-like unary: the (blurred) foreground trimap + noise — shaped
        # like the thresholded LayerCAM the script path feeds the CRF
        tri = np.stack([np.asarray(ds.trimaps[i]) for i in range(B)])
        fg = (tri == 1).astype(np.float32)
        cam = np.clip(fg * 0.8 + 0.1
                      + rng.uniform(-0.08, 0.08, fg.shape), 0.02, 0.98
                      ).astype(np.float32)
    else:
        img = rng.integers(0, 255, (B, S, S, 3)).astype(np.float32)
        cam = np.clip(rng.uniform(0.1, 0.9, (B, S, S)).astype(np.float32),
                      0.02, 0.98)
    probs = np.stack([1 - cam, cam], axis=-1)
    jprobs, jimg = jnp.asarray(probs), jnp.asarray(img)

    def bench(backend, **kw):
        # forced scalar readback each iteration: block_until_ready does not
        # reliably await completion on the axon relay (see bench.py notes)
        fn = lambda i: float(
            densecrf_inference(jprobs + i * 1e-9, jimg,
                               bilat_backend=backend, **kw).sum()
        )
        fn(0)  # compile
        t0 = time.perf_counter()
        for i in range(1, args.iters + 1):
            fn(i)
        dt = (time.perf_counter() - t0) / args.iters
        label = backend + (f"/s{kw['key_stride']}" if kw else "")
        print(f"device {label:12s}: {dt / B * 1e3:8.1f} ms/img "
              f"({B / dt:6.1f} img/s)  [batch {B}, data {args.data}]",
              flush=True)
        return np.asarray(densecrf_inference(jprobs, jimg,
                                             bilat_backend=backend, **kw))

    q_lat = bench("attention")
    if not args.skip_subsampled:
        for s in (int(x) for x in args.strides.split(",")):
            q_s = bench("subsampled", key_stride=s)
            agree = (q_lat.argmax(-1) == q_s.argmax(-1)).mean()
            mae = np.abs(q_lat - q_s).mean()
            print(f"attention/subsampled-s{s} argmax agreement: {agree:.4f}"
                  f"  (marginal MAE {mae:.4f})", flush=True)
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
