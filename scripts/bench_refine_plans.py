"""A/B the refinement mega-kernel execution plans on the real chip.

Plans (ops/pallas_refine.py):
  v1     — round-2 kernel: window backward as 2·K·C misaligned
           slice-accumulates into the padded grad planes per step.
  v1sym  — v1 + the C==2 class-symmetry reduction: the offset sweep runs for
           class 0 only (d_1 = -d_0 when the window planes sum to 1).
  v2     — backward restructured: center term accumulated in registers from
           the freshly computed aff·diff values; neighbor term a shifted pure
           READ of a zero-ringed ad scratch plane (gather, not scatter);
           only the reflect-fold margins still read-modify-write.
  v2_aff — v2 + the K color-affinity planes computed once before the Adam
           loop and held live in VMEM (they depend only on the image).

Measures the BASELINE.md reference config: batch 8 x 10 Adam steps at 256^2,
relay-floor-corrected, best of 3. Also 224^2 (the CAM-path geometry).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from weaklysuperviseddl_tpu.ops.pallas_refine import pallas_refine, refine_vmem_bytes


def _floor():
    f = jax.jit(lambda x: x + 1)
    float(f(jnp.zeros(())))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(jnp.zeros(())))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    floor = _floor()
    print(f"relay floor: {floor*1e3:.2f} ms")
    rng = np.random.default_rng(0)
    results = {}
    for size in (256, 224):
        B, H, W, C = 8, size, size, 2
        logits = rng.normal(size=(B, H, W, C)).astype(np.float32)
        S = jax.nn.softmax(jnp.asarray(logits), axis=-1)
        images = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32))
        masks = jnp.asarray((rng.uniform(size=(B, H, W)) > 0.5).astype(np.uint8))

        ref_masks = None
        for plan in ("v1", "v1sym", "v2", "v2_aff"):
            vmem = refine_vmem_bytes((B, H, W, C), 5, plan)
            label = f"{size}/{plan}"
            if vmem > 13 * 1024 * 1024:
                print(f"{label}: skipped (vmem {vmem/2**20:.1f} MiB)")
                continue

            ITERS = 10

            @jax.jit
            def run_n(S_, images_, masks_):
                # amortize the relay dispatch+readback floor over ITERS
                # in-jit calls (bench.py's methodology) — a single dispatch
                # with two readbacks is floor-dominated (~50 ms) against a
                # ~3.5 ms kernel
                def body(carry, _):
                    m, l = pallas_refine(
                        S_, images_, masks_, num_steps=10, plan=plan)
                    return carry + l + jnp.sum(m.astype(jnp.float32)), None
                tot, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(ITERS))
                return tot

            try:
                m, l = pallas_refine(S, images, masks, num_steps=10, plan=plan)
                m = np.asarray(m)
                float(run_n(S, images, masks))  # compile
            except Exception as e:  # noqa: BLE001 — report and keep sweeping
                msg = str(e)
                if "vmem" in msg.lower():
                    msg = msg[msg.lower().index("scoped allocation"):][:120]
                print(f"{label}: COMPILE FAILED — {msg[:160]}", flush=True)
                results[label] = {"error": msg[:160]}
                continue
            if ref_masks is None:
                ref_masks = m
            agree = float((m == ref_masks).mean())
            l = float(l)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(run_n(S, images, masks))
                ts.append(time.perf_counter() - t0)
            net = max((min(ts) - floor) / ITERS, 1e-9)
            rate = B / net
            results[label] = {
                "ms_per_batch": round(net * 1e3, 2),
                "img_per_s": round(rate, 1),
                "vmem_mib": round(vmem / 2**20, 2),
                "mask_agreement_vs_v1": agree,
                "loss": l,
            }
            print(f"{label}: {net*1e3:.2f} ms/batch8, {rate:.0f} img/s, "
                  f"vmem {vmem/2**20:.1f} MiB, agree {agree:.4f}")
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
