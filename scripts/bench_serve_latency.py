"""Serving latency SLO measurement (VERDICT r3 #5).

Drives MaskServer — the HTTP front with dynamic micro-batching — with
closed-loop concurrent clients on the real chip and records p50/p99
per-request latency and achieved throughput vs offered concurrency, for the
measured-best serving config (batch 64 + packed readback + int8 PTQ; see
BASELINE.md round 3). Throughput without a latency distribution is not a
serving claim; this produces the distribution.

The reference has no serving story (SURVEY.md §2) — this measures the repo's
own beyond-reference surface like the production claim it makes.

Records E2E_SERVE_LATENCY.json and prints a markdown table for BASELINE.md.

Usage: python scripts/bench_serve_latency.py [--duration 10] [--no-int8]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
import time

import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)


def drive_clients(url: str, images: np.ndarray, concurrency: int,
                  duration_s: float):
    """Closed-loop load: ``concurrency`` client threads each POST
    sequentially for ``duration_s``. Returns per-request latencies (s)."""
    bodies = []
    for img in images:
        buf = io.BytesIO()
        np.save(buf, img)
        bodies.append(buf.getvalue())

    latencies: list[float] = []
    errors: list[str] = []
    shed = [0]  # 503 responses: intentional overload shedding, not failures
    lock = threading.Lock()
    stop_at = time.perf_counter() + duration_s

    def client(cid: int):
        # a failed request is recorded and the client keeps offering load —
        # a silently dead thread would shrink the offered concurrency and
        # overstate the published SLO. One persistent HTTP/1.1 connection
        # per client thread (the server's keep-alive handler): the
        # per-request TCP connect + server thread-spawn of HTTP/1.0 was
        # measurable client+server overhead on a shared host.
        import http.client
        import urllib.parse

        u = urllib.parse.urlsplit(url)
        rng = np.random.default_rng(cid)
        local, local_err, local_shed = [], [], 0
        conn = None
        while time.perf_counter() < stop_at:
            body = bodies[int(rng.integers(len(bodies)))]
            t0 = time.perf_counter()
            try:
                if conn is None:
                    conn = http.client.HTTPConnection(
                        u.hostname, u.port, timeout=120)
                conn.request("POST", u.path, body=body)
                r = conn.getresponse()
                raw_headers = r.headers
                r.read()  # drain so the connection is reusable
                if r.will_close:
                    conn.close()
                    conn = None
                if r.status == 503:
                    # shed by the bounded queue: back off as instructed,
                    # count separately — the SLO (p50/p99) is over ACCEPTED
                    # requests, the shed rate is its own column
                    local_shed += 1
                    time.sleep(
                        float(raw_headers.get("Retry-After", 0.1)) *
                        (0.5 + rng.random()))
                    continue
                if r.status != 200:
                    local_err.append(f"HTTP {r.status}: {r.reason}")
                    continue
            except Exception as e:  # noqa: BLE001 — record, keep driving
                if conn is not None:
                    conn.close()
                    conn = None
                local_err.append(f"{type(e).__name__}: {e}")
                continue
            local.append(time.perf_counter() - t0)
        with lock:
            latencies.extend(local)
            errors.extend(local_err)
            shed[0] += local_shed

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(concurrency)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.perf_counter() - t_start
    return latencies, errors, shed[0], elapsed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--duration", type=float, default=10.0,
                    help="seconds of load per concurrency level")
    ap.add_argument("--concurrencies", default="1,4,16,64,256",
                    help="256 is the over-saturation level: it exists to "
                         "measure shed-rate and bounded accepted-p99, not "
                         "throughput")
    ap.add_argument("--max-wait-ms", type=float, default=5.0)
    ap.add_argument("--max-queue", type=int, default=256,
                    help="server request-queue bound (503 shed past it)")
    ap.add_argument("--in-flight", type=int, default=4)
    ap.add_argument("--no-int8", action="store_true")
    ap.add_argument("--no-packed", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "E2E_SERVE_LATENCY.json"))
    args = ap.parse_args()

    from weaklysuperviseddl_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    import jax

    from weaklysuperviseddl_tpu.models.deeplabv3 import DeepLabV3
    from weaklysuperviseddl_tpu.pipelines.serve import Predictor
    from weaklysuperviseddl_tpu.train.segmentation import create_seg_state

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    model = DeepLabV3(num_classes=2, backbone_depth=50, width_multiplier=1.0)
    state, _ = create_seg_state(model, jax.random.PRNGKey(0),
                                input_size=args.size)
    pred = Predictor(model, state, size=args.size, max_batch=args.max_batch,
                     packed=not args.no_packed)
    rng = np.random.default_rng(0)
    images = (rng.uniform(0, 255, (args.max_batch, args.size, args.size, 3))
              .astype(np.uint8))
    if not args.no_int8:
        print("calibrating int8 PTQ...", flush=True)
        report = pred.quantize(images)
        print(f"int8: {report}", flush=True)
    print("warmup...", flush=True)
    pred.warmup(all_buckets=True)

    # no-HTTP device ceiling through the same relay (predict_many, batch
    # max_batch, in-flight pipelined): the number the HTTP front is judged
    # against when attributing the residual gap
    n_ceiling = args.max_batch * 8
    big = np.concatenate([images] * 8)
    pred.predict_many(big)  # warm
    t0 = time.perf_counter()
    pred.predict_many(big)
    ceiling = n_ceiling / (time.perf_counter() - t0)
    print(f"no-HTTP predict_many ceiling through relay: "
          f"{ceiling:.1f} img/s", flush=True)

    server = pred.serve_http(max_wait_ms=args.max_wait_ms,
                             max_queue=args.max_queue,
                             in_flight=args.in_flight)
    url = f"http://127.0.0.1:{server.port}/predict"
    print(f"serving on {url}", flush=True)

    rows = []
    try:
        for conc in [int(c) for c in args.concurrencies.split(",")]:
            server.drain_dispatch_sizes()  # attribute dispatches per level
            lats, errs, n_shed, elapsed = drive_clients(
                url, images[:8], conc, args.duration)
            sizes = server.drain_dispatch_sizes()
            row = {
                "concurrency": conc,
                "requests": len(lats),
                "errors": len(errs),
                "shed_503": n_shed,
                "throughput_img_per_s": round(len(lats) / elapsed, 1),
                "mean_coalesced_batch": round(float(np.mean(sizes)), 2) if sizes else 0,
                "max_coalesced_batch": int(np.max(sizes)) if sizes else 0,
            }
            if lats:
                lats_ms = np.asarray(sorted(lats)) * 1e3
                row.update({
                    "p50_ms": round(float(np.percentile(lats_ms, 50)), 1),
                    "p90_ms": round(float(np.percentile(lats_ms, 90)), 1),
                    "p99_ms": round(float(np.percentile(lats_ms, 99)), 1),
                })
            if errs:
                row["first_errors"] = errs[:3]
                print(f"WARNING: {len(errs)} failed requests at "
                      f"concurrency {conc}", flush=True)
            rows.append(row)
            print(json.dumps(row), flush=True)
        # the server's own /stats view (ring-buffer percentiles, shed/timeout
        # counters) — recorded so the in-process observability can be checked
        # against the external measurement
        import urllib.request

        with urllib.request.urlopen(
                url.rsplit("/", 1)[0] + "/stats", timeout=30) as r:
            server_stats = json.load(r)
        print(f"server /stats: {json.dumps(server_stats)}", flush=True)
    finally:
        server.stop()

    record = {
        "config": {
            "model": "DeepLabV3-ResNet50", "size": args.size,
            "max_batch": args.max_batch, "packed": not args.no_packed,
            "int8": not args.no_int8, "max_wait_ms": args.max_wait_ms,
            "protocol": "HTTP POST np.save bodies, closed-loop clients",
            "duration_s_per_level": args.duration,
            "device": f"{dev.platform} {dev.device_kind}",
            "max_queue": args.max_queue,
            "in_flight": args.in_flight,
        },
        "no_http_predict_many_img_per_s": round(ceiling, 1),
        "levels": rows,
        "server_stats": server_stats,
        "notes": "latency percentiles are over ACCEPTED requests; shed_503 "
                 "is the bounded-queue overload path (clients back off per "
                 "Retry-After). Worker pipelined round 5: async dispatch + "
                 "separate readback drain, in_flight=4.",
    }
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print(f"wrote {args.out}", flush=True)

    print("\n| clients | req/s | p50 ms | p90 ms | p99 ms | mean batch | shed | errors |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['concurrency']} | {r['throughput_img_per_s']} | "
              f"{r.get('p50_ms', '—')} | {r.get('p90_ms', '—')} | "
              f"{r.get('p99_ms', '—')} | {r['mean_coalesced_batch']} | "
              f"{r['shed_503']} | {r['errors']} |")


if __name__ == "__main__":
    main()
