"""Serving path: one compiled program from raw image batch to binary masks.

The reference has no inference story beyond eval loops; for production serving
the whole pipeline — uint8 decode-normalize → DeepLabV3 forward → argmax →
(optional) largest-component cleanup — compiles into a single XLA program with
static shapes, so a server loop is one dispatch per batch.

``Predictor`` wraps it with padding to a fixed batch (static shapes ⇒ no
recompiles under ragged traffic) and exposes a simple numpy-in/numpy-out
``__call__``, a pipelined bulk path (``predict_many``), an int8 PTQ rewrite
(``quantize``, ops/quant.py), and bit-packed mask readback (``packed=True``
— binary masks cross the host link as bitmaps, 8× fewer bytes).

Throughput anatomy on this environment (real v5e behind the axon relay,
224², measured in BASELINE.md round 3): compute is 2–20 ms/batch while each
host→device round trip costs ~20-25 ms and the link moves ~40 MB/s, so
serving here is transfer-bound, not compute-bound — the effective levers are
batch size (fewer round trips per image) and packed readback (fewer bytes),
which together take 151 → 244 img/s. On a directly-attached TPU host the
same program is compute-bound at the in-jit forward rate (3,400+ img/s
bf16, 4,400+ int8 at batch 32).
"""

from __future__ import annotations

import io
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from weaklysuperviseddl_tpu.data.preprocess import preprocess_batch
from weaklysuperviseddl_tpu.masks.components import keep_largest_batch
from weaklysuperviseddl_tpu.train.segmentation import _normalize_images


def pack_binary_masks(masks):
    """[..., W] uint8 {0,1} → [..., W//8] uint8 bitmap (np.unpackbits layout,
    bitorder='big'). Binary masks are 8× smaller on the wire — worthwhile on
    any host↔device link (PCIe DMA, network relay) since the pack is a free
    elementwise epilogue inside the serving program."""
    w = masks.shape[-1]
    assert w % 8 == 0, f"width {w} not divisible by 8"
    bits = masks.reshape(*masks.shape[:-1], w // 8, 8).astype(jnp.uint8)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    return jnp.sum(bits * weights, axis=-1, dtype=jnp.uint8)


def _serve_forward(model, params, batch_stats, images_uint8, size, clean, pack):
    """The ONE serving forward body — shared verbatim by the jitted float
    path (predict_masks) and the quantized rewrite (Predictor.quantize), so
    the two programs cannot drift."""
    x, _ = preprocess_batch(images_uint8, None, size=size)
    x = _normalize_images(x)
    logits = model.apply({"params": params, "batch_stats": batch_stats}, x, train=False)
    masks = jnp.argmax(logits, axis=-1).astype(jnp.uint8)
    if clean:
        masks = keep_largest_batch(masks)
    return pack_binary_masks(masks) if pack else masks


@partial(jax.jit, static_argnames=("model", "size", "clean", "pack"))
def predict_masks(model, params, batch_stats, images_uint8, size: int = 256,
                  clean: bool = False, pack: bool = False):
    """[B,h,w,3] uint8 → uint8 {0,1} masks [B,size,size], one dispatch.
    ``pack=True`` returns [B,size,size//8] bitmaps (pack_binary_masks)."""
    return _serve_forward(model, params, batch_stats, images_uint8, size,
                          clean, pack)


class Predictor:
    """Bucketed-batch server front: pads ragged requests up to the next
    power-of-two bucket (≤ ``max_batch``) so a small, fixed set of compiled
    programs covers every request size. Padding to ``max_batch``
    unconditionally was measured to dominate single-request latency through
    the relay — a 1-image request at 256² uploaded a 12.6 MB batch-64 body
    (E2E_SERVE_LATENCY round 4); pow-2 buckets cut that to the next bucket's
    bytes while keeping the program count at log2(max_batch)+1.

    Numerics contract: each bucket is a separate XLA program, and programs
    of different batch shapes are not bit-identical in their float logits —
    pixels whose two class logits tie to the last ulp can flip across
    bucket sizes. Measured on the real v5e at the worst case (random-init
    weights, whose logits sit maximally close to the decision boundary):
    ≤0.1% of mask pixels; identical inputs through the SAME bucket are
    deterministic. Trained models, whose logits are not razor ties, are
    unaffected in practice."""

    def __init__(self, model, state, size: int = 256, max_batch: int = 16,
                 clean: bool = False, packed: bool = False, mesh=None):
        self.model = model
        self.params = state.params
        self.batch_stats = state.batch_stats
        self.size = size
        self.max_batch = max_batch
        self.clean = clean
        self.packed = packed  # bit-pack masks on device, unpack on host
        if packed:
            nc = getattr(model, "num_classes", 2)
            assert nc == 2, (
                f"packed=True is a BINARY-mask wire format; model has "
                f"{nc} classes (class ids ≥ 2 cannot round-trip a bitmap)")
        self._quantized = None  # set by quantize()
        self.mesh = mesh  # data-parallel serving: batch sharded on 'data'
        if mesh is not None:
            from weaklysuperviseddl_tpu.parallel.mesh import (
                batch_sharding, replicate_tree)

            n = mesh.shape["data"]
            assert max_batch % n == 0, (
                f"max_batch {max_batch} not divisible by data axis {n}")
            self.params = replicate_tree(mesh, self.params)
            self.batch_stats = replicate_tree(mesh, self.batch_stats)
            self._in_sharding = batch_sharding(mesh, ndim=4)

    def _bucket(self, n: int) -> int:
        """Smallest serving bucket ≥ n: powers of two up to max_batch, plus
        max_batch itself; on a mesh, rounded up to a data-axis multiple."""
        b = 1 << max(0, n - 1).bit_length()
        if b > self.max_batch:
            b = self.max_batch
        if self.mesh is not None:
            axis = self.mesh.shape["data"]
            b = -(-b // axis) * axis
        return b

    def buckets(self) -> list[int]:
        return sorted({self._bucket(n) for n in
                       (2**i for i in range(self.max_batch.bit_length() + 1))
                       if n <= self.max_batch} | {self.max_batch})

    def warmup(self, input_hw: tuple[int, int] | None = None,
               all_buckets: bool = False):
        """Pre-compile the serving program. ``all_buckets=True`` compiles
        every pow-2 bucket program (use before taking latency-sensitive
        load; the persistent compile cache makes repeats cheap)."""
        h, w = input_hw or (self.size, self.size)
        sizes = self.buckets() if all_buckets else [self.max_batch]
        for b in sizes:
            self._dispatch(jnp.zeros((b, h, w, 3), jnp.uint8)).block_until_ready()
        return self

    def quantize(self, calibration_images: np.ndarray | None = None,
                 clip_ratio: float = 1.0, state_path: str | None = None):
        """Swap the serving program for its int8 PTQ rewrite (ops/quant.py):
        every weight conv/matmul runs on the MXU in int8 (2× the bf16 rate on
        v5e). ``calibration_images`` — uint8 [N,h,w,3], N ≥ max_batch;
        consumed in max_batch-sized windows for activation-scale calibration.

        ``state_path``: persistent calibration artifact (JSON). If the file
        exists it is the calibration of record — loaded and validated against
        this model's graph, observe passes skipped, ``calibration_images``
        not required. Otherwise the scales derived from the images are
        written there (atomically), so a serving restart quantizes without
        re-calibrating and deployed scales are reproducible. Pass a fresh
        path (or none) to force re-calibration.

        Returns the QuantReport. Call warmup() after to pre-compile."""
        import json
        import os

        from weaklysuperviseddl_tpu.ops.quant import Int8Quantizer

        def fn(images_uint8):
            # the SAME body as predict_masks — via the shared helper
            return _serve_forward(self.model, self.params, self.batch_stats,
                                  images_uint8, self.size, self.clean,
                                  self.packed)

        if state_path and os.path.exists(state_path):
            example = (jnp.zeros(
                (self.max_batch, self.size, self.size, 3), jnp.uint8),)
            q = Int8Quantizer(fn, example)
            with open(state_path) as f:
                q.load_calibration(json.load(f))
        else:
            if calibration_images is None:
                raise ValueError(
                    "quantize() needs calibration_images when state_path is "
                    "unset or does not exist yet")
            imgs = np.asarray(calibration_images)
            n = imgs.shape[0]
            total = -(-n // self.max_batch) * self.max_batch
            if total != n:
                # pad the ragged tail window by tiling so every calibration
                # image is observed (a silent drop would calibrate on a subset)
                imgs = np.concatenate([imgs] * -(-total // n))[:total]
            example = (jnp.asarray(imgs[: self.max_batch]),)
            q = Int8Quantizer(fn, example)
            for i in range(0, imgs.shape[0], self.max_batch):
                q.observe(jnp.asarray(imgs[i : i + self.max_batch]))
            if state_path:
                tmp = state_path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(q.calibration_state(), f)
                os.replace(tmp, state_path)
        qfn, report = q.build(clip_ratio=clip_ratio)
        self._quantized = qfn  # already jit-backed, weights as runtime args
        return report

    def _dispatch(self, images):
        if self.mesh is not None:
            # batch sharded on 'data', params replicated — GSPMD partitions
            # the whole serving program; each chip runs its batch slice
            images = jax.device_put(images, self._in_sharding)
        if self._quantized is not None:
            return self._quantized(images)
        return predict_masks(self.model, self.params, self.batch_stats,
                             images, size=self.size, clean=self.clean,
                             pack=self.packed)

    def _to_host(self, dev) -> np.ndarray:
        host = np.asarray(dev)
        if self.packed:
            host = np.unpackbits(host, axis=-1)
        return host

    def dispatch_async(self, images: np.ndarray):
        """Pad to the serving bucket and dispatch WITHOUT readback: returns
        ``(device_result, n)``. JAX dispatch is asynchronous, so this returns
        as soon as the transfer+compute are enqueued — the caller overlaps
        further dispatches with device work and later calls ``readback``.
        This is the primitive the MaskServer worker pipelines on; round 4
        measured the blocking per-call round trip at ~25 ms dispatch latency
        against ~2.4 ms of compute (BASELINE.md)."""
        n = images.shape[0]
        assert n <= self.max_batch, f"batch {n} exceeds max_batch {self.max_batch}"
        bucket = self._bucket(n)
        if n < bucket:
            pad = np.repeat(images[-1:], bucket - n, axis=0)
            images = np.concatenate([images, pad])
        return self._dispatch(jnp.asarray(images)), n

    def readback(self, dev, n: int) -> np.ndarray:
        """Blocking host readback of a ``dispatch_async`` result (unpacks
        bitmaps, strips bucket padding)."""
        return self._to_host(dev)[:n]

    def __call__(self, images: np.ndarray) -> np.ndarray:
        return self.readback(*self.dispatch_async(images))

    def serve_http(self, host: str = "127.0.0.1", port: int = 0,
                   max_wait_ms: float = 5.0, **server_kwargs) -> "MaskServer":
        """Start an HTTP front for this predictor (returns a started
        MaskServer; .port, .stop()). See MaskServer for the protocol;
        ``server_kwargs`` forward to it (in_flight, max_queue,
        max_body_bytes, request_timeout_s)."""
        server = MaskServer(self, host=host, port=port,
                            max_wait_ms=max_wait_ms, **server_kwargs)
        server.start()
        return server

    def predict_many(self, images: np.ndarray, in_flight: int = 4) -> np.ndarray:
        """Throughput path for [N,h,w,3] uint8, N unbounded: split into
        ``max_batch`` chunks and keep up to ``in_flight`` dispatches pending
        before each blocking readback. JAX dispatch is asynchronous, so the
        device computes chunk i while the host uploads chunk i+1 and reads
        back chunk i-k — one __call__ per chunk would instead serialize a
        full upload→compute→readback round-trip each time (the measured
        per-call cost on this relay is ~25 ms of pure dispatch latency
        against ~2.4 ms of compute at batch 8, 224²; see BASELINE.md)."""
        from collections import deque

        n = images.shape[0]
        out = None
        pending: deque = deque()  # (start, in-flight device result, count)

        def drain_one():
            nonlocal out
            s0, dev, c0 = pending.popleft()
            host = self.readback(dev, c0)
            if out is None:
                out = np.empty((n,) + host.shape[1:], host.dtype)
            out[s0 : s0 + c0] = host

        for s in range(0, n, self.max_batch):
            dev, c = self.dispatch_async(images[s : s + self.max_batch])
            pending.append((s, dev, c))
            if len(pending) > in_flight:
                drain_one()
        while pending:
            drain_one()
        return out


class MaskServer:
    """Minimal production-style HTTP front with dynamic micro-batching.

    Protocol (binary, dependency-free): POST /predict with an ``np.save``-
    serialized uint8 [h,w,3] image body → 200 with an ``np.save``-serialized
    uint8 {0,1} [size,size] mask body. Compressed WAN-friendly variants:
    a request with ``Content-Type: image/*`` is PIL-decoded (PNG/JPEG —
    15-130 KB instead of 196 KB for a 256² image), and ``Accept: image/png``
    returns the mask as a 1-bit PNG (~1-3 KB instead of 65 KB; pixels
    0/255). Malformed bodies get 400, unknown paths 404.
    GET /healthz → 200 JSON (readiness: device, program config);
    GET /stats → 200 JSON (cumulative requests/dispatches/images served,
    mean coalesced batch size, uptime) — the probe surface a load balancer
    or dashboard scrapes.

    Requests arriving within ``max_wait_ms`` of each other coalesce into one
    device dispatch (up to ``predictor.max_batch`` — the compiled program is
    fixed-batch, so coalescing is free until the pad fills with real work).
    Same-shape requests batch together; mixed shapes are dispatched as
    separate groups in arrival order.

    The device path is PIPELINED (round-5 fix for the round-4 measured
    defect: the worker called the blocking per-call path, serializing
    upload→compute→readback per dispatch, so the HTTP front delivered
    67 img/s from a device serving 3,000+). A dispatch thread owns the
    device and keeps up to ``in_flight`` asynchronous dispatches pending
    (Predictor.dispatch_async); a separate drain thread blocks on readbacks
    and completes requests — so the next coalesce window opens, and the next
    upload streams, while the device computes. The in-flight queue is
    bounded: when the device falls ``in_flight`` dispatches behind, the
    dispatch thread blocks instead of buffering device memory unboundedly.

    Overload protection (a server without it converts saturation into
    unbounded latency and memory):
    - request queue bounded at ``max_queue``; a full queue sheds with
      503 + Retry-After instead of queueing forever (round 4's 963 ms p50
      at saturation was exactly unbounded queue depth),
    - Content-Length capped at ``max_body_bytes`` → 413 before the body is
      read (an unbounded ``rfile.read`` lets one client exhaust host memory),
    - each accepted request waits at most ``request_timeout_s`` for its
      result → 504 (no orphaned handler threads when the device wedges).
    GET /stats reports shed/rejected/timeout counters and per-request
    latency p50/p90/p99 over a 4096-request ring buffer, so the SLO is
    monitorable in-process without an external bench.

    The reference has no serving story; this is the deployment-shaped lid on
    the Predictor stack (static-shape program + int8 PTQ + packed readback +
    dp mesh), sized for tests and single-host use — production fleets would
    front it with a real RPC layer, but the batching/device discipline is
    exactly this.
    """

    def __init__(self, predictor: Predictor, host: str = "127.0.0.1",
                 port: int = 0, max_wait_ms: float = 5.0,
                 in_flight: int = 4, max_queue: int = 256,
                 max_body_bytes: int = 32 << 20,
                 request_timeout_s: float = 60.0):
        self.predictor = predictor
        self.host = host
        self._port = port
        self.max_wait_ms = max_wait_ms
        self.in_flight = in_flight
        self.max_queue = max_queue
        self.max_body_bytes = max_body_bytes
        self.request_timeout_s = request_timeout_s
        self._server = None
        self._threads = []
        self._queue = None
        # per-dispatch coalesced batch sizes (observability: micro-batching
        # under load is a measured property, tests/bench assert on it).
        # Bounded: a long-lived server must not accumulate one entry per
        # dispatch forever (the same rationale as the BoundedCache program
        # memos); 65536 dispatches of history is plenty for any probe window.
        from collections import deque

        self.dispatch_sizes: deque[int] = deque(maxlen=65536)
        # cumulative counters for GET /stats (never cleared by probes);
        # handler threads and the worker both write, so guard with a lock —
        # int += under the GIL can still drop counts across threads
        import threading

        self.total_requests = 0
        self.total_dispatches = 0
        self.total_images = 0
        self.total_shed = 0        # 503: request queue full
        self.total_rejected = 0    # 413: body over max_body_bytes
        self.total_timeouts = 0    # 504: result not ready in request_timeout_s
        self._stats_lock = threading.Lock()
        self._started_at = None
        # per-request wall latency (accept → result ready), seconds; ring
        # buffer — percentiles are computed on /stats scrape, appends are
        # deque-atomic so handler threads don't contend on the stats lock
        self.latencies_s: deque[float] = deque(maxlen=4096)

    def drain_dispatch_sizes(self) -> list[int]:
        """Return and clear the recorded per-dispatch batch sizes — the
        race-free way for a probe to attribute dispatches to its own window."""
        sizes = list(self.dispatch_sizes)
        self.dispatch_sizes.clear()
        return sizes

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    def start(self):
        import io
        import queue
        import threading
        import time
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        pred = self.predictor
        # bounded: a full queue sheds 503 at do_POST instead of growing
        # latency with depth forever (round-4 E2E_SERVE_LATENCY defect)
        q = self._queue = queue.Queue(maxsize=self.max_queue)
        inflight = queue.Queue(maxsize=self.in_flight)
        max_wait_s = self.max_wait_ms / 1e3
        dispatch_sizes = self.dispatch_sizes
        server = self
        self._started_at = time.monotonic()

        class _Job:
            __slots__ = ("img", "event", "result", "error")

            def __init__(self, img):
                self.img = img
                self.event = threading.Event()
                self.result = None
                self.error = None

        def dispatcher():
            # Owns the device. Coalesces, dispatches ASYNCHRONOUSLY, hands
            # (chunk, device_result) to the drain thread; the bounded
            # inflight queue is the backpressure: at most ``in_flight``
            # dispatches pending before this thread blocks.
            stopping = False
            while not stopping:
                job = q.get()
                if job is None:
                    break
                batch = [job]
                deadline = time.monotonic() + max_wait_s
                while len(batch) < pred.max_batch:
                    now = time.monotonic()
                    if now >= deadline and not inflight.full():
                        break
                    # adaptive window: past the deadline, dispatching would
                    # BLOCK on the full in-flight queue anyway — keep
                    # coalescing instead, so batches grow exactly when the
                    # device is the bottleneck (measured round 5: the fast
                    # pipelined drain shrank 64-client coalesced batches
                    # 31→10 and per-dispatch upload overhead ate the win;
                    # this recovers max-batch dispatches at saturation)
                    try:
                        nxt = q.get(timeout=(deadline - now)
                                    if now < deadline else 0.005)
                    except queue.Empty:
                        # re-check with a FRESH clock: a get that timed out
                        # AT the deadline must fall into the adaptive window
                        # (the stale pre-get `now` would break out, dispatch
                        # the lone job, and block in inflight.put — exactly
                        # the coalescing forfeit the window exists to avoid)
                        if inflight.full() and time.monotonic() >= deadline:
                            continue
                        break
                    if nxt is None:
                        # finish this batch, then exit (don't re-put: with a
                        # bounded queue a re-put can deadlock against full)
                        stopping = True
                        break
                    batch.append(nxt)
                # same-shape groups dispatch together (the compiled program
                # is per-input-shape); groups run in arrival order
                groups = {}
                for b in batch:
                    groups.setdefault(b.img.shape, []).append(b)
                for jobs in groups.values():
                    for s in range(0, len(jobs), pred.max_batch):
                        chunk = jobs[s : s + pred.max_batch]
                        dispatch_sizes.append(len(chunk))
                        with server._stats_lock:
                            server.total_dispatches += 1
                            server.total_images += len(chunk)
                        try:
                            dev, n = pred.dispatch_async(
                                np.stack([b.img for b in chunk]))
                        except Exception as e:  # surface as 500, keep serving
                            for b in chunk:
                                b.error = e
                                b.event.set()
                            continue
                        inflight.put((chunk, dev, n))
            inflight.put(None)

        def drainer():
            # Blocks on device readbacks and completes requests, so the
            # dispatcher's next coalesce window opens while the device
            # computes — the predict_many discipline, as a server.
            while True:
                item = inflight.get()
                if item is None:
                    return
                chunk, dev, n = item
                try:
                    masks = pred.readback(dev, n)
                    for b, m in zip(chunk, masks):
                        b.result = m
                except Exception as e:  # surface as 500, keep serving
                    for b in chunk:
                        b.error = e
                for b in chunk:
                    b.event.set()

        class Handler(BaseHTTPRequestHandler):
            # HTTP/1.1 persistent connections: every response sets
            # Content-Length (send_error composes its own and closes), so a
            # client can reuse one TCP connection for its whole session —
            # at 64-256 closed-loop clients the per-request connect +
            # thread-spawn churn of HTTP/1.0 was pure overhead on the
            # serving host. Idle connections are reaped by the socket
            # timeout (close_connection on timeout).
            protocol_version = "HTTP/1.1"
            timeout = 60

            def do_GET(self):
                import json as _json

                if self.path == "/healthz":
                    body = _json.dumps({
                        "status": "ok",
                        "size": pred.size,
                        "max_batch": pred.max_batch,
                        "buckets": pred.buckets(),
                        "int8": pred._quantized is not None,
                        "packed": pred.packed,
                    }).encode()
                elif self.path == "/stats":
                    with server._stats_lock:
                        n_req, n_disp, n_img = (server.total_requests,
                                                server.total_dispatches,
                                                server.total_images)
                        n_shed, n_rej, n_to = (server.total_shed,
                                               server.total_rejected,
                                               server.total_timeouts)
                    lat = list(server.latencies_s)  # ring-buffer snapshot
                    stats = {
                        "total_requests": n_req,
                        "total_dispatches": n_disp,
                        "total_images": n_img,
                        "total_shed_503": n_shed,
                        "total_rejected_413": n_rej,
                        "total_timeouts_504": n_to,
                        "queue_depth": q.qsize(),
                        "mean_dispatch_size": n_img / n_disp if n_disp else 0.0,
                        "uptime_s": round(
                            time.monotonic() - server._started_at, 3),
                    }
                    if lat:
                        ms = np.percentile(
                            np.asarray(lat) * 1e3, [50, 90, 99])
                        stats.update({
                            "latency_window": len(lat),
                            "latency_p50_ms": round(float(ms[0]), 1),
                            "latency_p90_ms": round(float(ms[1]), 1),
                            "latency_p99_ms": round(float(ms[2]), 1),
                        })
                    body = _json.dumps(stats).encode()
                else:
                    self.send_error(404, "GET /healthz or /stats")
                    return
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                if self.path != "/predict":
                    self.send_error(404, "POST /predict")
                    return
                with server._stats_lock:
                    server.total_requests += 1
                t_accept = time.monotonic()
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    if n < 0 or n > server.max_body_bytes:
                        # reject BEFORE reading: trusting Content-Length
                        # into rfile.read lets one client exhaust host memory
                        # (a NEGATIVE length would turn read(n) into an
                        # unbounded read-to-EOF — same exhaustion, so it is
                        # rejected by the same guard)
                        with server._stats_lock:
                            server.total_rejected += 1
                        self.send_error(
                            413, f"body {n} bytes exceeds cap "
                                 f"{server.max_body_bytes}")
                        return
                    raw = self.rfile.read(n)
                    ctype = (self.headers.get("Content-Type") or
                             "application/octet-stream").split(";")[0].strip()
                    if ctype.startswith("image/"):
                        # compressed client bodies (PNG/JPEG/…): a WAN client
                        # sends 15-130 KB instead of the 196 KB np.save of a
                        # 256² image; decode on the host, dispatch identically
                        from PIL import Image

                        img = np.asarray(
                            Image.open(io.BytesIO(raw)).convert("RGB"),
                            np.uint8)
                    else:
                        img = np.load(io.BytesIO(raw), allow_pickle=False)
                    assert img.ndim == 3 and img.shape[-1] == 3, img.shape
                    assert img.dtype == np.uint8, img.dtype
                except Exception:
                    self.send_error(
                        400, "body must be np.save of uint8 [h,w,3], or a "
                             "PNG/JPEG with Content-Type: image/*")
                    return
                job = _Job(img)
                try:
                    q.put_nowait(job)
                except queue.Full:
                    # shed instead of queueing: at saturation a bounded
                    # queue keeps accepted-request latency bounded; clients
                    # retry after backoff (Retry-After) — round 4's 963 ms
                    # p50 was unbounded depth
                    with server._stats_lock:
                        server.total_shed += 1
                    body = b"server overloaded, retry\n"
                    self.send_response(503)
                    self.send_header("Retry-After", "1")
                    self.send_header("Content-Type", "text/plain")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                if not job.event.wait(server.request_timeout_s):
                    with server._stats_lock:
                        server.total_timeouts += 1
                    self.send_error(
                        504, f"no result in {server.request_timeout_s}s")
                    return
                if job.error is not None:
                    self.send_error(500, str(job.error))
                    return
                # only SUCCESSFUL requests enter the /stats SLO percentiles:
                # during a device-fault episode, fast-failing 500s would
                # otherwise make the latency ring buffer look healthy
                # exactly when the server is erroring
                server.latencies_s.append(time.monotonic() - t_accept)
                accept = (self.headers.get("Accept") or "").lower()
                buf = io.BytesIO()
                if "image/png" in accept:
                    # 1-bit PNG mask: ~1-3 KB vs the 65 KB np.save — the
                    # downlink twin of the compressed request body
                    from PIL import Image

                    Image.fromarray(
                        (job.result > 0).astype(np.uint8) * 255, "L"
                    ).convert("1").save(buf, format="PNG")
                    out_type = "image/png"
                else:
                    np.save(buf, job.result)
                    out_type = "application/octet-stream"
                body = buf.getvalue()
                self.send_response(200)
                self.send_header("Content-Type", out_type)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args):  # quiet: the server is a library
                pass

        class _Server(ThreadingHTTPServer):
            # stdlib default backlog is 5: a burst of >5 simultaneous
            # connects gets RST before accept() runs (measured: 88 resets
            # at 64 closed-loop clients, E2E_SERVE_LATENCY round 4)
            request_queue_size = 128

        self._server = _Server((self.host, self._port), Handler)
        for target in (dispatcher, drainer, self._server.serve_forever):
            t = threading.Thread(target=target, daemon=True)
            t.start()
            self._threads.append(t)
        return self

    def stop(self):
        self._server.shutdown()
        # release the listening socket now, not at GC. ThreadingHTTPServer is
        # daemon-threaded and socketserver._Threads.append skips daemon
        # threads, so server_close() cannot block on keep-alive handler
        # threads idling in readline() (verified against this stdlib)
        self._server.server_close()
        self._queue.put(None)
        for t in self._threads:
            t.join(timeout=5)


class MaskClient:
    """Stdlib-only client for the MaskServer protocol — the reference
    implementation of the wire format, so callers don't hand-roll
    urllib + np.save (and so protocol changes break a test here, not a
    user's deploy script).

    ``wire="npy"`` (default) POSTs ``np.save`` bodies and reads ``np.save``
    masks — the lowest-latency localhost encoding. ``wire="png"`` sends the
    image as a PNG (``Content-Type: image/png``) and asks for the mask as a
    1-bit PNG (``Accept: image/png``) — the WAN encoding (~15-130 KB up,
    1-3 KB down per 256² image vs 196 KB / 65 KB raw). Both return the
    same uint8 {0,1} [size, size] mask (bit-equal: the server decodes PNG
    requests to the identical uint8 array before dispatch).

    One TCP connection per client instance (HTTP/1.1 keep-alive against the
    MaskServer's persistent handler); a stale/closed connection is rebuilt
    transparently, and HTTP error statuses still raise
    ``urllib.error.HTTPError`` so existing callers (cli client command) see
    the urllib semantics. NOT thread-safe — use one MaskClient per thread.
    """

    def __init__(self, base_url: str, wire: str = "npy",
                 timeout: float = 120.0):
        import urllib.parse

        assert wire in ("npy", "png"), wire
        self.base_url = base_url.rstrip("/")
        self.wire = wire
        self.timeout = timeout
        self._conn = None
        u = urllib.parse.urlsplit(self.base_url)
        assert u.scheme in ("http", "https"), (
            f"base_url must be http(s)://…, got {base_url!r}")
        self._scheme = u.scheme
        self._netloc = u.netloc
        self._host = u.hostname
        self._port = u.port  # None → scheme default (80/443)
        # path prefix survives (e.g. a reverse proxy mounting the server at
        # http://host/masks → requests go to /masks/predict)
        self._prefix = u.path.rstrip("/")

    def _request(self, method: str, path: str, body=None,
                 headers: dict | None = None):
        """Issue one request on the persistent connection. Returns
        (response_headers, raw_body); raises urllib.error.HTTPError on
        HTTP >= 400 (urllib compatibility) and OSError kin on transport
        failure. Retries ONCE on a stale kept-alive connection (the server
        may have reaped it between requests)."""
        import http.client
        import urllib.error

        path = self._prefix + path
        for attempt in (0, 1):
            try:
                if self._conn is None:
                    conn_cls = (http.client.HTTPSConnection
                                if self._scheme == "https"
                                else http.client.HTTPConnection)
                    self._conn = conn_cls(
                        self._host, self._port, timeout=self.timeout)
                self._conn.request(method, path, body=body,
                                   headers=headers or {})
                r = self._conn.getresponse()
                raw = r.read()  # drain fully so the connection is reusable
                if r.will_close:
                    self._conn.close()
                    self._conn = None
                if r.status >= 400:
                    raise urllib.error.HTTPError(
                        f"{self._scheme}://{self._netloc}{path}",
                        r.status, r.reason, r.headers, io.BytesIO(raw))
                return r.headers, raw
            except urllib.error.HTTPError:
                raise  # a real HTTP response, not a transport failure
            except (http.client.HTTPException, ConnectionError,
                    TimeoutError, OSError):
                if self._conn is not None:
                    self._conn.close()
                    self._conn = None
                if attempt:
                    raise

    def close(self):
        if self._conn is not None:
            self._conn.close()
            self._conn = None

    def _post(self, body: bytes, headers: dict) -> "np.ndarray":
        rheaders, raw = self._request("POST", "/predict", body=body,
                                      headers=headers)
        ctype = rheaders.get("Content-Type", "")
        if ctype == "image/png":
            from PIL import Image

            return (np.asarray(Image.open(io.BytesIO(raw)).convert("L"))
                    > 0).astype(np.uint8)
        return np.load(io.BytesIO(raw), allow_pickle=False)

    def predict(self, image: "np.ndarray") -> "np.ndarray":
        """uint8 [h,w,3] image → uint8 {0,1} [size,size] mask."""
        img = np.ascontiguousarray(image, np.uint8)
        assert img.ndim == 3 and img.shape[-1] == 3, img.shape
        buf = io.BytesIO()
        if self.wire == "png":
            from PIL import Image

            Image.fromarray(img).save(buf, format="PNG")
            headers = {"Content-Type": "image/png", "Accept": "image/png"}
        else:
            np.save(buf, img)
            headers = {}
        return self._post(buf.getvalue(), headers)

    def predict_file(self, path: str) -> "np.ndarray":
        """Send an on-disk PNG/JPEG AS-IS (no local decode/re-encode);
        the server decodes. Mask comes back in this client's wire format."""
        import mimetypes

        ctype = mimetypes.guess_type(path)[0] or "image/png"
        assert ctype.startswith("image/"), f"{path}: not an image ({ctype})"
        with open(path, "rb") as f:
            body = f.read()
        headers = {"Content-Type": ctype}
        if self.wire == "png":
            headers["Accept"] = "image/png"
        return self._post(body, headers)

    def _get_json(self, path: str) -> dict:
        import json

        _, raw = self._request("GET", path)
        return json.loads(raw)

    def healthz(self) -> dict:
        return self._get_json("/healthz")

    def stats(self) -> dict:
        return self._get_json("/stats")
