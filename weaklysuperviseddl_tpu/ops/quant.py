"""Graph-level int8 post-training quantization for serving.

The reference has no serving story at all (its closest analogue is the eval
loop in SegmentationModel.py:125-159 and the BASNet script RunInference.py);
this module is the TPU-native production path: take ANY jittable inference
function — DeepLabV3 serving, BASNet saliency, the classifier forward — and
rewrite every weight matmul/conv in its jaxpr to run on the MXU in int8.
On v5e the int8 systolic array runs at 2× the bf16 rate, but an inference
forward is only partly MXU-bound, so the graph-level win is smaller and
batch-dependent — measured on the real chip (DeepLabV3-RN50 2-class fwd,
224², vs bf16): 1.30× at batch 32, 1.20× at batch 64, 1.14× at batch 8;
mask agreement with fp32 serving 0.997 on a trained model (>0.99 bar in
tests/test_quant.py). Note the end-to-end `Predictor` call on this relay
is dispatch-bound (≈2.4 ms compute inside a ≈60 ms call), so the int8 win
shows up under sustained in-process batching, not per-call latency.

Scheme (standard symmetric PTQ):
  * weights: per-output-channel symmetric int8, scales folded into the
    conv epilogue (computed ONCE at build time from the captured jaxpr's
    concrete weight values — no per-call quantization cost);
  * activations: per-tensor symmetric int8, scale = running absmax over a
    user-supplied calibration set (one compiled pass per batch), optionally
    tempered by a clip ratio;
  * accumulate int32 on the MXU, rescale by (s_x · s_w[c]) in float, cast
    back to the op's original output dtype so every surrounding op (BN
    affine, relu, residual add, resize) is numerically untouched.

Only top-level ``conv_general_dilated`` / ``dot_general`` equations whose
rhs is input-independent (i.e. actual weights — established by taint
analysis from the function's inputs) are rewritten; everything else,
including ops inside nested jits (e.g. the bilinear resize), replays
unchanged. The pass is therefore safe-by-default: an equation it cannot
prove quantizable stays in float.

Scale note: the captured weights (jaxpr consts) and the quantized weight
tables are threaded through every compiled pass as runtime ARGUMENTS, never
as program constants — baked consts travel inside each compile request and
executable, which breaks RPC-compiled backends on big models (BASNet's
350 MB of fp32 consts drew HTTP 413 from this environment's relay) and
defeats executable caching. With weights as arguments the programs stay
small and the weight upload happens once.

Used by pipelines/serve.Predictor.quantize(calibration_images) — see there
for the end-to-end serving integration and tests/test_quant.py for the
contract.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.extend import core


def _eval_eqn_default(eqn, invals):
    """Replay one jaxpr equation unchanged (the jax.core.eval_jaxpr recipe —
    get_bind_params splits higher-order params like pjit's jaxpr into bind
    positions)."""
    subfuns, bind_params = eqn.primitive.get_bind_params(eqn.params)
    out = eqn.primitive.bind(*subfuns, *invals, **bind_params)
    return out if isinstance(out, (list, tuple)) else [out]


def _interpret(jaxpr, consts, args, handler):
    """eval_jaxpr with a per-equation hook. handler(i, eqn, invals) returns
    a list of outputs to override the equation, or None to replay it."""
    env = {}

    def read(v):
        return v.val if isinstance(v, core.Literal) else env[v]

    for v, c in zip(jaxpr.constvars, consts):
        env[v] = c
    for v, a in zip(jaxpr.invars, args):
        env[v] = a
    for i, eqn in enumerate(jaxpr.eqns):
        invals = [read(v) for v in eqn.invars]
        out = handler(i, eqn, invals)
        if out is None:
            out = _eval_eqn_default(eqn, invals)
        for v, val in zip(eqn.outvars, out):
            env[v] = val
    return [read(v) for v in jaxpr.outvars]


def _input_tainted_vars(jaxpr):
    """Set of vars (transitively) derived from the jaxpr's invars. A conv/dot
    rhs OUTSIDE this set is input-independent — i.e. weights."""
    tainted = set(jaxpr.invars)
    for eqn in jaxpr.eqns:
        if any((not isinstance(v, core.Literal)) and v in tainted for v in eqn.invars):
            tainted.update(eqn.outvars)
    return tainted


def _conv_dims(eqn):
    """(rhs_out_feature_dim, out_feature_dim) of a conv equation."""
    dn = eqn.params["dimension_numbers"]
    return dn.rhs_spec[0], dn.out_spec[1]


def _dot_quantizable(eqn):
    """True for a plain single-contraction, no-batch-dims dot with a rank-2
    rhs (an activation @ weight-matrix product)."""
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    rhs = eqn.invars[1].aval
    return (
        len(lc) == 1 and len(rc) == 1 and not lb and not rb and len(rhs.shape) == 2
    )


def _dot_dims(eqn):
    """(rhs_out_feature_dim, out_feature_dim) of a quantizable dot: the rhs
    non-contracted dim maps to the LAST output dim (lax.dot_general output
    layout is batch dims, lhs free dims, rhs free dims)."""
    (_, rc), _ = eqn.params["dimension_numbers"]
    rhs_out = 1 - rc[0]
    out_rank = len(eqn.outvars[0].aval.shape)
    return rhs_out, out_rank - 1


_FLOATS = (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.float16))


def _quantizable_eqns(jaxpr):
    """Indices of equations the pass will rewrite, with their kind."""
    tainted = _input_tainted_vars(jaxpr)

    def is_weight(v):
        return isinstance(v, core.Literal) or v not in tainted

    out = {}
    for i, eqn in enumerate(jaxpr.eqns):
        name = str(eqn.primitive)
        if name not in ("conv_general_dilated", "dot_general"):
            continue
        lhs, rhs = eqn.invars[0], eqn.invars[1]
        if lhs.aval.dtype not in _FLOATS or rhs.aval.dtype not in _FLOATS:
            continue
        if is_weight(lhs) or not is_weight(rhs):
            continue  # need activation @ weight
        if name == "conv_general_dilated":
            if eqn.params.get("feature_group_count", 1) != 1:
                continue
            if eqn.params.get("batch_group_count", 1) != 1:
                continue
            out[i] = "conv"
        else:
            if _dot_quantizable(eqn):
                out[i] = "dot"
    return out


def _quantize_weight(w, out_dim):
    """Per-output-channel symmetric int8. Returns (q [int8], scale [F] f32)."""
    w = w.astype(jnp.float32)
    reduce_dims = tuple(d for d in range(w.ndim) if d != out_dim)
    amax = jnp.max(jnp.abs(w), axis=reduce_dims)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    shape = [1] * w.ndim
    shape[out_dim] = -1
    q = jnp.clip(jnp.round(w / scale.reshape(shape)), -127, 127).astype(jnp.int8)
    return q, scale


def _quantize_act(x, scale):
    # ``scale`` is the dequantization step (absmax/127): q = round(x/scale)
    inv = 1.0 / scale
    return jnp.clip(
        jnp.round(x.astype(jnp.float32) * inv), -127, 127
    ).astype(jnp.int8)


@dataclass
class QuantReport:
    """What the pass did — one row per rewritten equation."""

    rows: list = field(default_factory=list)

    def __str__(self):
        lines = [f"{len(self.rows)} equations quantized to int8:"]
        for r in self.rows:
            lines.append(
                f"  [{r['eqn']:3d}] {r['kind']:4s} lhs{r['lhs']} rhs{r['rhs']}"
                f" act_scale={r['act_scale']:.3e}"
            )
        return "\n".join(lines)


class Int8Quantizer:
    """Three-phase PTQ driver for one inference function.

    >>> q = Int8Quantizer(fn, example_args)
    >>> for batch in calibration_batches: q.observe(*batch)
    >>> qfn = q.build()          # jittable, same signature/outputs as fn

    ``fn`` must be jit-traceable with weights CLOSED OVER (so they appear as
    jaxpr constants, not inputs): ``lambda images: model.apply(vars, images)``.

    Shape handling: the pass replays a captured jaxpr, so each distinct input
    shape gets its own trace (cached). Calibration batches and the serving
    shape may differ (e.g. calibrate on batch 8, serve batch 16) — quantized
    equations are aligned ACROSS traces by position, which is stable for
    batch-size changes of the same graph; a structural mismatch raises.
    """

    def __init__(self, fn: Callable, example_args: Sequence[Any]):
        self._fn = fn
        self._traces = {}  # shapes-key -> (jaxpr, targets, out_tree, calib_fn)
        self._consts = None  # the fn's closed-over weights, as jit ARGUMENTS
        jaxpr, targets, _, _ = self._trace(example_args)
        self._example_args = tuple(example_args)
        self._n_targets = len(targets)
        self._amax = np.zeros(self._n_targets, np.float64)

    @staticmethod
    def _key(args):
        # dtype via attribute/np — jnp.asarray here would upload every numpy
        # arg to the device once per call just to read its dtype
        def dt(a):
            d = getattr(a, "dtype", None)
            return str(d) if d is not None else str(np.asarray(a).dtype)

        return tuple((tuple(np.shape(a)), dt(a)) for a in args)

    def _trace(self, args):
        key = self._key(args)
        hit = self._traces.get(key)
        if hit is not None:
            return hit
        # abstract the args so tracing works from inside a jit as well
        specs = [jax.ShapeDtypeStruct(np.shape(a), jnp.result_type(a)) for a in args]
        closed, out_shape = jax.make_jaxpr(self._fn, return_shape=True)(*specs)
        jaxpr, consts = closed.jaxpr, closed.consts
        out_tree = jax.tree.structure(out_shape)
        if self._consts is None:
            # keep ONE device-resident copy; every compiled pass takes these
            # as runtime arguments, never as program constants — baked consts
            # ship inside each compile request/executable, which exceeds RPC
            # compile limits for big models (BASNet's 350 MB of fp32 weights
            # drew HTTP 413 from the relay) and bloats the program cache.
            self._consts = [jnp.asarray(c) for c in consts]
            self._const_sig = [(np.shape(c), jnp.result_type(c)) for c in consts]
        elif [(np.shape(c), jnp.result_type(c)) for c in consts] != self._const_sig:
            # consts are positionally aligned across traces (same fn, same
            # closure capture order); a count/shape/dtype drift would mis-bind
            # weights to constvars silently — fail loudly instead
            raise ValueError(
                "input shape changes the traced constants — calibrate and "
                "serve with structurally identical shapes")
        targets = _quantizable_eqns(jaxpr)
        if self._traces:
            n0 = next(iter(self._traces.values()))
            if len(targets) != len(n0[1]) or [targets[i] for i in sorted(targets)] != [
                n0[1][i] for i in sorted(n0[1])
            ]:
                raise ValueError(
                    "input shape changes the set of quantizable equations — "
                    "calibrate and serve with structurally identical shapes"
                )

        # one compiled pass: replay the graph, emit |lhs| maxima as extras
        def calib(consts_, args_):
            obs = {}

            def handler(i, eqn, invals):
                if i in targets:
                    obs[i] = jnp.max(jnp.abs(invals[0].astype(jnp.float32)))
                return None

            _interpret(jaxpr, consts_, args_, handler)
            return [obs[i] for i in sorted(targets)]

        entry = (jaxpr, targets, out_tree, jax.jit(calib))
        self._traces[key] = entry
        return entry

    @property
    def num_targets(self) -> int:
        return self._n_targets

    def calibration_state(self) -> dict:
        """The calibration as a portable JSON-able artifact: per-target
        activation absmax plus a structural fingerprint of the quantized
        graph. Persist it next to the serving checkpoint; a fresh process
        re-creates the quantizer from the same model and adopts it with
        ``load_calibration`` — skipping the observe passes (and their
        calibration-program compile), and making deployed scales a
        reproducible artifact instead of a per-restart re-derivation."""
        jaxpr, targets, _, _ = self._trace(self._example_args)
        return {
            "version": 1,
            "n_targets": self._n_targets,
            "kinds": [targets[i] for i in sorted(targets)],
            # weight (rhs) shapes pin the architecture batch-independently —
            # calibrate-at-8/serve-at-64 stays loadable, a different model
            # does not. Same-architecture different-weights still loads: the
            # amax is a property of the calibration data distribution, and
            # which checkpoint it applies to is the caller's deployment
            # decision, like the calibration set itself.
            "weight_shapes": [
                [int(d) for d in jaxpr.eqns[i].invars[1].aval.shape]
                for i in sorted(targets)
            ],
            "amax": [float(a) for a in self._amax],
        }

    def load_calibration(self, state: dict) -> None:
        """Adopt a ``calibration_state()`` artifact instead of observing
        batches. The structural fingerprint must match this function's
        quantizable graph — loading scales into a different graph would
        silently mis-scale activations, so a mismatch raises."""
        jaxpr, targets, _, _ = self._trace(self._example_args)
        kinds = [targets[i] for i in sorted(targets)]
        wshapes = [[int(d) for d in jaxpr.eqns[i].invars[1].aval.shape]
                   for i in sorted(targets)]
        if state.get("version") != 1:
            raise ValueError(
                f"unknown calibration state version {state.get('version')!r}")
        if (state.get("n_targets") != self._n_targets
                or state.get("kinds") != kinds
                or state.get("weight_shapes") != wshapes):
            raise ValueError(
                "calibration state does not match this function's quantizable "
                f"graph: state has {state.get('n_targets')} targets "
                f"{state.get('kinds')} / weight shapes "
                f"{state.get('weight_shapes')}, function has "
                f"{self._n_targets} {kinds} / {wshapes}")
        amax = np.asarray(state.get("amax", ()), np.float64)
        if amax.shape != (self._n_targets,) or not np.all(np.isfinite(amax)) \
                or np.any(amax < 0):
            raise ValueError(
                "calibration amax must be one finite non-negative value per "
                "target")
        if not amax.any():
            raise ValueError("calibration state is uncalibrated (all-zero amax)")
        self._amax = amax

    def observe(self, *args) -> None:
        """Run one calibration batch; fold its per-equation absmax into the
        running maxima (aligned by position across input shapes)."""
        _, _, _, calib = self._trace(args)
        vals = calib(self._consts, tuple(args))
        for k, v in enumerate(vals):
            self._amax[k] = max(self._amax[k], float(v))

    def build(self, clip_ratio: float = 1.0):
        """Freeze scales and return (qfn, report). ``clip_ratio`` scales the
        observed absmax (e.g. 0.99 trims the extreme tail). The returned qfn
        is shape-polymorphic: each distinct input shape re-traces the float
        graph (cached) and replays it with the SAME positional weights and
        activation scales. qfn is already jit-backed, with weights passed as
        runtime arguments; wrapping it in an OUTER jit re-captures the
        weights as constants of the outer program — fine for small/medium
        models, avoid for big ones (see _trace on the RPC-compile limit)."""
        jaxpr, targets, _, _ = self._trace(self._example_args)
        if not targets:
            raise ValueError("no quantizable conv/dot equations found")
        if not self._amax.any():
            raise ValueError("no calibration data observed — call observe()")

        # pre-quantize weights once: replay the graph, capture each target's
        # concrete rhs (weights are input-independent, so any input works)
        cache = {}

        def capture(i, eqn, invals):
            if i in targets:
                cache[i] = _quantize_weight(
                    invals[1],
                    (_conv_dims(eqn) if targets[i] == "conv" else _dot_dims(eqn))[0],
                )
            return None

        def prep(consts_, args):
            _interpret(jaxpr, consts_, args, capture)
            return [cache[i] for i in sorted(targets)]

        dummy = [jnp.zeros(v.aval.shape, v.aval.dtype) for v in jaxpr.invars]
        packed = jax.jit(prep)(self._consts, tuple(dummy))
        weights = [tuple(p) for p in packed]                      # positional
        act_scale = [
            max(float(a) * clip_ratio / 127.0, 1e-12) for a in self._amax
        ]

        report = QuantReport()
        for k, i in enumerate(sorted(targets)):
            eqn = jaxpr.eqns[i]
            report.rows.append({
                "eqn": i,
                "kind": targets[i],
                "lhs": tuple(eqn.invars[0].aval.shape),
                "rhs": tuple(eqn.invars[1].aval.shape),
                "act_scale": act_scale[k],
            })

        def make_handler(targets_, weights_):
            pos = {i: k for k, i in enumerate(sorted(targets_))}

            def handler(i, eqn, invals):
                kind = targets_.get(i)
                if kind is None:
                    return None
                out_aval = eqn.outvars[0].aval
                q_w, s_w = weights_[pos[i]]
                s_x = act_scale[pos[i]]
                q_x = _quantize_act(invals[0], s_x)
                out_dim = (_conv_dims(eqn) if kind == "conv" else _dot_dims(eqn))[1]
                params = dict(eqn.params)
                params["preferred_element_type"] = jnp.int32
                acc = eqn.primitive.bind(q_x, q_w, **params)
                shape = [1] * acc.ndim
                shape[out_dim] = -1
                rescale = (s_w * s_x).reshape(shape)
                return [(acc.astype(jnp.float32) * rescale).astype(out_aval.dtype)]

            return handler

        exec_cache = {}  # shapes-key -> jitted replay(consts, weights, args)

        def qfn(*args):
            jaxpr_, targets_, out_tree_, _ = self._trace(args)
            key = self._key(args)
            if key not in exec_cache:

                def replay(consts_, weights_, args_):
                    return _interpret(
                        jaxpr_, consts_, args_, make_handler(targets_, weights_))

                exec_cache[key] = jax.jit(replay)
            outs = exec_cache[key](self._consts, weights, tuple(args))
            return jax.tree.unflatten(out_tree_, outs)

        return qfn, report


def quantize_for_serving(
    fn: Callable,
    calibration_batches: Sequence[Sequence[Any]],
    clip_ratio: float = 1.0,
):
    """One-call PTQ: calibrate ``fn`` on the given batches (sequences of
    positional-arg tuples) and return ``(qfn, report)``. ``qfn`` is jittable
    and has the same signature and output structure as ``fn``."""
    if not calibration_batches:
        raise ValueError("need at least one calibration batch")
    q = Int8Quantizer(fn, calibration_batches[0])
    for batch in calibration_batches:
        q.observe(*batch)
    return q.build(clip_ratio=clip_ratio)
