"""Stage budgets for the DeepLabV3 train step (VERDICT round-2 item 5).

Times, with the in-jit scan + forced-readback protocol from bench.py:
  * the full train step (fwd+bwd+adam+guard)
  * forward-only, forward+backward (no optimizer)
  * backbone prefixes fwd+bwd (stem, +layer1, ..., +layer4) to attribute the
    backward where a trace viewer isn't available on this relay
  * loss tail variants (upsampled-logits CE vs low-res CE) to size the
    resize+CE tail

Run on the TPU host: python scripts/profile_seg_step.py [--batch 16]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def timed(fn, args, iters, label, per=None):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    extra = f"  ({per / dt:8.1f} img/s)" if per else ""
    print(f"{label:44s} {dt * 1e3:8.2f} ms{extra}")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/wsdl_jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from weaklysuperviseddl_tpu.models.deeplabv3 import DeepLabV3
    from weaklysuperviseddl_tpu.models.resnet import ResNetBackbone
    from weaklysuperviseddl_tpu.train.segmentation import (
        create_seg_state, make_seg_train_step)

    B, S, iters = args.batch, args.size, args.iters
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(rng.uniform(-2, 2, (B, S, S, 3)).astype(np.float32))
    m = jnp.asarray(rng.integers(0, 2, (B, S, S)).astype(np.int32))
    valid = jnp.ones((B,), bool)

    model = DeepLabV3(num_classes=2, dtype=dtype)
    state, tx = create_seg_state(model, key, input_size=S, lr=1e-4)
    state_ng, tx_ng = create_seg_state(model, key, input_size=S, lr=1e-4,
                                       guard_nonfinite=False)

    def scan_n(fn):
        @jax.jit
        def run(*a):
            def body(c, i):
                return c + fn(i, *a), None
            tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
            return tot
        return run

    # ---- full step
    step = make_seg_train_step(model, tx)

    @jax.jit
    def full_n(params, stats, opt):
        def body(carry, i):
            params, stats, opt = carry
            xi = x + i.astype(jnp.float32) * 1e-6
            params, stats, opt, loss = step(
                params, stats, opt, xi, m, valid, jax.random.fold_in(key, i))
            return (params, stats, opt), loss
        (_, _, _), losses = jax.lax.scan(body, (params, stats, opt), jnp.arange(iters))
        return jnp.sum(losses)

    t_full = timed(full_n, (state.params, state.batch_stats, state.opt_state),
                   iters, "full step (fwd+bwd+adam+guard)", per=B)

    step_ng = make_seg_train_step(model, tx_ng)

    @jax.jit
    def full_ng_n(params, stats, opt):
        def body(carry, i):
            params, stats, opt = carry
            xi = x + i.astype(jnp.float32) * 1e-6
            params, stats, opt, loss = step_ng(
                params, stats, opt, xi, m, valid, jax.random.fold_in(key, i))
            return (params, stats, opt), loss
        (_, _, _), losses = jax.lax.scan(body, (params, stats, opt), jnp.arange(iters))
        return jnp.sum(losses)

    timed(full_ng_n, (state_ng.params, state_ng.batch_stats, state_ng.opt_state),
          iters, "full step, no finite guard", per=B)

    # ---- loss fn variants (shared by fwd / fwd+bwd below)
    def loss_at(params, stats, xi, upsample=True):
        logits, _ = model.apply(
            {"params": params, "batch_stats": stats}, xi, train=True,
            mutable=["batch_stats"], rngs={"dropout": key})
        logp = jax.nn.log_softmax(logits, axis=-1)
        mm = m
        if not upsample:
            # grade the 32x32 logits against a strided mask (measurement only)
            stride = S // logits.shape[1]
            mm = m[:, ::stride, ::stride]
            logp = jax.nn.log_softmax(logits, axis=-1)
        onehot = jax.nn.one_hot(mm, 2, dtype=logp.dtype)
        return -jnp.mean(jnp.sum(logp * onehot, axis=-1))

    def grads_live(v, g):
        # keep the backward alive: [0]-indexing value_and_grad lets XLA
        # dead-code-eliminate the whole backward pass (measured: "fwd+bwd"
        # == fwd-only without this)
        s = sum(jnp.sum(leaf.astype(jnp.float32)) for leaf in jax.tree.leaves(g))
        return v + 1e-20 * s

    fwd = scan_n(lambda i, p, s: loss_at(p, s, x + i * 1e-6))
    timed(fwd, (state.params, state.batch_stats), iters, "forward + loss", per=B)

    fwd_bwd = scan_n(lambda i, p, s: grads_live(*jax.value_and_grad(
        lambda pp: loss_at(pp, s, x + i * 1e-6))(p)))
    timed(fwd_bwd, (state.params, state.batch_stats), iters,
          "forward + backward (no optimizer)", per=B)

    fwd_bwd_lr = scan_n(lambda i, p, s: grads_live(*jax.value_and_grad(
        lambda pp: loss_at(pp, s, x + i * 1e-6, upsample=False))(p)))
    # note: logits are still upsampled inside the model; this only swaps the
    # CE resolution to 32x32 (sizes the full-res CE tail)
    timed(fwd_bwd_lr, (state.params, state.batch_stats), iters,
          "forward + backward, CE on strided 32x32 mask", per=B)

    # ---- backbone prefixes (fwd+bwd of sum of the stage output)
    backbone = ResNetBackbone(
        depth=50, replace_stride_with_dilation=(False, True, True), dtype=dtype)
    bvars = jax.jit(backbone.init)(key, jnp.zeros((1, S, S, 3)))

    def prefix_loss(params, stats, xi, upto):
        feats = backbone.apply(
            {"params": params, "batch_stats": stats}, xi, train=True,
            mutable=["batch_stats"])[0]
        return jnp.mean(jnp.square(feats[upto].astype(jnp.float32)))

    prev = 0.0
    for upto in ("stem", "layer1", "layer2", "layer3", "layer4"):
        f = scan_n(lambda i, p, s, u=upto: grads_live(*jax.value_and_grad(
            lambda pp: prefix_loss(pp, s, x + i * 1e-6, u))(p)))
        dt = timed(f, (bvars["params"], bvars["batch_stats"]), iters,
                   f"backbone fwd+bwd through {upto}")
        print(f"{'':44s}   Δ {upto}: {(dt - prev) * 1e3:6.2f} ms")
        prev = dt


if __name__ == "__main__":
    main()
