"""Training-step tests: DeepLabV3 shapes, fc-only learning, seg-loss descent,
SPMD sharded step parity on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from weaklysuperviseddl_tpu.data import download_data
from weaklysuperviseddl_tpu.data.loader import batches
from weaklysuperviseddl_tpu.models.classifier import CamClassifier
from weaklysuperviseddl_tpu.models.deeplabv3 import DeepLabV3
from weaklysuperviseddl_tpu.parallel import make_mesh, shard_batch, batch_sharding
from weaklysuperviseddl_tpu.parallel.mesh import replicate_tree
from weaklysuperviseddl_tpu.train.classifier import (
    make_fc_train_step,
    split_frozen,
    train_fc_only,
    evaluate_classification,
)
from weaklysuperviseddl_tpu.train.segmentation import (
    create_seg_state,
    make_seg_train_step,
    train_segmentation_model,
)


def test_deeplab_output_shape():
    model = DeepLabV3(num_classes=2, backbone_depth=18, width_multiplier=0.25)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 64, 64, 3)), train=False,
    )
    logits = model.apply(variables, jnp.zeros((2, 64, 64, 3)), train=False)
    assert logits.shape == (2, 64, 64, 2)
    # output stride 8 backbone: layer4 spatial = 64/8 = 8 (via dilation)
    # implied by the resize working; train mode with dropout rng also runs:
    out, _ = model.apply(
        variables, jnp.zeros((2, 64, 64, 3)), train=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert out.shape == (2, 64, 64, 2)


def test_fc_training_learns_synthetic():
    """Synthetic classes are color-keyed, so fc-on-random-frozen-backbone must
    reach well-above-chance train accuracy quickly."""
    ds = download_data(None, split="trainval", synthetic_size=32, image_size=48, num_classes=4)
    model = CamClassifier(num_classes=4, depth=18, width_multiplier=0.25)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 3)))

    logs = []
    new_vars = train_fc_only(
        model, variables,
        train_loader_fn=lambda: batches(ds, 8, shuffle=True, seed=0, pad_to_full=True),
        val_loader_fn=None,
        epochs=6, lr=5e-2, num_classes=4, image_size=48,
        log=logs.append,
    )
    acc, f1 = evaluate_classification(
        model, new_vars, batches(ds, 8), num_classes=4, image_size=48, log=logs.append,
    )
    assert acc > 50.0, f"fc training failed to learn: acc={acc}, logs={logs}"
    # frozen backbone untouched
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(variables["params"]["backbone"])[0]),
        np.asarray(jax.tree.leaves(new_vars["params"]["backbone"])[0]),
    )


def test_seg_training_loss_decreases():
    ds = download_data(None, split="trainval", synthetic_size=8, image_size=48)
    images = np.stack(ds.images)
    masks = np.stack([(t == 1).astype(np.uint8) for t in ds.trimaps])

    model = DeepLabV3(num_classes=2, backbone_depth=18, width_multiplier=0.25)
    state, tx = create_seg_state(model, jax.random.PRNGKey(0), input_size=48, lr=1e-3)

    losses = []
    state, _ = train_segmentation_model(
        model, state, tx, images, masks,
        num_epochs=4, batch_size=4, seg_size=48,
        log=lambda s: losses.append(s),
    )
    first = float(losses[0].split("Loss: ")[1])
    last = float(losses[-1].split("Loss: ")[1])
    assert last < first, f"no descent: {losses}"


def test_seg_lovasz_loss_path_runs():
    ds = download_data(None, split="trainval", synthetic_size=4, image_size=32)
    images = np.stack(ds.images)
    masks = np.stack([(t == 1).astype(np.uint8) for t in ds.trimaps])
    model = DeepLabV3(num_classes=2, backbone_depth=18, width_multiplier=0.25)
    state, tx = create_seg_state(model, jax.random.PRNGKey(0), input_size=32)
    state, loss = train_segmentation_model(
        model, state, tx, images, masks, loss_fn="lovasz_softmax",
        num_epochs=1, batch_size=4, seg_size=32, log=lambda s: None,
    )
    assert np.isfinite(loss)


def test_fc_step_masks_padded_rows():
    """A padded tail batch must (a) report train acc ≤100%, (b) produce the
    identical fc update as the unpadded ragged batch (VERDICT r1 item 4)."""
    model = CamClassifier(num_classes=4, depth=18, width_multiplier=0.25)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    frozen, fc = split_frozen(variables)
    tx = optax.adam(1e-2)
    step = make_fc_train_step(model, tx)

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (5, 32, 32, 3)).astype(np.float32)
    y = rng.integers(0, 4, 5).astype(np.int32)

    # padded to 8 by repeating the last row (what loader pad_to_full does)
    xp = np.concatenate([x, np.repeat(x[-1:], 3, axis=0)])
    yp = np.concatenate([y, np.repeat(y[-1:], 3)])
    valid = jnp.arange(8) < 5

    fc_p, _, loss_p, corr_p = step(
        frozen, jax.tree.map(jnp.copy, fc), tx.init(fc),
        jnp.asarray(xp), jnp.asarray(yp), valid)
    fc_u, _, loss_u, corr_u = step(
        frozen, jax.tree.map(jnp.copy, fc), tx.init(fc),
        jnp.asarray(x), jnp.asarray(y))

    assert int(corr_p) <= 5  # acc over num_valid can't exceed 100%
    assert int(corr_p) == int(corr_u)
    np.testing.assert_allclose(float(loss_p), float(loss_u), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(fc_p), jax.tree.leaves(fc_u)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)

    # eval counters likewise ignore padding
    from weaklysuperviseddl_tpu.utils.metrics import classification_counts
    preds = jnp.asarray(yp)  # pretend perfect predictions
    c = classification_counts(preds, jnp.asarray(yp), 4, valid=valid)
    assert int(c["total"]) == 5 and int(c["correct"]) == 5


def test_sharded_fc_step_matches_single_device():
    """The same jit'd step on an 8-device data mesh produces the same update."""
    assert len(jax.devices()) == 8
    mesh = make_mesh(data=8, model=1)

    model = CamClassifier(num_classes=4, depth=18, width_multiplier=0.25)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    frozen, fc = split_frozen(variables)
    tx = optax.adam(1e-2)
    opt_state = tx.init(fc)
    step = make_fc_train_step(model, tx)

    x = np.random.default_rng(0).uniform(0, 1, (16, 32, 32, 3)).astype(np.float32)
    y = np.random.default_rng(1).integers(0, 4, 16).astype(np.int32)

    fc1, _, loss1, corr1 = step(frozen, jax.tree.map(jnp.copy, fc),
                                jax.tree.map(jnp.copy, opt_state), jnp.asarray(x), jnp.asarray(y))

    xs, ys = shard_batch(mesh, x, y)
    frozen_r = replicate_tree(mesh, frozen)
    fc_r = replicate_tree(mesh, jax.tree.map(jnp.copy, fc))
    opt_r = replicate_tree(mesh, jax.tree.map(jnp.copy, opt_state))
    fc2, _, loss2, corr2 = step(frozen_r, fc_r, opt_r, xs, ys)

    assert int(corr1) == int(corr2)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(fc1), jax.tree.leaves(fc2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_dp_tp_seg_step_matches_single_device():
    """create_seg_state(mesh=4x2) + batch-sharded step == unsharded step:
    tensor parallelism as a config path (VERDICT r1 item 6)."""
    from weaklysuperviseddl_tpu.parallel.mesh import batch_sharding

    mesh = make_mesh(data=4, model=2)
    model = DeepLabV3(num_classes=2, backbone_depth=18, width_multiplier=0.25)

    state_s, tx = create_seg_state(model, jax.random.PRNGKey(0), input_size=32)
    state_m, _ = create_seg_state(model, jax.random.PRNGKey(0), input_size=32, mesh=mesh)
    # verify the TP layout is actually applied to at least one conv kernel
    shardings = {
        str(l.sharding.spec) for l in jax.tree.leaves(state_m.params)
        if hasattr(l, "sharding") and hasattr(l.sharding, "spec")
    }
    assert any("model" in s for s in shardings), shardings

    # SGD for the parity step: after one Adam step every param moves by ±lr
    # (m/sqrt(v) ≈ sign(g)), so reduction-order noise flips near-zero grads
    # and param comparison becomes meaningless; SGD keeps diffs ∝ grad diffs.
    from weaklysuperviseddl_tpu.parallel.mesh import shard_params_tp

    tx2 = optax.sgd(1e-2)
    step = make_seg_train_step(model, tx2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32))
    m = jnp.asarray(rng.integers(0, 2, (8, 32, 32)).astype(np.int32))
    v = jnp.ones((8,), bool)
    key = jax.random.PRNGKey(7)

    p1, _, _, loss1 = step(state_s.params, state_s.batch_stats, tx2.init(state_s.params),
                           x, m, v, key)
    xs = jax.device_put(x, batch_sharding(mesh, 4))
    ms = jax.device_put(m, batch_sharding(mesh, 3))
    vs = jax.device_put(v, batch_sharding(mesh, 1))
    p2, _, _, loss2 = step(state_m.params, state_m.batch_stats,
                           shard_params_tp(mesh, tx2.init(state_m.params)),
                           xs, ms, vs, key)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-6)


def test_sharded_eval_matches_counters():
    """SPMD sharded eval (psum'd confusion counters) == single-device eval."""
    import jax
    from weaklysuperviseddl_tpu.models.deeplabv3 import DeepLabV3
    from weaklysuperviseddl_tpu.train.segmentation import (
        create_seg_state,
        evaluate_segmentation_sharded,
    )
    from weaklysuperviseddl_tpu.utils.metrics import (
        binary_confusion_counts,
        finish_iou_and_acc,
    )
    import jax.numpy as jnp

    mesh = make_mesh(data=8, model=1)
    model = DeepLabV3(num_classes=2, backbone_depth=18, width_multiplier=0.25)
    state, _ = create_seg_state(model, jax.random.PRNGKey(0), input_size=32)

    rng = np.random.default_rng(0)
    images = rng.uniform(-1, 1, (16, 32, 32, 3)).astype(np.float32)
    true_fg = rng.integers(0, 2, (16, 32, 32)).astype(np.int32)

    iou_s, acc_s = evaluate_segmentation_sharded(
        model, state, jnp.asarray(images), jnp.asarray(true_fg), mesh)

    logits = model.apply({"params": state.params, "batch_stats": state.batch_stats},
                         jnp.asarray(images), train=False)
    preds = jnp.argmax(logits, axis=-1)
    iou_r, acc_r = finish_iou_and_acc(binary_confusion_counts(preds, jnp.asarray(true_fg)))
    np.testing.assert_allclose(iou_s, float(iou_r), rtol=1e-6)
    np.testing.assert_allclose(acc_s, float(acc_r), rtol=1e-6)


def test_nonfinite_gradient_guard():
    """A poisoned batch (NaN images) must not corrupt params (optax.apply_if_finite)."""
    model = DeepLabV3(num_classes=2, backbone_depth=18, width_multiplier=0.25)
    state, tx = create_seg_state(model, jax.random.PRNGKey(0), input_size=32)
    step = make_seg_train_step(model, tx)
    before = jax.tree.map(jnp.copy, state.params)

    x = jnp.full((2, 32, 32, 3), jnp.nan)
    m = jnp.zeros((2, 32, 32), jnp.int32)
    params, stats, opt, loss = step(
        state.params, state.batch_stats, state.opt_state, x, m,
        jnp.ones((2,), bool), jax.random.PRNGKey(1),
    )
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multi_step_equals_sequential_steps():
    """make_seg_train_multi_step scans N steps in one program; with the same
    derived dropout keys it must reproduce the sequential step exactly."""
    from weaklysuperviseddl_tpu.train.segmentation import (
        create_seg_state, make_seg_train_step, make_seg_train_multi_step)

    model = DeepLabV3(num_classes=2, backbone_depth=18, width_multiplier=0.25)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    B, S, K = 2, 32, 3
    x = jnp.asarray(rng.uniform(-1, 1, (K, B, S, S, 3)).astype(np.float32))
    m = jnp.asarray(rng.integers(0, 2, (K, B, S, S)).astype(np.int32))
    valid = jnp.ones((K, B), bool)

    state, tx = create_seg_state(model, key, input_size=S, batch=B)
    step = make_seg_train_step(model, tx)
    p1, s1, o1 = state.params, state.batch_stats, state.opt_state
    for i in range(K):
        p1, s1, o1, _ = step(p1, s1, o1, x[i], m[i], valid[i],
                             jax.random.fold_in(key, i))

    state2, tx2 = create_seg_state(model, key, input_size=S, batch=B)
    multi = make_seg_train_multi_step(model, tx2)
    p2, s2, o2, losses = multi(state2.params, state2.batch_stats,
                               state2.opt_state, x, m, valid, key)
    assert losses.shape == (K,)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-4)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-4)


def test_chunked_epoch_trains():
    """train_segmentation_model with steps_per_dispatch>1: same step count,
    loss decreases, tail batches still processed."""
    from weaklysuperviseddl_tpu.train.segmentation import (
        create_seg_state, train_segmentation_model)

    model = DeepLabV3(num_classes=2, backbone_depth=18, width_multiplier=0.25)
    rng = np.random.default_rng(1)
    N, S = 10, 32  # batch 2 -> 5 batches: 2 chunks of 2 + 1 leftover
    images = (rng.uniform(0, 255, (N, S, S, 3))).astype(np.uint8)
    masks = np.zeros((N, S, S), np.uint8)
    masks[:, :, : S // 2] = 1
    images[:, :, : S // 2] += 60

    state, tx = create_seg_state(model, jax.random.PRNGKey(2), input_size=S, batch=2)
    state, first_loss = train_segmentation_model(
        model, state, tx, images, masks, num_epochs=1, batch_size=2,
        seg_size=S, steps_per_dispatch=2, log=lambda *a: None)
    assert state.step == 5
    state, last_loss = train_segmentation_model(
        model, state, tx, images, masks, num_epochs=3, batch_size=2,
        seg_size=S, steps_per_dispatch=2, log=lambda *a: None)
    assert state.step == 20
    assert np.isfinite(last_loss)
    assert last_loss < first_loss


def test_fc_cached_matches_uncached():
    """Feature-cached fc training (frozen backbone, deterministic loader) must
    reproduce the uncached epoch loop: same final fc params and printouts."""
    from weaklysuperviseddl_tpu.data import download_data
    from weaklysuperviseddl_tpu.data.loader import batches
    from weaklysuperviseddl_tpu.models.classifier import CamClassifier
    from weaklysuperviseddl_tpu.train.classifier import train_fc_only

    ds = download_data(None, split="trainval", synthetic_size=10, image_size=32)
    model = CamClassifier(num_classes=5, depth=18, width_multiplier=0.25)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    loader_fn = lambda: batches(ds, 4, pad_to_full=True)

    logs_a, logs_b = [], []
    va = train_fc_only(model, variables, loader_fn, epochs=3, num_classes=5,
                       image_size=32, cache_features=False, log=logs_a.append)
    vb = train_fc_only(model, variables, loader_fn, epochs=3, num_classes=5,
                       image_size=32, cache_features=True, log=logs_b.append)
    for a, b in zip(jax.tree.leaves(va["params"]["fc"]),
                    jax.tree.leaves(vb["params"]["fc"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    assert logs_a == logs_b  # identical printout contract incl. loss/acc text


def _tiny_seg_dataset(rng, N, S):
    images = (rng.uniform(0, 255, (N, S, S, 3))).astype(np.uint8)
    masks = np.zeros((N, S, S), np.uint8)
    masks[:, :, : S // 2] = 1
    images[:, :, : S // 2] += 60
    return images, masks


def test_dp_chunked_epoch_matches_per_step():
    """VERDICT r2 item 2: chunked dispatch on a dp×tp mesh — sharded resident
    dataset, shard_map local gathers, [K,B] per-shard index tables — must
    reproduce the per-step dp epoch exactly (same seed → same params), and
    the single-device epoch with the same per-shard order semantics must use
    no host-built batches at all (that branch is deleted)."""
    from weaklysuperviseddl_tpu.train.segmentation import (
        create_seg_state, train_segmentation_model)

    mesh = make_mesh(data=4, model=2)
    model = DeepLabV3(num_classes=2, backbone_depth=18, width_multiplier=0.25)
    rng = np.random.default_rng(7)
    N, S, B = 18, 32, 8  # ragged: 18 = 4 shards x 5 local (2 wrap-pad), tail batch
    images, masks = _tiny_seg_dataset(rng, N, S)

    def run(steps_per_dispatch):
        state, tx = create_seg_state(
            model, jax.random.PRNGKey(3), input_size=S, batch=2, mesh=mesh)
        state, loss = train_segmentation_model(
            model, state, tx, images, masks, num_epochs=2, batch_size=B,
            seg_size=S, seed=11, mesh=mesh,
            steps_per_dispatch=steps_per_dispatch, log=lambda *a: None)
        return state, loss

    s_chunk, l_chunk = run(3)
    s_step, l_step = run(1)
    assert s_chunk.step == s_step.step
    np.testing.assert_allclose(l_chunk, l_step, rtol=1e-5)
    flat_a = jax.tree.leaves(s_chunk.params)
    flat_b = jax.tree.leaves(s_step.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_single_device_chunked_matches_per_step():
    """Same determinism contract off-mesh: dispatch grouping must not change
    the training trajectory (dropout keys fold in the GLOBAL step index)."""
    from weaklysuperviseddl_tpu.train.segmentation import (
        create_seg_state, train_segmentation_model)

    model = DeepLabV3(num_classes=2, backbone_depth=18, width_multiplier=0.25)
    rng = np.random.default_rng(9)
    N, S, B = 10, 32, 4
    images, masks = _tiny_seg_dataset(rng, N, S)

    def run(steps_per_dispatch):
        state, tx = create_seg_state(
            model, jax.random.PRNGKey(5), input_size=S, batch=2)
        state, loss = train_segmentation_model(
            model, state, tx, images, masks, num_epochs=1, batch_size=B,
            seg_size=S, seed=13, steps_per_dispatch=steps_per_dispatch,
            log=lambda *a: None)
        return state, loss

    s_chunk, l_chunk = run(2)
    s_step, l_step = run(1)
    np.testing.assert_allclose(l_chunk, l_step, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_chunk.params), jax.tree.leaves(s_step.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_resident_eval_matches_loader_eval():
    """evaluate_segmentation_dataset (one-dispatch resident eval) must equal
    the per-batch loader eval's mean per-image IoU/acc."""
    from weaklysuperviseddl_tpu.data import download_data
    from weaklysuperviseddl_tpu.train.segmentation import (
        create_seg_state, evaluate_segmentation, evaluate_segmentation_dataset)

    ds = download_data(None, split="test", synthetic_size=11, image_size=32,
                       seed=5, num_classes=5)
    model = DeepLabV3(num_classes=2, backbone_depth=18, width_multiplier=0.25)
    state, _ = create_seg_state(model, jax.random.PRNGKey(0), input_size=32)
    a_iou, a_acc = evaluate_segmentation(
        model, state, batches(ds, 4), seg_size=32, eval_size=32)
    images = np.stack([np.asarray(ds.images[i]) for i in range(len(ds))])
    tris = np.stack([np.asarray(ds.trimaps[i]) for i in range(len(ds))])
    b_iou, b_acc = evaluate_segmentation_dataset(
        model, state, images, tris, batch_size=4, seg_size=32, eval_size=32)
    np.testing.assert_allclose(a_iou, b_iou, atol=1e-5)
    np.testing.assert_allclose(a_acc, b_acc, atol=1e-5)


def test_multiclass_resident_eval_matches_loader_eval():
    """evaluate_multiclass_dataset (one-dispatch supervised eval) must equal
    the per-batch loader eval — including a ragged final batch, whose valid
    mask must reproduce the slice-off-padding semantics exactly."""
    from weaklysuperviseddl_tpu.data import download_data
    from weaklysuperviseddl_tpu.data.loader import stack_dataset
    from weaklysuperviseddl_tpu.train.segmentation import (
        create_seg_state, evaluate_multiclass, evaluate_multiclass_dataset)

    ds = download_data(None, split="test", synthetic_size=11, image_size=32,
                       seed=5, num_classes=5)
    model = DeepLabV3(num_classes=2, backbone_depth=18, width_multiplier=0.25)
    state, _ = create_seg_state(model, jax.random.PRNGKey(0), input_size=32)
    a_acc, a_iou = evaluate_multiclass(
        model, state, batches(ds, 4), num_classes=2, seg_size=32)
    images, _, tris = stack_dataset(ds)
    b_acc, b_iou = evaluate_multiclass_dataset(
        model, state, images, tris, num_classes=2, batch_size=4, seg_size=32)
    np.testing.assert_allclose(a_iou, b_iou, atol=1e-5)
    np.testing.assert_allclose(a_acc, b_acc, atol=1e-5)


def test_program_memos_shared_and_bounded():
    """Two same-config runs must reuse the SAME traced epoch/sweep programs
    (no re-tracing per alternation), and the memos must stay bounded so a
    long-lived sweep/serving process can't grow without limit (VERDICT r3)."""
    from weaklysuperviseddl_tpu.train import segmentation as seg
    from weaklysuperviseddl_tpu.train.segmentation import (
        _epoch_programs, create_seg_state)
    from weaklysuperviseddl_tpu.utils.cache import BoundedCache

    model = DeepLabV3(num_classes=2, backbone_depth=18, width_multiplier=0.25)
    state_a, tx_a = create_seg_state(model, jax.random.PRNGKey(0), input_size=32)
    state_b, tx_b = create_seg_state(model, jax.random.PRNGKey(1), input_size=32)
    # same (lr, guard) config → the SAME tx instance (id-keyed memo works)
    assert tx_a is tx_b
    p1 = _epoch_programs(model, tx_a, "cross_entropy", 32, None, False)
    p2 = _epoch_programs(model, tx_b, "cross_entropy", 32, None, False)
    assert p1[0] is p2[0] and p1[1] is p2[1]

    # boundedness: the LRU never exceeds maxsize
    c = BoundedCache(maxsize=3)
    for i in range(10):
        c.put(i, i)
    assert len(c) == 3
    assert c.get(9) == 9 and c.get(0) is None
    # LRU order: touching an entry protects it from eviction
    c.get(7)
    c.put(10, 10)
    assert 7 in c and 8 not in c
    assert isinstance(seg._EPOCH_PROGRAMS, BoundedCache)
    assert isinstance(seg._TX_CACHE, BoundedCache)


def test_seg_bn_frozen_keeps_stats_and_trains():
    """SegConfig.bn_frozen: BN running stats are untouched by train steps while
    params (incl. the BN scale/bias affines) still learn; the default
    (train-mode BN, reference SegmentationModel.py:59-122 semantics) must keep
    updating stats. Perf rationale: BASELINE.md train-vs-eval-BN A/B."""
    ds = download_data(None, split="trainval", synthetic_size=8, image_size=48)
    images = np.stack(ds.images)
    masks = np.stack([(t == 1).astype(np.uint8) for t in ds.trimaps])

    def run(bn_frozen):
        model = DeepLabV3(num_classes=2, backbone_depth=18,
                          width_multiplier=0.25, bn_frozen=bn_frozen)
        state, tx = create_seg_state(model, jax.random.PRNGKey(0),
                                     input_size=48, lr=1e-3)
        stats0 = jax.tree.map(np.asarray, state.batch_stats)
        params0 = jax.tree.map(np.asarray, state.params)
        state, loss = train_segmentation_model(
            model, state, tx, images, masks,
            num_epochs=2, batch_size=4, seg_size=48, log=lambda s: None,
        )
        return stats0, params0, state, loss

    stats0, params0, state, loss = run(bn_frozen=True)
    assert np.isfinite(loss)
    # running stats untouched
    for a, b in zip(jax.tree.leaves(stats0), jax.tree.leaves(state.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # params (incl. BN affines) still learn
    bn_scale0 = params0["head_bn"]["scale"]
    bn_scale1 = np.asarray(state.params["head_bn"]["scale"])
    assert not np.array_equal(bn_scale0, bn_scale1), "BN affine got no grads"

    # default path still updates stats (regression guard for the .get change)
    stats0, _, state, _ = run(bn_frozen=False)
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(stats0), jax.tree.leaves(state.batch_stats))
    )
    assert changed, "train-mode BN stopped updating running stats"
