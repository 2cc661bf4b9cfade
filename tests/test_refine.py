"""Alternating-direction refinement parity: the scan/vmap JAX loop vs a torch
golden reproducing the reference's per-image Adam-on-X optimisation
(AlternatingDirectionCutLoss.py:709-767 semantics, fresh implementation)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from weaklysuperviseddl_tpu.train.refine import refine_from_soft_predictions

from test_losses import torch_ncut


def torch_refine(S_nchw, image_nchw, mask_hw, lambda_boundary, threshold, lr,
                 num_steps, sigma_color=0.1, window_size=5):
    """Golden: single-image refinement with the reference's exact update rule."""
    num_classes = S_nchw.shape[1]
    X = F.one_hot(mask_hw.long(), num_classes).permute(2, 0, 1).float().unsqueeze(0)
    X = X.requires_grad_(True)
    opt = torch.optim.Adam([X], lr=lr)
    total = 0.0
    for _ in range(num_steps):
        opt.zero_grad()
        Xn = F.softmax(X, dim=1)
        loss_kl = F.kl_div((Xn + 1e-8).log(), S_nchw, reduction="batchmean")
        # reference feeds softmaxed X into LocalNormalizedCutLoss (which
        # softmaxes again): reproduce by calling the ncut golden on Xn
        loss_b = torch_ncut(Xn, image_nchw, sigma_color=sigma_color, window=window_size)
        lam = lambda_boundary * (loss_kl.item() / (loss_b.item() + 1e-6))
        loss = loss_kl + lam * loss_b
        loss.backward()
        opt.step()
        total += loss.item()
    Xf = F.softmax(X, dim=1)
    return (Xf[0, 1] > threshold).float().detach().numpy(), total


def test_refinement_matches_torch_golden():
    rng = np.random.default_rng(0)
    H = W = 16
    S = rng.uniform(0.1, 1, (2, H, W, 2)).astype(np.float32)
    S = S / S.sum(-1, keepdims=True)
    images = rng.uniform(-1, 1, (2, H, W, 3)).astype(np.float32)
    masks = (rng.uniform(0, 1, (2, H, W)) > 0.5).astype(np.int32)

    got, got_loss = refine_from_soft_predictions(
        jnp.asarray(S), jnp.asarray(images), jnp.asarray(masks),
        lambda_boundary=0.1, threshold=0.3, lr=1e-2, num_steps=10,
        sigma_color=0.1, window_size=5, loss="ncut",
    )
    got = np.asarray(got)

    ref_losses = []
    for i in range(2):
        ref, total = torch_refine(
            torch.from_numpy(S[i]).permute(2, 0, 1).unsqueeze(0),
            torch.from_numpy(images[i]).permute(2, 0, 1).unsqueeze(0),
            torch.from_numpy(masks[i]),
            lambda_boundary=0.1, threshold=0.3, lr=1e-2, num_steps=10,
        )
        ref_losses.append(total)
        # binary masks after 10 Adam steps: tolerate a handful of pixels
        # flipping due to fp32 order-of-ops, demand >99% agreement
        agree = (got[i] == ref).mean()
        assert agree > 0.99, f"image {i}: only {agree:.3f} agreement"

    np.testing.assert_allclose(float(got_loss), np.mean(ref_losses), rtol=1e-3)


def test_refinement_moves_toward_predictions():
    """With λ=0 the KL term should pull X toward S's argmax."""
    rng = np.random.default_rng(1)
    H = W = 12
    target = (rng.uniform(0, 1, (1, H, W)) > 0.5).astype(np.int32)
    S = np.stack([1 - target, target], axis=-1).astype(np.float32) * 0.98 + 0.01
    images = rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32)
    wrong = 1 - target  # start from the inverted mask

    refined, _ = refine_from_soft_predictions(
        jnp.asarray(S), jnp.asarray(images), jnp.asarray(wrong),
        lambda_boundary=0.0, threshold=0.5, lr=0.5, num_steps=60,
    )
    agree = (np.asarray(refined) == target).mean()
    assert agree > 0.95, f"refinement failed to follow S: {agree}"


def test_alternating_loop_smoke():
    from weaklysuperviseddl_tpu.config import smoke_config
    from weaklysuperviseddl_tpu.data.mask_store import MaskStore
    from weaklysuperviseddl_tpu.models.deeplabv3 import DeepLabV3
    from weaklysuperviseddl_tpu.train.alternating import run_alternating_training
    from weaklysuperviseddl_tpu.train.segmentation import create_seg_state

    cfg = smoke_config()
    rng = np.random.default_rng(2)
    store = MaskStore()
    for i in range(4):
        img = (rng.uniform(0, 1, (cfg.data.seg_size, cfg.data.seg_size, 3)) * 255).astype(np.uint8)
        mask = np.zeros((cfg.data.seg_size, cfg.data.seg_size), np.uint8)
        mask[8:40, 8:40] = 1
        store.put(f"{i:04d}", img, mask)

    model = DeepLabV3(num_classes=2, backbone_depth=18, width_multiplier=0.25)
    state, tx = create_seg_state(model, jax.random.PRNGKey(0), input_size=cfg.data.seg_size)
    logs = []
    state, store = run_alternating_training(
        model, state, tx, store, cfg,
        eval_fn=lambda st: (0.5, 0.5), log=logs.append,
    )
    assert any("completed" in s for s in logs)
    _, masks, _ = store.as_arrays()
    assert set(np.unique(masks)).issubset({0, 1})


def test_dp_refine_matches_single_device():
    """VERDICT r2 item 3: refinement under data parallelism — batch sharded on
    the 'data' mesh axis — must equal the unsharded result (the vmap over
    images is embarrassingly parallel; GSPMD only splits it)."""
    from weaklysuperviseddl_tpu.parallel import make_mesh, batch_sharding
    from weaklysuperviseddl_tpu.train.refine import refine_from_soft_predictions

    mesh = make_mesh(data=8, model=1)
    rng = np.random.default_rng(21)
    B, S = 8, 24
    probs = rng.uniform(0.1, 1.0, (B, S, S, 2)).astype(np.float32)
    probs /= probs.sum(-1, keepdims=True)
    images = rng.uniform(-1, 1, (B, S, S, 3)).astype(np.float32)
    masks = rng.integers(0, 2, (B, S, S)).astype(np.int32)

    kwargs = dict(lambda_boundary=0.1, threshold=0.5, lr=1e-2, num_steps=5,
                  use_pallas=False)
    ref, ref_loss = refine_from_soft_predictions(
        jnp.asarray(probs), jnp.asarray(images), jnp.asarray(masks), **kwargs)

    sp = jax.device_put(probs, batch_sharding(mesh, 4))
    si = jax.device_put(images, batch_sharding(mesh, 4))
    sm = jax.device_put(masks, batch_sharding(mesh, 3))
    out, out_loss = refine_from_soft_predictions(sp, si, sm, **kwargs)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    np.testing.assert_allclose(float(out_loss), float(ref_loss), rtol=1e-5)


def test_resident_sweep_matches_direct_refinement():
    """make_refine_sweep (the one-dispatch device-resident sweep) must equal
    refine_pseudo_masks batch by batch — including actually writing refined
    masks back into the resident array (guards the round-3 restructuring)."""
    from weaklysuperviseddl_tpu.config import RefineConfig
    from weaklysuperviseddl_tpu.data.preprocess import preprocess_batch
    from weaklysuperviseddl_tpu.models.deeplabv3 import DeepLabV3
    from weaklysuperviseddl_tpu.train.alternating import (
        _sweep_index_table, make_refine_sweep)
    from weaklysuperviseddl_tpu.train.refine import refine_pseudo_masks
    from weaklysuperviseddl_tpu.train.segmentation import (
        _normalize_images, create_seg_state)

    rng = np.random.default_rng(0)
    S = 32
    model = DeepLabV3(num_classes=2, backbone_depth=18, width_multiplier=0.25)
    state, _tx = create_seg_state(model, jax.random.PRNGKey(0), input_size=S)
    images = (rng.uniform(0, 255, (6, S, S, 3))).astype(np.uint8)
    masks = rng.integers(0, 2, (6, S, S)).astype(np.uint8)

    # strong steps so refinement actually flips pixels (lr 1e-2 x 10 steps
    # cannot move a one-hot X past the 0.5 threshold — that near-identity
    # regime is the reference's own script setting, see run_reference_scale)
    cfg = RefineConfig(lr=0.5, num_steps=25, use_pallas=False)
    sweep = make_refine_sweep(model, cfg, seg_size=S)
    out, _loss = sweep(state.params, state.batch_stats, jnp.asarray(masks),
                       jnp.asarray(images), jnp.asarray(_sweep_index_table(6, 2)))
    out = np.asarray(out)
    assert (out != masks).mean() > 0.05  # it refined something

    x, _ = preprocess_batch(jnp.asarray(images), None, size=S)
    x = _normalize_images(x)
    direct = []
    for s0 in range(0, 6, 2):
        r, _l = refine_pseudo_masks(
            model, state.params, state.batch_stats, x[s0:s0 + 2],
            jnp.asarray(masks[s0:s0 + 2], jnp.int32),
            lambda_boundary=cfg.lambda_boundary, threshold=cfg.threshold,
            lr=cfg.lr, num_steps=cfg.num_steps, sigma_color=cfg.sigma_color,
            sigma_space=cfg.sigma_space, window_size=cfg.window_size,
            loss=cfg.loss, use_pallas=False)
        direct.append(np.asarray(r))
    np.testing.assert_array_equal(out, np.concatenate(direct))
