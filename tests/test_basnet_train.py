"""BASNet trainability: the paper's hybrid BCE+SSIM+IoU recipe
(train/basnet.py). The reference ships inference only
(PretrainedBasnetModel/RunInference.py); these tests validate the loss
components against naive numpy goldens and prove the flax port learns."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from weaklysuperviseddl_tpu.train.basnet import (
    bce_loss,
    fusion_loss,
    hybrid_loss,
    iou_loss,
    make_basnet_train_step,
    ssim,
    train_basnet,
)


def _naive_ssim(pred, target, size=11, sigma=1.5):
    """Direct per-pixel Gaussian-window SSIM in numpy ('SAME' padding)."""
    x = np.arange(size) - (size - 1) / 2.0
    g1 = np.exp(-(x**2) / (2 * sigma**2))
    g1 /= g1.sum()
    w = np.outer(g1, g1)

    def blur(img):
        pad = size // 2
        p = np.pad(img, pad)
        out = np.empty_like(img)
        for i in range(img.shape[0]):
            for j in range(img.shape[1]):
                out[i, j] = (p[i:i + size, j:j + size] * w).sum()
        return out

    vals = []
    for b in range(pred.shape[0]):
        mp, mt = blur(pred[b]), blur(target[b])
        vp = blur(pred[b] ** 2) - mp**2
        vt = blur(target[b] ** 2) - mt**2
        cov = blur(pred[b] * target[b]) - mp * mt
        c1, c2 = 0.01**2, 0.03**2
        s = ((2 * mp * mt + c1) * (2 * cov + c2)) / (
            (mp**2 + mt**2 + c1) * (vp + vt + c2))
        vals.append(s.mean())
    return float(np.mean(vals))


def test_ssim_identical_is_one():
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 24, 24))
    assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)


def test_ssim_matches_naive_golden():
    rng = np.random.default_rng(3)
    p = rng.random((2, 16, 16)).astype(np.float32)
    t = rng.random((2, 16, 16)).astype(np.float32)
    got = float(ssim(jnp.asarray(p), jnp.asarray(t)))
    want = _naive_ssim(p.astype(np.float64), t.astype(np.float64))
    assert got == pytest.approx(want, abs=2e-5)


def test_iou_loss_bounds():
    t = jnp.zeros((1, 8, 8)).at[0, 2:6, 2:6].set(1.0)
    assert float(iou_loss(t, t)) == pytest.approx(0.0, abs=1e-5)
    # disjoint prediction → loss → 1
    p = jnp.zeros((1, 8, 8)).at[0, 0:2, 0:2].set(1.0)
    assert float(iou_loss(p, t)) > 0.9


def test_bce_matches_naive():
    rng = np.random.default_rng(0)
    p = rng.uniform(0.05, 0.95, (2, 8, 8)).astype(np.float32)
    t = (rng.random((2, 8, 8)) > 0.5).astype(np.float32)
    want = -(t * np.log(p) + (1 - t) * np.log(1 - p)).mean()
    assert float(bce_loss(jnp.asarray(p), jnp.asarray(t))) == pytest.approx(
        float(want), abs=1e-6)


def test_hybrid_and_fusion_compose():
    rng = np.random.default_rng(1)
    p = jnp.asarray(rng.uniform(0.1, 0.9, (1, 12, 12)).astype(np.float32))
    t = jnp.asarray((rng.random((1, 12, 12)) > 0.5).astype(np.float32))
    h = float(hybrid_loss(p, t))
    assert h == pytest.approx(
        float(bce_loss(p, t)) + (1 - float(ssim(p, t))) + float(iou_loss(p, t)),
        abs=1e-5)
    outs = tuple(p[..., None] for _ in range(8))
    assert float(fusion_loss(outs, t)) == pytest.approx(8 * h, rel=1e-5)


@pytest.fixture(scope="module")
def basnet_32():
    """One full-BASNet init at 32², shared by the training-integration tests
    — on this CPU host the flax init alone compiles for ~100 s, so paying it
    once keeps the module inside the suite's time budget."""
    from weaklysuperviseddl_tpu.models.basnet import BASNet

    model = BASNet()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                           train=False)
    return model, variables


def test_basnet_train_step_learns(basnet_32):
    """Two Adam steps on one fixed batch reduce the fused loss and update
    BN batch stats — the full 8-head architecture trains end-to-end."""
    model, variables = basnet_32
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    targets = jnp.zeros((2, 32, 32)).at[:, 8:24, 8:24].set(1.0)

    tx = optax.adam(1e-3, eps=1e-8)
    params, stats = variables["params"], variables["batch_stats"]
    step = make_basnet_train_step(model, tx)
    opt_state = tx.init(params)
    losses = []
    for _ in range(2):
        params, stats, opt_state, loss = step(params, stats, opt_state,
                                              images, targets)
        losses.append(float(loss))
    assert losses[1] < losses[0]
    # BN stats moved away from init (mean 0 / var 1)
    leaf = jax.tree.leaves(stats)[0]
    assert float(jnp.abs(leaf).max()) > 0


def test_train_basnet_epoch_loop(basnet_32):
    """The device-resident epoch loop runs and reports decreasing loss; the
    from-scratch recipe options (grad clip + cosine lr) are exercised."""
    model, variables = basnet_32
    rng = np.random.default_rng(1)
    images = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
    targets = np.zeros((4, 32, 32), np.float32)
    targets[:, 8:24, 8:24] = 1.0
    logs = []
    hook_calls = []
    variables, history = train_basnet(
        model, variables, images, targets, epochs=2, batch_size=4,
        lr=3e-4, clip_norm=1.0, lr_end=1e-5, log=logs.append,
        eval_hook=lambda v, e: hook_calls.append((set(v), e)), eval_every=1)
    assert len(history) == 2
    assert history[1] < history[0]
    assert any("epoch" in s for s in logs)
    # the mid-training eval hook (held-out trajectory recorder) fires per
    # eval_every epochs with a plain variables dict
    assert hook_calls == [({"params", "batch_stats"}, 1),
                          ({"params", "batch_stats"}, 2)]
