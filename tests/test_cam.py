"""LayerCAM / CAM parity: functional jax.vjp implementation vs a torch
hook-based golden (the reference's mechanism, re-implemented fresh on the test
mirror model)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from weaklysuperviseddl_tpu.cam import layercam, class_cams, cam_bg

from test_models import make_pair


class TorchHookLayerCAM:
    """Golden: the reference's hook mechanism (LayerCAM.py:7-81 semantics)."""

    def __init__(self, model, layers=("layer3", "layer4")):
        self.model = model.eval()
        self.layers = layers
        self.acts, self.grads = {}, {}
        for name in layers:
            mod = getattr(model, name)
            mod.register_forward_hook(self._fwd_hook(name))
            mod.register_full_backward_hook(self._bwd_hook(name))

    def _fwd_hook(self, name):
        def hook(module, inputs, output):
            self.acts[name] = output
        return hook

    def _bwd_hook(self, name):
        def hook(module, grad_in, grad_out):
            self.grads[name] = grad_out[0]
        return hook

    def generate(self, images, class_idx, alpha=1.0, mode="per_layer", out_size=64):
        self.acts.clear(); self.grads.clear()
        images = images.requires_grad_()
        logits, _ = self.model(images)
        scores = logits.gather(1, class_idx.view(-1, 1)).squeeze(1)
        self.model.zero_grad()
        scores.backward(torch.ones_like(scores))

        layer_cams = []
        for name in self.layers:
            with torch.no_grad():
                cam = F.relu(self.grads[name] * self.acts[name]).sum(dim=1)
                cam = F.relu(cam)
                flat = cam.flatten(1)
                cam = cam - flat.min(1).values[:, None, None]
                cam = cam / (cam.flatten(1).max(1).values[:, None, None] + 1e-8)
                if mode == "per_layer":
                    cam = cam ** alpha
                    cam = cam - cam.flatten(1).min(1).values[:, None, None]
                    cam = cam / (cam.flatten(1).max(1).values[:, None, None] + 1e-8)
                cam = F.interpolate(cam.unsqueeze(1), size=(out_size, out_size),
                                    mode="bilinear", align_corners=False).squeeze(1)
                layer_cams.append(cam)
        final = sum(layer_cams) / len(layer_cams)
        if mode == "final":
            final = final.clamp(min=0.0) ** alpha
        return final.detach()


@pytest.mark.parametrize("alpha,mode", [(1.0, "per_layer"), (0.5, "per_layer"), (0.5, "final")])
def test_layercam_parity(alpha, mode):
    tmodel, fmodel, variables = make_pair(18, 0.25)
    x = np.random.default_rng(3).standard_normal((2, 64, 64, 3), dtype=np.float32)
    cls = np.array([3, 11], np.int32)

    golden = TorchHookLayerCAM(tmodel, ("layer3", "layer4"))
    ref = golden.generate(
        torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(cls).long(),
        alpha=alpha, mode=mode, out_size=64,
    ).numpy()

    got, _ = layercam(
        fmodel, variables, jnp.asarray(x), jnp.asarray(cls),
        target_layers=("layer3", "layer4"), alpha=alpha, alpha_mode=mode,
        output_size=64,
    )
    got = np.asarray(got)
    assert got.shape == ref.shape == (2, 64, 64)
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_layercam_argmax_class():
    """class_idx=None selects argmax — same as reference LayerCAM.py:44-45."""
    tmodel, fmodel, variables = make_pair(18, 0.25, seed=1)
    x = np.random.default_rng(4).standard_normal((2, 64, 64, 3), dtype=np.float32)
    got_none, logits = layercam(fmodel, variables, jnp.asarray(x), None, output_size=64)
    got_arg, _ = layercam(
        fmodel, variables, jnp.asarray(x), jnp.argmax(logits, axis=1), output_size=64
    )
    np.testing.assert_allclose(np.asarray(got_none), np.asarray(got_arg), atol=1e-6)


def test_classic_cam_parity():
    tmodel, fmodel, variables = make_pair(18, 0.25, seed=2)
    x = np.random.default_rng(5).standard_normal((1, 64, 64, 3), dtype=np.float32)

    with torch.no_grad():
        _, tfeats = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
        f4 = tfeats[-1][0]                       # (C,h,w)
        W = tmodel.fc.weight                     # (K,C)
        ref = torch.relu(torch.einsum("kc,chw->khw", W, f4))
        flat = ref.flatten(1)
        ref = ref - flat.min(1).values[:, None, None]
        ref = ref / (ref.flatten(1).max(1).values[:, None, None] + 1e-8)

    got, _ = class_cams(fmodel, variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got[0]), ref.numpy(), atol=2e-3)


def test_cam_bg_range_and_shape():
    _, fmodel, variables = make_pair(18, 0.25, seed=3)
    x = np.random.default_rng(6).standard_normal((2, 64, 64, 3), dtype=np.float32)
    mask = np.zeros((2, 37), np.float32)
    mask[0, 5] = 1.0
    mask[1, 9] = 1.0
    m_bg, max_obj = cam_bg(fmodel, variables, jnp.asarray(x), jnp.asarray(mask),
                           alpha=2.0, output_size=64)
    assert m_bg.shape == (2, 64, 64) and max_obj.shape == (2, 64, 64)
    assert float(m_bg.min()) >= -1e-5 and float(m_bg.max()) <= 1.0 + 1e-5


def test_layercam_three_layer_variant():
    """The CutLoss variant uses target layers (layer2, layer3, layer4)
    (AlternatingDirectionCutLoss.py:217); parity vs the torch hook golden."""
    tmodel, fmodel, variables = make_pair(18, 0.25, seed=5)
    x = np.random.default_rng(9).standard_normal((2, 64, 64, 3), dtype=np.float32)
    cls = np.array([0, 36], np.int32)

    golden = TorchHookLayerCAM(tmodel, ("layer2", "layer3", "layer4"))
    ref = golden.generate(
        torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(cls).long(),
        alpha=1.0, mode="per_layer", out_size=64,
    ).numpy()
    got, _ = layercam(
        fmodel, variables, jnp.asarray(x), jnp.asarray(cls),
        target_layers=("layer2", "layer3", "layer4"), alpha=1.0,
        alpha_mode="per_layer", output_size=64,
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-3)
