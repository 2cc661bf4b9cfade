"""BASNet structure + inference-engine tests (weights random — the reference's
pretrained basnet.pth is an external artifact; block-level numerics are covered
by the ResNet BasicBlock parity tests)."""

import numpy as np
import jax
import jax.numpy as jnp

from weaklysuperviseddl_tpu.models.basnet import BASNet
from weaklysuperviseddl_tpu.pipelines.basnet_infer import (
    build_basnet,
    norm_pred,
    run_inference,
    saliency_step,
)
from weaklysuperviseddl_tpu.data import download_data


def test_basnet_output_contract():
    model = BASNet()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    outs = model.apply(variables, jnp.zeros((2, 64, 64, 3)), train=False)
    assert len(outs) == 8  # (dout, d1..d6, db) — ref BASNet.py:344
    for o in outs:
        assert o.shape == (2, 64, 64, 1)
        assert float(o.min()) >= 0.0 and float(o.max()) <= 1.0  # sigmoids


def test_basnet_param_names_match_torch_keys():
    """Flax module names must line up with the reference state-dict keys so
    pretrained basnet.pth ingests through torch_import."""
    model = BASNet()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    params = variables["params"]
    for name in ("inconv", "inbn", "encoder1_0", "encoder4_2", "resb5_1", "resb6_3",
                 "convbg_1", "bnbg_m", "conv6d_1", "bn6d_2", "conv1d_m",
                 "outconvb", "outconv1", "refunet"):
        assert name in params, f"missing module {name}: {sorted(params)[:20]}"
    assert "conv_d0" in params["refunet"]
    # BASNet convs carry biases (unlike torchvision resnet convs)
    assert "bias" in params["inconv"]


def test_basnet_torch_statedict_roundtrip():
    """Fabricate a torch-style state dict from flax params (inverse mapping)
    and check torch_to_flax reproduces the exact tree."""
    from weaklysuperviseddl_tpu.models.torch_import import torch_to_flax

    model = BASNet()
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)), train=False)

    state_dict = {}

    def emit(path, leaf, value):
        key = ".".join(path)
        # flax name_with_index -> torch name.index for stage blocks
        import re
        key = re.sub(r"(encoder\d)_(\d+)", r"\1.\2", key)
        key = key.replace("downsample_conv", "downsample.0")
        key = key.replace("downsample_bn", "downsample.1")
        v = np.asarray(value)
        if leaf == "kernel":
            state_dict[key + ".weight"] = v.transpose(3, 2, 0, 1)
        elif leaf == "scale":
            state_dict[key + ".weight"] = v
        elif leaf == "bias":
            state_dict[key + ".bias"] = v
        elif leaf == "mean":
            state_dict[key + ".running_mean"] = v
        elif leaf == "var":
            state_dict[key + ".running_var"] = v

    def walk(tree, path):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, path + [k])
            else:
                emit(path, k, v)

    walk(variables["params"], [])
    walk(variables["batch_stats"], [])

    params, batch_stats = torch_to_flax(state_dict)
    for got, want in zip(jax.tree.leaves(params), jax.tree.leaves(variables["params"])):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    for got, want in zip(jax.tree.leaves(batch_stats), jax.tree.leaves(variables["batch_stats"])):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_norm_pred_minmax():
    d = jnp.asarray([[[0.2, 0.4], [0.6, 1.0]]])
    out = np.asarray(norm_pred(d))
    assert abs(out.min()) < 1e-6 and abs(out.max() - 1.0) < 1e-6


def test_inference_engine_end_to_end(tmp_path):
    ds = download_data(None, split="test", synthetic_size=6, image_size=64)
    model, variables = build_basnet(weights_path=None)
    logs = []
    results, miou, macc = run_inference(
        ds, model=model, variables=variables, num_images=4, batch_size=4,
        output_folder=str(tmp_path), log=logs.append,
    )
    assert len(results) == 4
    assert 0.0 <= miou <= 1.0 and 0.0 <= macc <= 1.0
    import os
    assert len([f for f in os.listdir(tmp_path) if f.endswith("_saliency.png")]) == 4
    assert any("Mean IoU" in s for s in logs)
