"""Reference surface: TraditionalModel/ClassificationModel.py.

``FrozenResNetCAM`` keeps the reference contract (ClassificationModel.py:9-41):
callable returning ``(logits, [f2, f3, f4])``, torch-style
state_dict/load_state_dict (via models/torch_import), no-op ``.to``/``.eval``/
``.train`` so reference scripts run unmodified. Internally it owns a flax
CamClassifier + its variables.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from weaklysuperviseddl_tpu.compat._adapt import to_array, to_nhwc
from weaklysuperviseddl_tpu.data.loader import Batch, batches
from weaklysuperviseddl_tpu.models.classifier import CamClassifier
from weaklysuperviseddl_tpu.models.torch_import import cam_classifier_variables
from weaklysuperviseddl_tpu.train import classifier as _train


class FrozenResNetCAM:
    def __init__(self, num_classes: int = 37, depth: int = 50,
                 width_multiplier: float = 1.0, seed: int = 0, **_ignored):
        self.module = CamClassifier(
            num_classes=num_classes, depth=depth, width_multiplier=width_multiplier,
            dilate_layer4=True,
        )
        self.num_classes = num_classes
        self.variables = self.module.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, 224, 224, 3))
        )
        self._apply = jax.jit(lambda v, x: self.module.apply(v, x))

    # --- reference nn.Module surface -----------------------------------------
    def __call__(self, x):
        x, batched = to_nhwc(x)
        logits, feats = self._apply(self.variables, x)
        if not batched:
            return logits, feats
        return logits, feats

    forward = __call__

    def to(self, device=None):
        return self

    def eval(self):
        return self

    def train(self, mode: bool = True):
        return self

    def parameters(self):
        return jax.tree.leaves(self.variables["params"])

    def load_state_dict(self, state_dict, strict: bool = True):
        self.variables = jax.tree.map(
            jnp.asarray, cam_classifier_variables(state_dict)
        )

    def state_dict(self):
        """Torch-convention state dict (inverse of torch_import mapping)."""
        import numpy as np
        import re

        out = {}

        def emit(path, leaf, value):
            key = ".".join(path)
            key = re.sub(r"(layer\d)_(\d+)", r"\1.\2", key)
            key = key.replace("downsample_conv", "downsample.0")
            key = key.replace("downsample_bn", "downsample.1")
            key = re.sub(r"^backbone\.", "", key)
            v = np.asarray(value)
            if leaf == "kernel":
                out[key + ".weight"] = v.transpose(3, 2, 0, 1) if v.ndim == 4 else v.transpose(1, 0)
            elif leaf == "scale":
                out[key + ".weight"] = v
            elif leaf == "bias":
                out[key + ".bias"] = v
            elif leaf == "mean":
                out[key + ".running_mean"] = v
            elif leaf == "var":
                out[key + ".running_var"] = v

        def walk(tree, path):
            for k, v in sorted(tree.items()):
                if isinstance(v, dict):
                    walk(v, path + [k])
                else:
                    emit(path, k, v)

        walk(self.variables["params"], [])
        walk(self.variables.get("batch_stats", {}), [])
        return out


def _as_loader_fn(dataloader):
    """Adapt either our Batch iterable factory or a materialized dataset."""
    if callable(dataloader):
        return dataloader
    cached = list(dataloader) if not isinstance(dataloader, list) else dataloader
    if cached and isinstance(cached[0], Batch):
        return lambda: iter(cached)
    raise TypeError(
        "compat train_fc_only expects an iterable of weaklysuperviseddl_tpu Batch "
        "objects (use data.loader.batches) or a zero-arg factory returning one"
    )


def train_fc_only(model: FrozenResNetCAM, dataloader=None, device=None, epochs: int = 10,
                  num_classes: int = 37, lr: float = 1e-3, image_size: int = 224):
    """Reference signature (both variants: ClassificationModel.py:70 takes
    (model, device, epochs, num_classes); AlternatingDirectionCutLoss.py:116
    takes (model, dataloader, device, epochs)). device args are ignored —
    placement is the mesh's job."""
    if dataloader is None or isinstance(dataloader, str):
        # (model, device, ...) variant: build the split loaders ourselves
        from weaklysuperviseddl_tpu.data import load_split_data

        train_ds, val_ds = load_split_data(None)
        train_loader_fn = lambda: batches(train_ds, 32, shuffle=True, pad_to_full=True)
        val_loader_fn = lambda: batches(val_ds, 8)
    else:
        train_loader_fn = _as_loader_fn(dataloader)
        val_loader_fn = None

    model.variables = _train.train_fc_only(
        model.module, model.variables,
        train_loader_fn=train_loader_fn, val_loader_fn=val_loader_fn,
        epochs=epochs, lr=lr, num_classes=num_classes, image_size=image_size,
    )
    return model


def evaluate_classification(model: FrozenResNetCAM, dataloader, device=None,
                            num_classes: int = 37, image_size: int = 224):
    """Reference signature (ClassificationModel.py:109-150)."""
    return _train.evaluate_classification(
        model.module, model.variables, _as_loader_fn(dataloader)(),
        num_classes=num_classes, image_size=image_size,
    )
