"""FC-only classifier training — the "frozen backbone" expressed functionally.

Reference: ``train_fc_only`` (TraditionalModel/ClassificationModel.py:70-106,
AlternatingDirectionCutLoss.py:116-141): Adam(1e-3) on the fc layer only,
CrossEntropy over 37 breeds, per-epoch train acc + val acc/macro-F1.

TPU design: instead of requires_grad flags, the train step differentiates only
w.r.t. the fc params (backbone params enter as a closure constant — XLA sees
them as literals and constant-folds the frozen graph aggressively). One jit per
step, batch sharded on the 'data' mesh axis; metric counters are psummed by
XLA automatically since outputs are replicated sums.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from weaklysuperviseddl_tpu.data.preprocess import preprocess_batch
from weaklysuperviseddl_tpu.losses.basic import per_example_nll
from weaklysuperviseddl_tpu.utils.metrics import (
    classification_counts,
    finish_macro_f1,
)


def make_fc_train_step(model, tx):
    """Build a jit'd step: grads w.r.t. fc params only.

    ``valid`` ([B] bool, optional) masks padded rows (loader ``pad_to_full``)
    out of both the loss mean and the ``correct`` counter, mirroring the seg
    step — otherwise a duplicated tail example over-weights the gradient and
    train accuracy can exceed 100%.
    """

    @partial(jax.jit, donate_argnums=(1, 2))
    def step(frozen, fc_params, opt_state, images, labels, valid=None):
        w = (jnp.ones(labels.shape[0], jnp.float32) if valid is None
             else valid.astype(jnp.float32))

        def loss_fn(fc_p):
            variables = {
                "params": {**frozen["params"], "fc": fc_p},
                "batch_stats": frozen["batch_stats"],
            }
            logits, _ = model.apply(variables, images)
            nll = per_example_nll(logits, labels)  # [B]
            return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(fc_params)
        updates, opt_state = tx.update(grads, opt_state, fc_params)
        fc_params = optax.apply_updates(fc_params, updates)
        correct = jnp.sum((jnp.argmax(logits, axis=1) == labels) * w).astype(jnp.int32)
        return fc_params, opt_state, loss, correct

    return step


def split_frozen(variables):
    """(frozen backbone tree incl. batch_stats, trainable fc params)."""
    params = dict(variables["params"])
    fc = params.pop("fc")
    frozen = {"params": params, "batch_stats": variables.get("batch_stats", {})}
    return frozen, fc


def merge_frozen(frozen, fc_params):
    return {
        "params": {**frozen["params"], "fc": fc_params},
        "batch_stats": frozen["batch_stats"],
    }


def train_fc_only(
    model,
    variables,
    train_loader_fn,
    val_loader_fn=None,
    epochs: int = 10,
    lr: float = 1e-3,
    num_classes: int = 37,
    image_size: int = 224,
    interpolation: str = "bilinear",
    log=print,
):
    """Epoch loop matching the reference's printout contract
    (ClassificationModel.py:98-104). ``*_loader_fn()`` returns a fresh
    iterator of Batch objects per epoch. Returns updated variables."""
    tx = optax.adam(lr)
    frozen, fc_params = split_frozen(variables)
    opt_state = tx.init(fc_params)
    step = make_fc_train_step(model, tx)

    for epoch in range(epochs):
        total_loss, correct, total = 0.0, 0, 0
        for batch in train_loader_fn():
            x, _ = preprocess_batch(
                jnp.asarray(batch.image), None, size=image_size, interpolation=interpolation
            )
            labels = jnp.asarray(batch.label)
            valid = jnp.arange(labels.shape[0]) < batch.num_valid
            fc_params, opt_state, loss, corr = step(
                frozen, fc_params, opt_state, x, labels, valid
            )
            bsz = batch.num_valid
            total_loss += float(loss) * bsz
            correct += int(corr)
            total += bsz
        log(
            f"Epoch {epoch + 1}/{epochs} - Train Loss: {total_loss / total:.4f}"
            f" - Train Acc: {100 * correct / total:.2f}%"
        )
        if val_loader_fn is not None:
            acc, f1 = evaluate_classification(
                model, merge_frozen(frozen, fc_params), val_loader_fn(),
                num_classes=num_classes, image_size=image_size,
                interpolation=interpolation, log=log,
            )
            log(f"           --> Val Acc: {acc:.2f}% - Val F1: {f1:.4f}")

    return merge_frozen(frozen, fc_params)


def evaluate_classification(
    model, variables, loader, num_classes: int = 37, image_size: int = 224,
    interpolation: str = "bilinear", log=print,
):
    """Accuracy + macro-F1 via accumulated per-class counters
    (ref ClassificationModel.py:109-150)."""

    @partial(jax.jit)
    def counts_step(images, labels, valid):
        logits, _ = model.apply(variables, images)
        preds = jnp.argmax(logits, axis=1)
        return classification_counts(preds, labels, num_classes, valid=valid)

    acc = None
    for batch in loader:
        x, _ = preprocess_batch(
            jnp.asarray(batch.image), None, size=image_size, interpolation=interpolation
        )
        valid = jnp.arange(batch.image.shape[0]) < batch.num_valid
        c = counts_step(x, jnp.asarray(batch.label), valid)
        acc = c if acc is None else jax.tree.map(jnp.add, acc, c)
    accuracy, macro_f1 = finish_macro_f1(acc)
    accuracy, macro_f1 = float(accuracy), float(macro_f1)
    log(f"Evaluation - Accuracy: {accuracy:.2f}% - F1 Score (macro): {macro_f1:.4f}")
    return accuracy, macro_f1
