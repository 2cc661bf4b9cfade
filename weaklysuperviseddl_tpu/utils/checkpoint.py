"""Checkpoint / resume via orbax.

The reference checkpoints weights-only ``torch.save(state_dict)`` with no
optimizer state, step counter, or resume logic (SURVEY.md §5, C24); the durable
pipeline state is the pseudo-mask PNG dirs. Here:

  * ``save_state``/``restore_state`` persist the FULL training state (params,
    batch_stats, optimizer state, step) — real resume, not weights-only;
  * torch-style ``.pth`` interop remains available through
    models/torch_import.py + the compat ``state_dict()`` methods;
  * the mask store (data/mask_store.py) stays the durable artifact for the
    alternating loop, saved per alternation by ``save_alternation``.
"""

from __future__ import annotations

import os

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except ImportError:  # pragma: no cover
    _HAS_ORBAX = False


def _to_pure(tree):
    return jax.tree.map(np.asarray, tree)


def save_state(path: str, state_tree) -> None:
    """Save an arbitrary pytree (e.g. {'params':…, 'batch_stats':…,
    'opt_state':…, 'step':…}) to ``path``."""
    path = os.path.abspath(path)
    if _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, _to_pure(state_tree), force=True)
        ckptr.wait_until_finished()
    else:  # minimal fallback
        import pickle

        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path + ".pkl", "wb") as f:
            pickle.dump(_to_pure(state_tree), f)


def restore_state(path: str, template_tree):
    """Restore a pytree saved by save_state; template supplies the structure."""
    path = os.path.abspath(path)
    if _HAS_ORBAX and os.path.isdir(path):
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path, _to_pure(template_tree))
    import pickle

    with open(path + ".pkl", "rb") as f:
        tree = pickle.load(f)
    # The pickle path has no orbax template validation; check the tree
    # structure explicitly so resuming with a changed config (different
    # backbone depth, optimizer, ...) fails loudly instead of loading an
    # incompatible tree.
    want = jax.tree.structure(template_tree)
    got = jax.tree.structure(tree)
    if want != got:
        raise ValueError(
            f"checkpoint at {path}.pkl has a different tree structure than the "
            f"current config expects (saved {got}, expected {want}); resume "
            "with the same model/optimizer config it was saved under"
        )
    return tree


def seg_state_tree(state):
    """SegTrainState → checkpointable pytree."""
    return {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
    }


def load_seg_state(state, tree):
    state.params = tree["params"]
    state.batch_stats = tree["batch_stats"]
    state.opt_state = tree["opt_state"]
    state.step = int(tree["step"])
    return state


def _alternation_dirs(root: str) -> dict[int, str]:
    """Map alternation index → snapshot dir name for every RESTORABLE
    snapshot under ``root``. A snapshot is restorable only if its state is
    readable by the backend we actually have (orbax dir only counts when
    orbax is importable; the pickle fallback only counts when state.pkl
    exists) — otherwise latest_alternation would report a snapshot that
    restore_state then fails on with a confusing FileNotFoundError."""
    found: dict[int, str] = {}
    if not os.path.isdir(root):
        return found
    for name in os.listdir(root):
        if not name.startswith("alt_"):
            continue
        try:
            i = int(name[4:])
        except ValueError:
            continue
        state_path = os.path.join(root, name, "state")
        ok = (_HAS_ORBAX and os.path.isdir(state_path)) or os.path.exists(
            state_path + ".pkl"
        )
        # keep the zero-padded canonical name if both alt_7 and alt_007 exist
        if ok and (i not in found or len(name) > len(found[i])):
            found[i] = name
    return found


def latest_alternation(root: str) -> int | None:
    """Highest alternation index with a restorable snapshot under ``root``
    (dirs written by save_alternation), or None if there is none."""
    found = _alternation_dirs(root)
    return max(found) if found else None


def restore_alternation(root: str, state, iteration: int | None = None):
    """Inverse of save_alternation — first-class resume for the alternating
    loop (the reference has no resume at all: weights-only torch.save,
    SURVEY.md §5). Restores the FULL train state (params, BN stats, optimizer
    state, step) and the versioned mask snapshot of ``iteration`` (default:
    latest) into ``state`` / a fresh in-memory MaskStore.

    Returns ``(state, store, next_iteration)`` — feed ``next_iteration`` to
    run_alternating_training(start_iteration=...) to continue the run.
    """
    from weaklysuperviseddl_tpu.data.mask_store import MaskStore

    found = _alternation_dirs(root)
    if iteration is None:
        if not found:
            raise FileNotFoundError(f"no alternation snapshots under {root}")
        iteration = max(found)
    # Reuse the directory name actually on disk (handles hand-made unpadded
    # names like alt_7 as well as the canonical alt_007).
    name = found.get(iteration, f"alt_{iteration:03d}")
    alt_dir = os.path.join(os.path.abspath(root), name)
    tree = restore_state(os.path.join(alt_dir, "state"), seg_state_tree(state))
    state = load_seg_state(state, tree)
    store = MaskStore.load(os.path.join(alt_dir, "masks"))
    return state, store, iteration + 1


def save_alternation(root: str, iteration: int, state, store) -> str:
    """Durable alternating-loop snapshot: train state + versioned mask dir
    (the reference's file-mediated pipeline state, made explicit).

    Crash-atomic: everything is written into a ``.tmp`` staging dir and only
    os.rename()d to ``alt_NNN`` once the state AND every mask PNG are flushed,
    so a kill mid-checkpoint can never leave a snapshot that
    latest_alternation considers restorable but whose mask set is truncated.
    """
    import shutil

    root = os.path.abspath(root)
    alt_dir = os.path.join(root, f"alt_{iteration:03d}")
    tmp_dir = alt_dir + ".tmp"
    if os.path.exists(tmp_dir):  # leftover from a previous crash
        # Drain the async PNG queue before deleting: in-flight writes into
        # the leftover dir would fail mid-rmtree, and failures recorded for
        # the aborted snapshot must not poison this snapshot's durability
        # barrier. But the flush is a GLOBAL barrier — failures for any path
        # OUTSIDE the leftover dir (e.g. the live mask store's async writes)
        # are real durability errors and must propagate, so only failures
        # fully attributed to the tmp dir are swallowed.
        from weaklysuperviseddl_tpu.data.mask_store import _native_io

        nat = _native_io()
        if nat is not None:
            failures, lines = nat.io_flush_report()
            prefix = tmp_dir + os.sep
            foreign = [ln for ln in lines if not ln.startswith(prefix)]
            if foreign or failures > len(lines):
                raise OSError(
                    f"{failures} asynchronous PNG writes failed during the "
                    f"pre-checkpoint drain, not all attributable to the "
                    f"aborted snapshot {tmp_dir}:\n" + "\n".join(
                        foreign or ["(failures beyond the detail cap)"]))
        shutil.rmtree(tmp_dir)
    os.makedirs(tmp_dir)
    save_state(os.path.join(tmp_dir, "state"), seg_state_tree(state))
    from weaklysuperviseddl_tpu.data.mask_store import MaskStore

    snapshot = MaskStore(directory=os.path.join(tmp_dir, "masks"))
    for key in store.keys():
        image, mask = store.get(key)
        snapshot.put(key, image, mask)
    snapshot.flush()  # the snapshot dir must be durable before the rename
    if os.path.exists(alt_dir):  # re-checkpoint of the same iteration
        shutil.rmtree(alt_dir)
    os.rename(tmp_dir, alt_dir)  # the commit point
    return alt_dir
