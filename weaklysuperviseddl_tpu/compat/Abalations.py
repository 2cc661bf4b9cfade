"""Reference surface: TraditionalModel/Abalations.py (typo preserved).

The reference's grid driver with its call defects repaired to the evident
intent (SURVEY.md §2.4): run_ablation takes the classifier + loaders it
actually needs, the grid is LayerCAM × thresholds × alphas × lrs ×
keep_largest with 3 repeats and mean/stdev summaries.
"""

from __future__ import annotations

import itertools

from weaklysuperviseddl_tpu.config import ExperimentConfig, smoke_config
from weaklysuperviseddl_tpu.pipelines.ablations import (
    default_grid,
    run_ablation as _run_ablation,
    run_ablation_experiment as _run_experiment,
)


def run_ablation(classifier, save_path, loader, test_loader, cam_method,
                 cam_thresh, alpha, lr, keep_largest, run_id,
                 cfg: ExperimentConfig | None = None, log=print):
    """Reference signature (Abalations.py:9-29). ``classifier`` is a compat
    FrozenResNetCAM; ``save_path`` (a .pth) loads when present."""
    import os

    if save_path and os.path.exists(save_path):
        from weaklysuperviseddl_tpu.models.torch_import import load_pth

        classifier.load_state_dict(load_pth(save_path))

    cfg = cfg or ExperimentConfig()
    return _run_ablation(
        classifier.module, classifier.variables,
        train_loader=loader, test_loader=test_loader,
        cam_method=cam_method, cam_thresh=cam_thresh, alpha=alpha, lr=lr,
        keep_largest=keep_largest, run_id=run_id, cfg=cfg, log=log,
    )


def run_abalation_experiment(all_combinations, classifier=None,
                             cfg: ExperimentConfig | None = None,
                             num_repeats: int = 3, log=print):
    """Reference signature (Abalations.py:32-81), typo'd name preserved."""
    cfg = cfg or smoke_config()
    if classifier is None:
        from weaklysuperviseddl_tpu.pipelines.weakly import build_classifier

        model, variables = build_classifier(cfg)
    else:
        model, variables = classifier.module, classifier.variables
    return _run_experiment(all_combinations, model, variables, cfg,
                           num_repeats=num_repeats, log=log)


run_ablation_experiment = run_abalation_experiment  # correctly-spelled alias


def main():
    cam_methods = ["LayerCAM"]
    cam_thresholds = [0.3, 0.5, 0.7]
    alphas = [1.0]
    lrs = [1e-2, 1e-3, 1e-4, 1e-5]
    keep_largest_opts = [True]
    all_combinations = list(itertools.product(
        cam_methods, cam_thresholds, alphas, lrs, keep_largest_opts
    ))
    return run_abalation_experiment(all_combinations)


if __name__ == "__main__":
    main()
