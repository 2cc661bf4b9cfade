from weaklysuperviseddl_tpu.pipelines.weakly import (  # noqa: F401
    run_weakly_supervised,
    run_weakly_supervised_alternating,
)
from weaklysuperviseddl_tpu.pipelines.supervised import run_supervised_training  # noqa: F401
from weaklysuperviseddl_tpu.pipelines.ablations import (  # noqa: F401
    run_ablation,
    run_ablation_experiment,
)
