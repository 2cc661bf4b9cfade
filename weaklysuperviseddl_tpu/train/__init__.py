from weaklysuperviseddl_tpu.train.classifier import (  # noqa: F401
    train_fc_only,
    evaluate_classification,
)
from weaklysuperviseddl_tpu.train.segmentation import (  # noqa: F401
    SegTrainState,
    create_seg_state,
    seg_train_step,
    train_segmentation_model,
    evaluate_segmentation,
)
