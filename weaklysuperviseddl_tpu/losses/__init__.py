from weaklysuperviseddl_tpu.losses.window import (  # noqa: F401
    local_normalized_cut_loss,
    boundary_loss,
    window_affinities,
)
from weaklysuperviseddl_tpu.losses.lovasz import (  # noqa: F401
    lovasz_softmax,
    lovasz_hinge,
    stable_bce,
)
from weaklysuperviseddl_tpu.losses.basic import (  # noqa: F401
    cross_entropy_loss,
    kl_div_batchmean,
)
