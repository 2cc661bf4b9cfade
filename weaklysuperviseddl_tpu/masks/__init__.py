from weaklysuperviseddl_tpu.masks.components import label_components, keep_largest  # noqa: F401
from weaklysuperviseddl_tpu.masks.pseudo import cam_to_mask, generate_pseudo_masks  # noqa: F401
