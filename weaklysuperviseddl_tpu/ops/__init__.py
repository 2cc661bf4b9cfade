from weaklysuperviseddl_tpu.ops.resize import (  # noqa: F401
    resize_bilinear,
    resize_bicubic,
    resize_nearest,
)
