from weaklysuperviseddl_tpu.utils import metrics  # noqa: F401
