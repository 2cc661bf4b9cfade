from weaklysuperviseddl_tpu.cam.layercam import layercam, layercam_bg  # noqa: F401
from weaklysuperviseddl_tpu.cam.cam import class_cams, cam_bg  # noqa: F401
