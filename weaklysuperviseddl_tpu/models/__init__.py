from weaklysuperviseddl_tpu.models.resnet import ResNetBackbone  # noqa: F401
from weaklysuperviseddl_tpu.models.classifier import CamClassifier  # noqa: F401
