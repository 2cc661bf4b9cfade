"""Reference-named entry points with reference signatures.

BASELINE.json requires the public entry points of the reference —
``ClassificationModel``, ``LayerCAM``, ``PsuedoMasks``, ``SegmentationModel``,
``RunInference`` (plus their sibling modules) — to keep their signatures. Each
module here is a thin adapter from the reference's torch-flavoured surface
(NCHW arrays, stateful model objects, hook-based generators) onto the
TPU-native functional core. Arrays may be numpy, jnp, or torch tensors in
either NCHW or NHWC; outputs are jnp arrays shaped like the reference's.
"""

from weaklysuperviseddl_tpu.compat import (  # noqa: F401
    ClassificationModel,
    ExtraUtilities,
    LayerCAM,
    PsuedoMasks,
    SegmentationDataset,
    SegmentationModel,
)
