"""weaklysuperviseddl_tpu — a TPU-native weakly-supervised segmentation framework.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of the
alexncoleman/WeaklySupervisedDL reference (see SURVEY.md):

* ``models``    — ResNet-50 (dilated) CAM classifier, DeepLabV3, BASNet (flax, NHWC)
* ``cam``       — functional LayerCAM / CAM (jax.vjp, no hooks; one jit, vmap-batched)
* ``masks``     — thresholding, on-device connected components, dense-CRF mean field
* ``losses``    — cross-entropy, Lovász-Softmax/hinge, local normalized-cut and
                  boundary window-affinity losses (Pallas kernels + XLA reference)
* ``train``     — jit'd train steps; alternating-direction mask refinement via
                  lax.scan over optimisation steps, vmap over images
* ``parallel``  — jax.sharding.Mesh helpers for data/model-parallel SPMD
* ``pipelines`` — ablation grid, alternating trainer, supervised baseline,
                  BASNet saliency engine, foundation-model baseline
* ``compat``    — reference-named entry points with reference signatures
* ``native``    — C++ runtime pieces (permutohedral dense-CRF, union-find CC)
"""

__version__ = "0.1.0"
