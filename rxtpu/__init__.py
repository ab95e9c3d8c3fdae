"""rxtpu — TPU-native framework for cellular image classification.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
``antoinecollas/recursion-cellular-image-classification`` (the Kaggle
Recursion Cellular Image Classification pipeline), designed TPU-first:

- ``rxtpu.data``     — metadata/records index, per-experiment statistics,
  native (C++/libjpeg) batch decode, double-buffered host->device pipeline,
  device-fused augmentation.
- ``rxtpu.models``   — Flax backbones (ResNet, DenseNet) with 6-channel
  stems, control-conditioned TwoSites heads, ArcFace margin head.
- ``rxtpu.ops``      — Pallas TPU kernels for the hot data path
  (fused crop+normalize+cast), affine warp, pooling.
- ``rxtpu.train``    — jit-compiled SPMD train step, optimizer/schedule,
  progressive unfreezing, checkpointing, metrics.
- ``rxtpu.infer``    — two-site TTA, plate-leak constrained assignment
  (greedy + Hungarian), submission writer.
- ``rxtpu.parallel`` — device mesh construction and sharding rules
  (data parallel over ICI, optional tensor-parallel classifier head).
- ``rxtpu.utils``    — profiling (step time / input-stall %), logging.

Reference capability map: see SURVEY.md at the repo root. Individual
modules cite the reference behavior they reproduce as ``file:line`` of
``/root/reference``.
"""

__version__ = "0.1.0"
