"""saunet-tpu: a TPU-native (JAX/XLA/pjit/Pallas) medical-image segmentation framework.

A from-scratch rebuild of the capabilities of sunjesse/shape-attentive-unet
(SAUNet, MICCAI 2020): ACDC cardiac-MRI dual-task segmentation (texture + shape
streams) with dual-attention decoding, an on-device edge operator, a fully
on-device augmentation pipeline, data-parallel SPMD training over a TPU mesh,
and a gradient-transform interpretability suite.

Layout (NHWC everywhere; reference is NCHW torch):
  models/    -- flax modules: blocks, DenseNet-121 encoder, SAUNet assembly
  ops/       -- XLA/Pallas compute ops: resize, edge detection, morphology
  parallel/  -- mesh construction + sharding rules (DP + spatial axes)
  data/      -- NIfTI IO, ACDC dataset, host pipeline, on-device augmentation
  train/     -- train state, train/eval steps, metrics, checkpointing
  interpret/ -- vanilla/guided/SmoothGrad saliency as grad transforms
  utils/     -- config, meters, misc
"""

__version__ = "0.1.0"
