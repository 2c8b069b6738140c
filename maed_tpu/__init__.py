"""maed_tpu — a TPU-native (JAX/XLA/Pallas) framework for video-based 3D human
pose and shape estimation with the capabilities of the MAED reference
(ICCV 2021, "Encoder-decoder with Multi-level Attention for 3D Human Shape and
Pose Estimation").

Layer map (mirrors SURVEY.md):
  ops/       pure compute kernels: geometry, SMPL LBS, attention, metrics
  models/    flax modules: ResNetV2 hybrid stem, ViT/STE encoder, KTD/SPIN decoders
  core/      config, loss, trainer, evaluator
  data/      DB loading, clip chunking/sampling, augmentations, loaders
  parallel/  device mesh, shardings, distributed train/eval steps
  utils/     checkpointing, torch->jax conversion, logging
"""

__version__ = "0.1.0"
