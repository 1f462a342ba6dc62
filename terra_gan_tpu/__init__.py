"""TERRA-GAN, TPU-native.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
FKGSOFTWARE/TERRA-GAN: GAN-based bare-earth DSM inpainting with a
partial-convolution U-Net generator, PatchGAN discriminator, DSM
preprocessing (masks, splits), MLflow-compatible experiment tracking,
and the human-in-the-loop annotation portal workflow.

Layout (mirrors SURVEY.md §2 component inventory):
  ops/        TPU compute primitives (partial conv, resize, pooling, Pallas kernels)
  models/     PConvUNet generator, PatchGAN discriminator, VGG16 feature net
  losses/     inpainting / boundary-aware / human-guided / adversarial losses
  training/   fused GAN train step, trainers, checkpointing
  parallel/   device mesh, shardings, batched+sharded inference engine
  data/       ASC grids, datasets, mask detectors, geographical splitting, zips
  tracking/   MLflow-file-store-compatible experiment tracker (no mlflow dep)
  portal/     annotation portal HTTP client + stdlib server
  evaluation/ terrain metrics, statistical significance, PSNR/SSIM
  cli/        main_pipeline-compatible driver
"""

__version__ = "0.1.0"
