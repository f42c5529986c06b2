"""next3d_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for 3D-aware
generative head avatars with the capabilities of MrTornado24/Next3D.

Layering (bottom -> top), mirroring the reference's structure
(see SURVEY.md section 1) but as one idiomatic package:

  ops/       resampling / activation / sampling primitives (reference:
             torch_utils/ops/* CUDA extensions -> pure-XLA + Pallas kernels)
  nn/        StyleGAN2 modules, StyleUNet, super-resolution, discriminators
             (reference: training_avatar_texture/networks_*.py)
  render/    rays, tri-plane sampling, importance ray marching, the TPU mesh
             rasterizer (reference: volumetric_rendering/* + PyTorch3D)
  models/    TriPlaneGenerator variants + OSGDecoder
             (reference: training_avatar_texture/triplane*.py)
  train/     losses, jitted train phases, training loop
             (reference: training_avatar_texture/{loss,training_loop}.py)
  data/      dataset packing/loading (reference: dataset.py, dataset_tool.py)
  metrics/   FID/KID machinery (reference: metrics/*)
  parallel/  device-mesh helpers, cross-device stats (reference: NCCL plumbing)
  utils/     config, checkpointing, .pkl import, obj IO, logging
"""

__version__ = "0.1.0"
