"""CoDA-TPU: a TPU-native open-vocabulary 3D object detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
yangcaoai/CoDA_NeurIPS2023 (open-vocabulary 3D detection: 3DETR encoder-decoder
over point clouds + CLIP open-vocabulary heads + two-stage novel-object
discovery training).

Design stance (TPU-first, not a port):
  * channels-last (B, N, C) static-shape tensors everywhere; everything jits.
  * point-cloud ops (FPS / ball query / grouping) are XLA+Pallas kernels,
    not CUDA translations.
  * the Hungarian matcher, rotated gIoU and the CLIP crop loop -- host/CPU
    escapes in the reference -- run on device here.
  * data parallelism is a batch-sharded `jax.jit` over a `jax.sharding.Mesh`
    (the reference's DDP/NCCL, utils/dist.py) -- no process-per-device.
"""

__version__ = "0.1.0"
