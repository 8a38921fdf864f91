"""paroquant-tpu: TPU-native INT4 weight-only quantization with learned pairwise rotations.

A from-scratch JAX/XLA/Pallas framework with the capabilities of z-lab/paroquant
(reference: INT4 group quantization, group_size=128, K=8 learned pairwise Givens
rotations + per-channel scales, layer-wise distillation calibration, quantized
inference/serving). Everything here is designed TPU-first:

- rotations are composed into dense per-group 128x128 orthogonal matrices that
  ride the MXU (instead of the reference's thread-per-pair CUDA kernel,
  /root/reference/paroquant/kernels/cuda/rotation.cu),
- the inference hot path is one fused Pallas kernel: rotate + int4 dequant +
  matmul in a single HBM pass,
- calibration is a jitted layer-wise distillation loop (optax) instead of the
  reference's eager per-layer torch loop,
- parallelism is jax.sharding over a device Mesh (TP/DP/EP) instead of the
  reference's vLLM/NCCL plugin.
"""

__version__ = "0.1.0"
