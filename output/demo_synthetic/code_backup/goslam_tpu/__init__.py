"""goslam_tpu — a TPU-native dense visual SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of GO-SLAM
(ICCV 2023): recurrent optical-flow tracking over a keyframe factor graph,
dense bundle adjustment with loop closing and online global BA, and an
instant neural-implicit (hash-grid SDF / NeuS) mapper with mesh extraction.

Design stance (vs. the CUDA/torch reference):
  * static shapes everywhere — capacity-padded edge sets + validity masks
  * pure functions over explicit state pytrees, single process
  * device Cholesky for the reduced camera system (no CPU round-trip)
  * scale-out via jax.sharding over the BA edge dim and mapping ray dim
"""

__version__ = "0.1.0"
