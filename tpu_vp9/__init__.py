"""tpu_vp9 — a TPU-native VP9 encoder framework (JAX/XLA/Pallas).

A from-scratch re-design of the capabilities of SVT-VP9
(OpenVisualCloud/SVT-VP9) for TPU hardware:

- the heavy per-superblock compute (transforms, quantization, intra/inter
  prediction, motion-estimation SAD, loop filter) runs as batched JAX/Pallas
  ops over ``[num_blocks, ...]`` tensors on the MXU/VPU;
- the VP9-normative serialization layer (boolean range coder, headers,
  token packing) runs on the host (C++ fast path with a pure-Python
  reference);
- scale-out is expressed with ``jax.sharding`` meshes (tile-column sharding
  within a frame, GOP parallelism across hosts) instead of thread pools.

Public API mirrors the reference 7-step lifecycle
(``Source/API/EbSvtVp9Enc.h`` of the reference): see `tpu_vp9.api`.
"""

__version__ = "0.1.0"

from tpu_vp9.config import EncoderConfig  # noqa: F401
