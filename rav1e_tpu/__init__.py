"""rav1e-tpu: a TPU-native AV1 encoder framework.

A from-scratch re-design of the capabilities of rav1e (the reference AV1
encoder, see SURVEY.md) for TPU hardware:

- device compute path: JAX / XLA / Pallas kernels, batched over superblocks
  and candidate grids (transforms, intra prediction, motion search, in-loop
  filters, distortion, quantization);
- host native path: C++ MSAC entropy coder + bitstream packaging (the
  inherently serial, bit-exact tail of AV1 encoding);
- orchestration: Python (frame queue, GOP/keyframe logic, rate control,
  muxing) mirroring the reference's Context/ContextInner API semantics
  (reference: src/api/context.rs, src/api/internal.rs).

Layout:
  api/      Config / Context / EncoderStatus public API
  obu/      OBU headers, bit writers, IVF muxing (host)
  ec/       MSAC range coder (C++ + python reference impl)
  entropy/  CDF tables, symbol contexts, coefficient tokenization
  ops/      JAX/Pallas signal-processing kernels
  models/   encode pipelines (intra / inter / filter stages)
  parallel/ device mesh, tile sharding, halo exchange
  utils/    frames, planes, math helpers
"""

__version__ = "0.1.0"

from rav1e_tpu.api.config import Config, EncoderConfig, SpeedSettings  # noqa: F401
from rav1e_tpu.api.context import Context, EncoderStatus, Packet  # noqa: F401
