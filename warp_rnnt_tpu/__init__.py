"""warp_rnnt_tpu: a TPU-native RNN-Transducer loss framework.

Brand-new JAX/Pallas implementation with the full capability surface of the
CUDA reference (1ytic/warp-rnnt): padded, gathered and compact lattice
layouts, FastEmit, reductions, analytic gradients via custom_vjp, data
parallelism over device meshes, plus models/benchmarks/tests.
"""

from warp_rnnt_tpu.functional import (
    flat_arg_formats,
    rnnt_alignment,
    rnnt_core,
    rnnt_core_with_internals,
    rnnt_loss,
    rnnt_loss_from_logits,
    rnnt_loss_joint,
    rnnt_loss_restricted,
    rnnt_loss_with_internals,
)
from warp_rnnt_tpu.ops.fused_joint import rnnt_loss_fused_joint

__version__ = "0.1.0"

__all__ = [
    "flat_arg_formats",
    "rnnt_alignment",
    "rnnt_core",
    "rnnt_core_with_internals",
    "rnnt_loss",
    "rnnt_loss_from_logits",
    "rnnt_loss_fused_joint",
    "rnnt_loss_joint",
    "rnnt_loss_restricted",
    "rnnt_loss_with_internals",
    "__version__",
]
