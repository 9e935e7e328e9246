from warp_rnnt_tpu.functional.alignment import rnnt_alignment
from warp_rnnt_tpu.functional.core import rnnt_core, rnnt_core_with_internals
from warp_rnnt_tpu.functional.from_logits import rnnt_loss_from_logits
from warp_rnnt_tpu.functional.gather import flat_arg_formats
from warp_rnnt_tpu.functional.joint_loss import rnnt_loss_joint
from warp_rnnt_tpu.functional.loss import rnnt_loss, rnnt_loss_with_internals
from warp_rnnt_tpu.functional.restricted import rnnt_loss_restricted

__all__ = [
    "flat_arg_formats",
    "rnnt_alignment",
    "rnnt_core",
    "rnnt_core_with_internals",
    "rnnt_loss",
    "rnnt_loss_from_logits",
    "rnnt_loss_joint",
    "rnnt_loss_restricted",
    "rnnt_loss_with_internals",
]
