from warp_rnnt_tpu.models.beam_search import beam_decode
from warp_rnnt_tpu.models.decoding import greedy_decode
from warp_rnnt_tpu.models.joint import Joint
from warp_rnnt_tpu.models.streaming import (
    stream_finish,
    stream_init,
    stream_step,
)
from warp_rnnt_tpu.models.transducer import (
    Encoder,
    Predictor,
    Transducer,
    init_model,
    make_train_step,
    transducer_loss_fn,
)

__all__ = [
    "beam_decode",
    "greedy_decode",
    "Joint",
    "Encoder",
    "Predictor",
    "Transducer",
    "init_model",
    "make_train_step",
    "transducer_loss_fn",
    "stream_init",
    "stream_step",
    "stream_finish",
]
