from warp_rnnt_tpu.reference.numpy_oracle import transduce_batch, transduce_single

__all__ = ["transduce_batch", "transduce_single"]
