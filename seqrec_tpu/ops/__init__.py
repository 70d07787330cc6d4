from seqrec_tpu.ops.core import gather_sum, grad_clip, masked_top_k
from seqrec_tpu.ops import losses

__all__ = ["gather_sum", "grad_clip", "masked_top_k", "losses"]
