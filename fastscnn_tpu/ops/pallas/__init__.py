from fastscnn_tpu.ops.pallas.upsample_argmax import upsample_argmax

__all__ = ["upsample_argmax"]
