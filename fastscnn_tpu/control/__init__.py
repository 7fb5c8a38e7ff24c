from fastscnn_tpu.control.visual_controller import VisualLateralErrorController

__all__ = ["VisualLateralErrorController"]
