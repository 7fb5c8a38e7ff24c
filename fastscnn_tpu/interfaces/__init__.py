from fastscnn_tpu.interfaces.realtime import RealtimePipeline, FrameSource, SyntheticCamera
from fastscnn_tpu.interfaces.web_interface import DashboardServer

__all__ = ["RealtimePipeline", "FrameSource", "SyntheticCamera", "DashboardServer"]
