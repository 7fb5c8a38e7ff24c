from fastscnn_tpu.engine.infer import (
    InferenceEngine,
    E2EConfig,
    IMAGENET_MEAN,
    IMAGENET_STD,
)

__all__ = ["InferenceEngine", "E2EConfig", "IMAGENET_MEAN", "IMAGENET_STD"]
