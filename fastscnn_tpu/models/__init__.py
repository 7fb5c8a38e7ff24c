from fastscnn_tpu.models.fast_scnn import (
    FastSCNN,
    init_fast_scnn,
    fold_inference_params,
)
from fastscnn_tpu.models.quantize import (
    PW_INT8_SITES,
    calibrate_pw_scales,
    quantized_model,
)
from fastscnn_tpu.models.registry import get_fast_scnn, DATASET_NUM_CLASSES
from fastscnn_tpu.models.import_torch import (
    import_torch_state_dict,
    load_torch_checkpoint,
    export_torch_state_dict,
)

__all__ = [
    "FastSCNN",
    "init_fast_scnn",
    "fold_inference_params",
    "PW_INT8_SITES",
    "calibrate_pw_scales",
    "quantized_model",
    "get_fast_scnn",
    "DATASET_NUM_CLASSES",
    "import_torch_state_dict",
    "load_torch_checkpoint",
    "export_torch_state_dict",
]
