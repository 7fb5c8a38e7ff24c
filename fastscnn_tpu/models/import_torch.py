"""PyTorch ``.pth`` checkpoint ⇄ JAX pytree conversion for Fast-SCNN.

Reference checkpoints (``fast_scnn_citys.pth``, ``fast_scnn_tusimple.pth``,
``fast_scnn_bdd100k.pth``, …) are flat ``state_dict`` mappings whose keys
follow the torch module tree of reference:models/fast_scnn.py. Three
checkpoint dialects exist in the reference and are all handled here
(reference SURVEY §5.4):

1. raw ``state_dict``                        (reference:train.py:442-456)
2. ``DataParallel``-wrapped with ``module.`` prefixes
   (stripped as in reference:export_onnx.py:47-50)
3. dict checkpoints ``{'model': state_dict, 'epoch': …, 'args': …}``
   (reference:train_custom_finetune.py:213-238)

Weight layout conversion: torch conv weights are OIHW → our HWIO
(``transpose(2, 3, 1, 0)``); depthwise convs are (C, 1, kh, kw) →
(kh, kw, 1, C). BN ``weight/bias/running_mean/running_var`` map to
``scale/bias`` (params) and ``mean/var`` (state).

``allow_shape_mismatch=True`` reproduces the shape-filtered partial load
used for transfer learning (reference:train_custom_finetune.py:81-96):
mismatched leaves (e.g. a different-class classifier head) keep their
freshly initialized values.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np
import jax.numpy as jnp

from fastscnn_tpu.models.fast_scnn import init_fast_scnn

__all__ = [
    "import_torch_state_dict",
    "load_torch_checkpoint",
    "export_torch_state_dict",
    "TORCH_KEY_MAP",
]


def _cbr_map(torch_prefix: str, path: tuple, conv_idx: int = 0, bn_idx: int = 1):
    """Key map for a _ConvBNReLU-style Sequential(conv, bn, relu)."""
    return [
        (f"{torch_prefix}.{conv_idx}.weight", path + ("w",), "conv"),
        (f"{torch_prefix}.{bn_idx}.weight", path + ("bn", "scale"), "vec"),
        (f"{torch_prefix}.{bn_idx}.bias", path + ("bn", "bias"), "vec"),
        (f"{torch_prefix}.{bn_idx}.running_mean", path + ("bn", "mean"), "vec:state"),
        (f"{torch_prefix}.{bn_idx}.running_var", path + ("bn", "var"), "vec:state"),
    ]


def _ds_map(torch_prefix: str, path: tuple):
    """_DSConv: Sequential(dwconv, bn, relu, pwconv, bn, relu)
    reference:models/fast_scnn.py:64-79."""
    return _cbr_map(f"{torch_prefix}.conv", path + ("dw",), 0, 1) + _cbr_map(
        f"{torch_prefix}.conv", path + ("pw",), 3, 4
    )


def _bottleneck_map(torch_prefix: str, path: tuple):
    """LinearBottleneck.block = Sequential(_ConvBNReLU, _DWConv, conv, bn)
    reference:models/fast_scnn.py:101-109."""
    entries = []
    entries += _cbr_map(f"{torch_prefix}.block.0.conv", path + ("expand",))
    entries += _cbr_map(f"{torch_prefix}.block.1.conv", path + ("dw",))
    entries += [
        (f"{torch_prefix}.block.2.weight", path + ("project", "w"), "conv"),
        (f"{torch_prefix}.block.3.weight", path + ("project", "bn", "scale"), "vec"),
        (f"{torch_prefix}.block.3.bias", path + ("project", "bn", "bias"), "vec"),
        (f"{torch_prefix}.block.3.running_mean", path + ("project", "bn", "mean"), "vec:state"),
        (f"{torch_prefix}.block.3.running_var", path + ("project", "bn", "var"), "vec:state"),
    ]
    return entries


def _build_key_map(num_gfe_blocks=(3, 3, 3), aux: bool = True):
    m: list[tuple[str, tuple, str]] = []
    # LearningToDownsample
    m += _cbr_map("learning_to_downsample.conv.conv", ("learning_to_downsample", "conv"))
    m += _ds_map("learning_to_downsample.dsconv1", ("learning_to_downsample", "dsconv1"))
    m += _ds_map("learning_to_downsample.dsconv2", ("learning_to_downsample", "dsconv2"))
    # GlobalFeatureExtractor
    for stage, n in enumerate(num_gfe_blocks, start=1):
        for i in range(n):
            m += _bottleneck_map(
                f"global_feature_extractor.bottleneck{stage}.{i}",
                ("global_feature_extractor", f"bottleneck{stage}", i),
            )
    for name in ("conv1", "conv2", "conv3", "conv4", "out"):
        m += _cbr_map(
            f"global_feature_extractor.ppm.{name}.conv",
            ("global_feature_extractor", "ppm", name),
        )
    # FeatureFusionModule
    m += _cbr_map("feature_fusion.dwconv.conv", ("feature_fusion", "dwconv"))
    for torch_name, ours in (("conv_lower_res", "conv_lower_res"), ("conv_higher_res", "conv_higher_res")):
        m += [
            (f"feature_fusion.{torch_name}.0.weight", ("feature_fusion", ours, "w"), "conv"),
            (f"feature_fusion.{torch_name}.0.bias", ("feature_fusion", ours, "b"), "vec"),
        ]
        m += [
            (f"feature_fusion.{torch_name}.1.weight", ("feature_fusion", ours, "bn", "scale"), "vec"),
            (f"feature_fusion.{torch_name}.1.bias", ("feature_fusion", ours, "bn", "bias"), "vec"),
            (f"feature_fusion.{torch_name}.1.running_mean", ("feature_fusion", ours, "bn", "mean"), "vec:state"),
            (f"feature_fusion.{torch_name}.1.running_var", ("feature_fusion", ours, "bn", "var"), "vec:state"),
        ]
    # Classifier ("Classifer" in the reference)
    m += _ds_map("classifier.dsconv1", ("classifier", "dsconv1"))
    m += _ds_map("classifier.dsconv2", ("classifier", "dsconv2"))
    m += [
        ("classifier.conv.1.weight", ("classifier", "conv", "w"), "conv"),
        ("classifier.conv.1.bias", ("classifier", "conv", "b"), "vec"),
    ]
    if aux:
        m += [
            ("auxlayer.0.weight", ("auxlayer", "conv1", "w"), "conv"),
            ("auxlayer.1.weight", ("auxlayer", "conv1", "bn", "scale"), "vec"),
            ("auxlayer.1.bias", ("auxlayer", "conv1", "bn", "bias"), "vec"),
            ("auxlayer.1.running_mean", ("auxlayer", "conv1", "bn", "mean"), "vec:state"),
            ("auxlayer.1.running_var", ("auxlayer", "conv1", "bn", "var"), "vec:state"),
            ("auxlayer.4.weight", ("auxlayer", "conv2", "w"), "conv"),
            ("auxlayer.4.bias", ("auxlayer", "conv2", "b"), "vec"),
        ]
    return m


TORCH_KEY_MAP = _build_key_map()


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _convert(value: np.ndarray, kind: str) -> np.ndarray:
    if kind.startswith("conv"):
        # OIHW → HWIO. Depthwise (C,1,kh,kw) → (kh,kw,1,C) falls out of the
        # same transpose because torch groups==C stores I=1.
        return np.transpose(value, (2, 3, 1, 0))
    return value


def _set_path(tree: dict, path: tuple, value):
    node = tree
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = value


def _get_path(tree: dict, path: tuple):
    node = tree
    for p in path:
        node = node[p]
    return node


def import_torch_state_dict(
    state_dict: Mapping[str, Any],
    num_classes: int,
    aux: bool | None = None,
    allow_shape_mismatch: bool = False,
    seed: int = 0,
):
    """Convert a torch ``state_dict`` into ``(params, state)`` pytrees.

    Returns trees structurally identical to :func:`init_fast_scnn`'s output;
    leaves not present in the checkpoint (e.g. aux head when ``aux=True`` but
    the checkpoint has none) keep their initialized values.
    """
    import jax

    sd = {k: v for k, v in state_dict.items()}
    # dialect 3: dict checkpoint
    if "model" in sd and not any("." in k for k in sd):
        sd = dict(sd["model"])
    # dialect 2: DataParallel prefix
    sd = { (k[7:] if k.startswith("module.") else k): v for k, v in sd.items() }

    has_aux = any(k.startswith("auxlayer.") for k in sd)
    if aux is None:
        aux = has_aux
    params, state = init_fast_scnn(jax.random.PRNGKey(seed), num_classes, aux)

    key_map = _build_key_map(aux=aux and has_aux)
    missing, skipped = [], []
    for torch_key, path, kind in key_map:
        if torch_key not in sd:
            missing.append(torch_key)
            continue
        value = _convert(_to_numpy(sd[torch_key]), kind)
        target = state if kind.endswith(":state") else params
        current = _get_path(target, path)
        if tuple(current.shape) != tuple(value.shape):
            if allow_shape_mismatch:
                skipped.append((torch_key, tuple(value.shape), tuple(current.shape)))
                continue
            raise ValueError(
                f"shape mismatch for {torch_key}: checkpoint {value.shape} vs model {current.shape}"
                " (pass allow_shape_mismatch=True for transfer-learning partial load)"
            )
        _set_path(target, path, jnp.asarray(value, dtype=current.dtype))
    if missing and not allow_shape_mismatch:
        # Only complain about genuinely expected keys.
        hard_missing = [k for k in missing if not k.startswith("auxlayer.")]
        if hard_missing:
            raise KeyError(f"checkpoint is missing {len(hard_missing)} keys, e.g. {hard_missing[:5]}")
    return params, state


def load_torch_checkpoint(path: str, num_classes: int, **kwargs):
    """Load a ``.pth`` file (any of the three dialects) into pytrees.

    Mirrors ``get_fast_scnn(pretrained=True, map_cpu=True)``
    (reference:models/fast_scnn.py:240-256) without needing a GPU.
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd and hasattr(sd["model"], "keys"):
        sd = sd["model"]
    return import_torch_state_dict(sd, num_classes, **kwargs)


def export_torch_state_dict(params, state, aux: bool | None = None) -> dict[str, np.ndarray]:
    """Inverse conversion: our pytrees → a torch-layout ``state_dict`` of
    numpy arrays (OIHW conv weights), so models trained here can be saved
    in the reference's checkpoint format and consumed by its tooling."""
    if aux is None:
        aux = "auxlayer" in params
    out: dict[str, np.ndarray] = {}
    for torch_key, path, kind in _build_key_map(aux=aux):
        target = state if kind.endswith(":state") else params
        try:
            value = np.asarray(_get_path(target, path))
        except KeyError:
            continue
        if kind.startswith("conv"):
            value = np.transpose(value, (3, 2, 0, 1))
        out[torch_key] = value
    return out
