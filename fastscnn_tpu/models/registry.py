"""Model factory mirroring ``get_fast_scnn`` (reference:models/fast_scnn.py:240-256).

Resolves ``num_classes`` from the dataset name and optionally loads a
reference-format ``.pth`` checkpoint from ``<root>/fast_scnn_<acronym>.pth``.
"""

from __future__ import annotations

import os

from fastscnn_tpu.models.fast_scnn import FastSCNN, init_fast_scnn

__all__ = ["get_fast_scnn", "DATASET_NUM_CLASSES", "DATASET_ACRONYMS"]

# NUM_CLASS constants of the four reference datasets
# (reference:data_loader/{cityscapes,tusimple,bdd100k,custom}.py).
DATASET_NUM_CLASSES = {
    "citys": 19,
    "tusimple": 2,
    "bdd100k": 2,  # binary drivable by default; ternary uses 3
    "custom": 2,
}

DATASET_ACRONYMS = {
    "pascal_voc": "voc",
    "pascal_aug": "voc",
    "ade20k": "ade",
    "coco": "coco",
    "citys": "citys",
    "tusimple": "tusimple",
    "bdd100k": "bdd100k",
    "custom": "custom",
}


def get_fast_scnn(
    dataset: str = "citys",
    pretrained: bool = False,
    root: str = "./weights",
    aux: bool = False,
    num_classes: int | None = None,
    seed: int = 0,
):
    """Build (model, params, state) for a named dataset.

    With ``pretrained=True``, loads ``<root>/fast_scnn_<acronym>.pth`` via
    the torch importer (all checkpoint dialects supported).
    """
    import jax

    if num_classes is None:
        if dataset not in DATASET_NUM_CLASSES:
            raise ValueError(
                f"dataset {dataset!r} has no bundled loader/num_classes "
                f"(supported: {sorted(DATASET_NUM_CLASSES)}); pass "
                "num_classes= explicitly to build a model for it"
            )
        num_classes = DATASET_NUM_CLASSES[dataset]
    model = FastSCNN(num_classes=num_classes, aux=aux)
    if pretrained:
        from fastscnn_tpu.models.import_torch import load_torch_checkpoint

        path = os.path.join(root, f"fast_scnn_{DATASET_ACRONYMS[dataset]}.pth")
        params, state = load_torch_checkpoint(path, num_classes, aux=aux or None)
    else:
        params, state = init_fast_scnn(jax.random.PRNGKey(seed), num_classes, aux)
    return model, params, state
