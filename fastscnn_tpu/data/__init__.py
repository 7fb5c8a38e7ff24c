"""Dataset registry (reference:data_loader/__init__.py:6-29)."""

from fastscnn_tpu.data.cityscapes import CitySegmentation
from fastscnn_tpu.data.tusimple import TUSimpleSegmentation
from fastscnn_tpu.data.bdd100k import BDD100KSegmentation
from fastscnn_tpu.data.custom import CustomDataset
from fastscnn_tpu.data.loader import DataLoader

datasets = {
    "citys": CitySegmentation,
    "tusimple": TUSimpleSegmentation,
    "bdd100k": BDD100KSegmentation,
    "custom": CustomDataset,
}


def get_segmentation_dataset(name, **kwargs):
    """Build a dataset by registry name."""
    return datasets[name.lower()](**kwargs)


__all__ = [
    "datasets",
    "get_segmentation_dataset",
    "CitySegmentation",
    "TUSimpleSegmentation",
    "BDD100KSegmentation",
    "CustomDataset",
    "DataLoader",
]
