from fastscnn_tpu.losses.segmentation import (
    dice_loss,
    mix_dice_loss,
    focal_dice_loss,
    cross_entropy_loss,
    mix_cross_entropy_loss,
    ohem_cross_entropy_loss,
    mix_ohem_cross_entropy_loss,
    get_loss_fn,
    CITYSCAPES_CLASS_WEIGHTS,
)

__all__ = [
    "dice_loss",
    "mix_dice_loss",
    "focal_dice_loss",
    "cross_entropy_loss",
    "mix_cross_entropy_loss",
    "ohem_cross_entropy_loss",
    "mix_ohem_cross_entropy_loss",
    "get_loss_fn",
    "CITYSCAPES_CLASS_WEIGHTS",
]
