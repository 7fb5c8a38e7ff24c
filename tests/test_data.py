"""Dataset loaders: fixture-tree construction + parity vs reference loaders.

Parity protocol: both implementations use the module-global ``random``
for augmentation; seeding it identically before each __getitem__ must
produce identical images and masks.
"""

import os
import random
import sys
import time

import numpy as np
import pytest
from PIL import Image

from fastscnn_tpu.data import DataLoader, get_segmentation_dataset
from tests.conftest import REFERENCE_ROOT, requires_reference, requires_torch


@pytest.fixture(scope="module")
def city_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("citys")
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        img_dir = root / "leftImg8bit" / split / "cityA"
        mask_dir = root / "gtFine" / split / "cityA"
        img_dir.mkdir(parents=True)
        mask_dir.mkdir(parents=True)
        for i in range(3):
            img = rng.integers(0, 255, (128, 256, 3), dtype=np.uint8)
            mask = rng.choice([0, 7, 8, 26, 33], size=(128, 256)).astype(np.uint8)
            Image.fromarray(img).save(img_dir / f"cityA_{i:06d}_leftImg8bit.png")
            Image.fromarray(mask).save(mask_dir / f"cityA_{i:06d}_gtFine_labelIds.png")
    return str(root)


@pytest.fixture(scope="module")
def tusimple_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("tusimple")
    rng = np.random.default_rng(1)
    clips = root / "train_set" / "clips" / "0530" / "run1"
    seg = root / "train_set" / "seg_label" / "0530" / "run1"
    lst = root / "train_set" / "seg_label" / "list"
    for d in (clips, seg, lst):
        d.mkdir(parents=True)
    lines = []
    for i in range(5):
        img = rng.integers(0, 255, (90, 160, 3), dtype=np.uint8)
        mask = (rng.random((90, 160)) < 0.2).astype(np.uint8) * 3
        Image.fromarray(img).save(clips / f"{i}.jpg")
        Image.fromarray(mask).save(seg / f"{i}.png")
        lines.append(f"/clips/0530/run1/{i}.jpg /seg_label/0530/run1/{i}.png 1 1\n")
    (lst / "train_val_gt.txt").write_text("".join(lines))
    return str(root)


@pytest.fixture(scope="module")
def bdd_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("bdd100k")
    rng = np.random.default_rng(2)
    img_dir = root / "images" / "100k" / "train"
    lbl_dir = root / "drivable_maps" / "labels" / "train"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    for i in range(4):
        img = rng.integers(0, 255, (72, 128, 3), dtype=np.uint8)
        mask = rng.choice([0, 1, 2], size=(72, 128)).astype(np.uint8)
        Image.fromarray(img).save(img_dir / f"img{i:04d}.jpg")
        Image.fromarray(mask).save(lbl_dir / f"img{i:04d}_drivable_id.png")
    return str(root)


@pytest.fixture(scope="module")
def custom_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("custom")
    rng = np.random.default_rng(3)
    (root / "images").mkdir()
    (root / "masks").mkdir()
    for i in range(4):
        img = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
        mask = (rng.random((96, 128)) < 0.5).astype(np.uint8) * 255
        Image.fromarray(img).save(root / "images" / f"f{i}.jpg")
        Image.fromarray(mask).save(root / "masks" / f"f{i}.png")
    return str(root)


_REF_FILES = {
    "citys": ("cityscapes", "CitySegmentation"),
    "tusimple": ("tusimple", "TUSimpleSegmentation"),
    "bdd100k": ("bdd100k", "BDD100KSegmentation"),
    "custom": ("custom", "CustomDataset"),
}


def _ref_dataset(name, **kw):
    """Load a reference loader module by file path (the package __init__
    pulls in torchvision, which isn't installed; custom.py's torchvision
    use is only for ToTensor/Normalize, stubbed here)."""
    import importlib.util
    import types

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
    fname, cls = _REF_FILES[name]
    path = os.path.join(REFERENCE_ROOT, "data_loader", f"{fname}.py")
    spec = importlib.util.spec_from_file_location(f"ref_{fname}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return getattr(mod, cls)(**kw)


def test_cityscapes_basic(city_tree):
    ds = get_segmentation_dataset("citys", root=city_tree, split="train", base_size=64, crop_size=48)
    img, mask = ds[0]
    assert img.shape == (48, 48, 3) and img.dtype == np.uint8
    assert mask.shape == (48, 48) and mask.dtype == np.int32
    assert set(np.unique(mask)).issubset({-1, 0, 1, 13, 18})
    ds_val = get_segmentation_dataset("citys", root=city_tree, split="val", mode="testval")
    img, mask = ds_val[0]
    assert img.shape == (128, 256, 3)


@requires_reference
@requires_torch
@pytest.mark.parametrize("mode", ["train", "val", "testval"])
def test_cityscapes_parity(city_tree, mode):
    ds_ours = get_segmentation_dataset(
        "citys", root=city_tree, split="val", mode=mode, base_size=64, crop_size=48
    )
    ds_ref = _ref_dataset("citys", root=city_tree, split="val", mode=mode, base_size=64, crop_size=48)
    # We sort pairs deterministically; the reference inherits os.walk order —
    # match samples by path.
    for i in range(len(ds_ours)):
        j = ds_ref.images.index(ds_ours.images[i])
        random.seed(123 + i)
        img_o, mask_o = ds_ours[i]
        random.seed(123 + i)
        img_r, mask_r = ds_ref[j]
        np.testing.assert_array_equal(img_o, np.asarray(img_r))
        np.testing.assert_array_equal(mask_o, mask_r.numpy())


@requires_reference
@requires_torch
def test_tusimple_parity(tusimple_tree):
    ds_ours = get_segmentation_dataset(
        "tusimple", root=tusimple_tree, split="train", base_size=64, crop_size=48
    )
    ds_ref = _ref_dataset("tusimple", root=tusimple_tree, split="train", base_size=64, crop_size=48)
    assert len(ds_ours) == len(ds_ref)
    for i in range(len(ds_ours)):
        random.seed(7 + i)
        img_o, mask_o = ds_ours[i]
        random.seed(7 + i)
        img_r, mask_r = ds_ref[i]
        np.testing.assert_array_equal(img_o, np.asarray(img_r))
        np.testing.assert_array_equal(mask_o, mask_r.numpy())


@requires_reference
@requires_torch
@pytest.mark.parametrize("label_type", ["binary", "ternary"])
def test_bdd100k_parity(bdd_tree, label_type):
    kw = dict(root=bdd_tree, split="train", subset="100k", label_type=label_type,
              base_size=64, crop_size=48)
    ds_ours = get_segmentation_dataset("bdd100k", **kw)
    ds_ref = _ref_dataset("bdd100k", **kw)
    assert len(ds_ours) == len(ds_ref)
    assert ds_ours.num_class == ds_ref.num_class
    for i in range(len(ds_ours)):
        random.seed(99 + i)
        img_o, mask_o = ds_ours[i]
        random.seed(99 + i)
        img_r, mask_r = ds_ref[i]
        np.testing.assert_array_equal(img_o, np.asarray(img_r))
        np.testing.assert_array_equal(mask_o, mask_r.numpy())


@requires_reference
@requires_torch
@pytest.mark.parametrize("mode_kw", [{"keep_original_size": True}, {"multi_scale": True}])
def test_bdd100k_alternate_train_modes_parity(bdd_tree, mode_kw):
    """The keep-original-size and multi-scale-no-crop training transforms
    (reference:data_loader/bdd100k.py:242-278 / test_data_modes.py)."""
    kw = dict(root=bdd_tree, split="train", subset="100k", label_type="binary",
              base_size=64, crop_size=48, **mode_kw)
    ds_ours = get_segmentation_dataset("bdd100k", **kw)
    ds_ref = _ref_dataset("bdd100k", **kw)
    for i in range(len(ds_ours)):
        random.seed(31 + i)
        img_o, mask_o = ds_ours[i]
        random.seed(31 + i)
        img_r, mask_r = ds_ref[i]
        np.testing.assert_array_equal(img_o, np.asarray(img_r))
        np.testing.assert_array_equal(mask_o, mask_r.numpy())


def test_bdd100k_sampling(bdd_tree):
    ds = get_segmentation_dataset(
        "bdd100k", root=bdd_tree, split="train", subset="100k", max_samples=2
    )
    assert len(ds) == 2


def test_custom_split_and_masks(custom_tree):
    ds_train = get_segmentation_dataset(
        "custom", root=custom_tree, split="train", base_size=64, crop_size=48
    )
    ds_val = get_segmentation_dataset(
        "custom", root=custom_tree, split="val", base_size=64, crop_size=48
    )
    assert len(ds_train) + len(ds_val) == 4
    img, mask = ds_train[0]
    assert img.shape == (48, 48, 3)
    assert set(np.unique(mask)).issubset({0, 1})
    assert ds_train.normalization == "unit"


def test_custom_split_is_seeded_sklearn_split(custom_tree):
    """Our split = sklearn train_test_split(seed 42) over the *sorted* name
    list (the reference feeds os.listdir order, which is fs-dependent; we
    sort for cross-machine determinism — documented divergence)."""
    from sklearn.model_selection import train_test_split

    names = sorted(
        os.path.splitext(f)[0]
        for f in os.listdir(os.path.join(custom_tree, "images"))
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    expect_train, expect_val = train_test_split(names, train_size=0.9, random_state=42)
    ds_val = get_segmentation_dataset("custom", root=custom_tree, split="val")
    ds_train = get_segmentation_dataset("custom", root=custom_tree, split="train")
    assert ds_val.filenames == expect_val
    assert ds_train.filenames == expect_train


def test_dataloader_early_break_does_not_hang(city_tree):
    """Breaking out of iteration mid-epoch must not leave the producer
    blocked on a full queue."""
    import threading
    import time

    ds = get_segmentation_dataset("citys", root=city_tree, split="train", base_size=64, crop_size=48)
    loader = DataLoader(ds, batch_size=1, num_workers=2, prefetch=1)
    before = threading.active_count()
    for batch in loader:
        break  # early exit with batches still queued
    deadline = time.time() + 5
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before + 1  # producer wound down


def test_dataloader_batching(city_tree):
    ds = get_segmentation_dataset("citys", root=city_tree, split="train", base_size=64, crop_size=48)
    loader = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == len(ds) // 2
    images, targets = batches[0]
    assert images.shape == (2, 48, 48, 3) and images.dtype == np.uint8
    assert targets.shape == (2, 48, 48) and targets.dtype == np.int32
    # two epochs shuffle differently but cover the same data
    b2 = list(loader)
    assert len(b2) == len(batches)


def test_loader_propagates_dataset_errors():
    """A dataset exception must surface in the consumer, not hang the
    training loop forever on a queue whose producer died silently."""
    from fastscnn_tpu.data.loader import DataLoader

    class Bad:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            if i == 2:
                raise ValueError("corrupt sample")
            return np.zeros((8, 8, 3), np.uint8), np.zeros((8, 8), np.int32)

    loader = DataLoader(Bad(), batch_size=2, num_workers=2)
    with pytest.raises(ValueError, match="corrupt sample"):
        list(loader)


def test_loader_pads_mixed_resolutions():
    from fastscnn_tpu.data.loader import DataLoader

    class Mixed:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            s = 8 + 4 * i
            return np.full((s, s, 3), 7, np.uint8), np.ones((s, s), np.int32)

    images, targets = next(iter(DataLoader(Mixed(), batch_size=2)))
    assert images.shape == (2, 12, 12, 3) and targets.shape == (2, 12, 12)
    assert (targets[0, 8:, :] == -1).all()  # ignore-padded
    assert (images[0, 8:, :, :] == 0).all()  # zero-padded


def test_grain_loader_multiprocess_workers(custom_tree):
    """The grain source must pickle (multiprocess workers); a lock stored
    on the source or dataset breaks this."""
    pytest.importorskip("grain.python")
    from fastscnn_tpu.data import get_segmentation_dataset
    from fastscnn_tpu.data.grain_loader import GrainDataLoader

    ds = get_segmentation_dataset(
        "custom", root=custom_tree, split="train", base_size=64, crop_size=32
    )
    loader = GrainDataLoader(ds, batch_size=2, shuffle=True, seed=1, num_workers=2)
    batches = list(loader)
    assert len(batches) == len(ds) // 2

    # Regression (bench_input.py first execution): grain applies
    # operations inside each worker, so a per-worker Batch op dropped
    # every worker's partial tail — more workers than records/batch_size
    # yielded ZERO batches. The parent-side batcher must make the batch
    # count independent of worker_count.
    loader4 = GrainDataLoader(ds, batch_size=3, shuffle=True, seed=1, num_workers=4)
    batches4 = list(loader4)
    assert len(batches4) == len(ds) // 3, (
        f"{len(batches4)} batches with 4 workers vs {len(ds) // 3} expected"
    )
    assert all(b[0].shape[0] == 3 for b in batches4)


def test_grain_loader_epochs_vary_augmentation(custom_tree):
    """num_epochs > 1 must NOT apply byte-identical augmentations each
    epoch (per-epoch seed mixing)."""
    pytest.importorskip("grain.python")
    from fastscnn_tpu.data import get_segmentation_dataset
    from fastscnn_tpu.data.grain_loader import GrainDataLoader

    ds = get_segmentation_dataset(
        "custom", root=custom_tree, split="train", base_size=64, crop_size=32
    )
    loader = GrainDataLoader(ds, batch_size=2, shuffle=False, seed=5, num_epochs=2)
    batches = list(loader)
    half = len(batches) // 2
    epoch1 = np.concatenate([b[0].ravel() for b in batches[:half]])
    epoch2 = np.concatenate([b[0].ravel() for b in batches[half:]])
    assert not np.array_equal(epoch1, epoch2), "identical augs across epochs"


def test_decoded_cache_bit_identity_hits_and_staleness(city_tree, tmp_path):
    """data/decoded_cache.py — the implemented 'pre-decoded array records'
    fix from the input-pipeline study (docs/PERFORMANCE.md: decode is 54%
    of per-record cost). Gates: (1) cached reads are bit-identical to
    fresh decodes in both deterministic (testval) and seeded-aug (train)
    modes; (2) the second epoch is all cache hits; (3) rewriting a source
    file invalidates its entry (mtime/size keying)."""
    import random

    from fastscnn_tpu.data import decoded_cache

    kw = dict(root=city_tree, split="val", mode="testval",
              base_size=64, crop_size=48)
    ds = get_segmentation_dataset("citys", **kw)
    plain = [ds[i] for i in range(len(ds))]

    cache_dir = str(tmp_path / "decoded")
    decoded_cache.set_cache_dir(cache_dir)
    try:
        s0 = decoded_cache.stats()
        first = [ds[i] for i in range(len(ds))]
        s1 = decoded_cache.stats()
        assert s1["misses"] - s0["misses"] == 2 * len(ds)  # img + mask each
        second = [ds[i] for i in range(len(ds))]
        s2 = decoded_cache.stats()
        assert s2["hits"] - s1["hits"] == 2 * len(ds)
        assert s2["misses"] == s1["misses"]
        for (pi, pm), (ai, am), (bi, bm) in zip(plain, first, second):
            np.testing.assert_array_equal(pi, ai)
            np.testing.assert_array_equal(pm, am)
            np.testing.assert_array_equal(pi, bi)
            np.testing.assert_array_equal(pm, bm)

        # seeded-aug train mode: cache on/off must see identical streams
        ds_train = get_segmentation_dataset(
            "citys", root=city_tree, split="train", base_size=64, crop_size=48
        )
        random.seed(1234)
        with_cache = ds_train[0]
        decoded_cache.set_cache_dir(None)
        random.seed(1234)
        without_cache = ds_train[0]
        np.testing.assert_array_equal(with_cache[0], without_cache[0])
        np.testing.assert_array_equal(with_cache[1], without_cache[1])

        # staleness: rewrite one source image; entry must re-decode
        decoded_cache.set_cache_dir(cache_dir)
        img_path = ds.images[0]
        new = np.full((128, 256, 3), 42, dtype=np.uint8)
        Image.fromarray(new).save(img_path)
        os.utime(img_path, (time.time() + 2, time.time() + 2))
        refreshed = ds[0][0]
        assert (np.asarray(refreshed) == 42).all()
    finally:
        decoded_cache.set_cache_dir(None)
