"""Decode-once image cache for the input pipeline.

The round-3 input-pipeline measurement (docs/PERFORMANCE.md "Input
pipeline") found PNG/JPEG decode is the single largest per-record cost:
76.5 ms of the 141 ms Cityscapes record total (54%). The standard
production fix is to store pre-decoded arrays; this module implements it
as a transparent cache in front of ``PIL.Image.open``:

* first open of a path decodes normally and writes the raw array (plus
  the post-``convert`` mode) as one ``.npy`` per source file under the
  cache directory, keyed by path digest + source mtime/size (stale
  entries re-decode automatically);
* subsequent opens memory-map the ``.npy`` and rebuild a PIL image with
  ``Image.fromarray`` — a memcpy instead of a full inflate/defilter pass.

Behavior is bit-identical to ``Image.open`` for the dataset use cases
(RGB images after ``.convert("RGB")``, uint8 L/P masks): the cached
array IS the decoded output. Disabled by default — enable per process
with :func:`set_cache_dir` or the ``FASTSCNN_DECODED_CACHE`` environment
variable (the ``--decoded-cache`` flag in train.py). The reference has no
analog (it re-decodes every epoch through torchvision's loader,
reference:train.py:137-147); this is the "pre-decoded array records" fix
named in the input-pipeline study.

Thread-safe: concurrent loader workers may race to create the same cache
entry; writes go to a unique temp file then ``os.replace`` (atomic), so
readers only ever see complete entries.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import threading

import numpy as np

__all__ = ["set_cache_dir", "get_cache_dir", "open_image", "open_rgb", "stats"]

_lock = threading.Lock()
_cache_dir: str | None = os.environ.get("FASTSCNN_DECODED_CACHE") or None
_hits = 0
_misses = 0


def set_cache_dir(path: str | None) -> None:
    """Enable (or disable with None) the decoded cache for this process."""
    global _cache_dir
    _cache_dir = path
    if path:
        os.makedirs(path, exist_ok=True)


def get_cache_dir() -> str | None:
    return _cache_dir


def stats() -> dict:
    return {"hits": _hits, "misses": _misses, "dir": _cache_dir}


def _entry_path(path: str, mode: str | None) -> str:
    st = os.stat(path)
    key = f"{os.path.abspath(path)}|{st.st_mtime_ns}|{st.st_size}|{mode}"
    digest = hashlib.sha1(key.encode()).hexdigest()[:20]
    base = os.path.splitext(os.path.basename(path))[0][:40]
    return os.path.join(_cache_dir, f"{base}.{digest}.npy")


# PIL modes representable as a bare numpy array round-trip. 'P' decodes to
# palette indices; we cache those as 'L' — identical pixel values, and the
# datasets only ever use mask pixel VALUES (labelIds / binarization), never
# the palette colors.
_ARRAY_MODES = {"L": "L", "P": "L", "I": "I", "RGB": "RGB", "RGBA": "RGBA"}


def open_image(path: str, convert: str | None = None):
    """``Image.open(path)`` (optionally ``.convert(convert)``) through the
    decoded cache. Falls back to plain PIL when the cache is disabled or
    the image mode isn't array-representable."""
    global _hits, _misses
    from PIL import Image

    if _cache_dir is None:
        img = Image.open(path)
        return img.convert(convert) if convert else img

    entry = _entry_path(path, convert)
    if os.path.exists(entry):
        with _lock:
            _hits += 1
        arr = np.load(entry, mmap_mode="r")
        # np.array copies out of the mmap: PIL must not hold a read-only
        # buffer, and the copy (a memcpy) is the entire point vs re-decode
        return Image.fromarray(np.array(arr))

    img = Image.open(path)
    if convert:
        img = img.convert(convert)
    if img.mode not in _ARRAY_MODES:
        return img  # exotic mode: serve undecoded, don't cache
    # ('P' caches as its palette INDICES — np.asarray yields exactly those,
    # and the datasets only ever use mask pixel values, never palette colors)
    arr = np.asarray(img)
    with _lock:
        _misses += 1
    fd, tmp = tempfile.mkstemp(dir=_cache_dir, suffix=".npy.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.save(f, arr)
        os.replace(tmp, entry)  # atomic vs racing workers
    except OSError:
        try:
            os.unlink(tmp)
        except OSError:
            pass
    return Image.fromarray(arr)


def open_rgb(path: str):
    """``Image.open(path).convert("RGB")`` through the cache — the image
    branch of every dataset loader."""
    return open_image(path, convert="RGB")
