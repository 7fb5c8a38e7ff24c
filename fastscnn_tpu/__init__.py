"""fastscnn_tpu — a TPU-native (JAX / XLA / Pallas / pjit) semantic-segmentation
framework with the full capabilities of the Shinokawa/Fast-SCNN-pytorch stack.

Layout
------
- ``fastscnn_tpu.ops``       TPU-exact primitive ops (align-corners bilinear
  resize, PyTorch-bin adaptive average pooling, NHWC convolution helpers,
  BN folding, Pallas kernels for the hot paths).
- ``fastscnn_tpu.models``    the Fast-SCNN network as pure functional JAX
  (NHWC, bf16-friendly) plus the PyTorch ``.pth`` checkpoint importer.
- ``fastscnn_tpu.losses``    Dice / Focal-Dice / CE / on-device OHEM losses.
- ``fastscnn_tpu.utils``     LR schedules, streaming pixAcc/mIoU metrics
  (psum-able device histograms), palettes, training monitor, profiling.
- ``fastscnn_tpu.data``      Cityscapes / TuSimple / BDD100K / custom dataset
  loaders with reference-matching augmentation, plus a prefetching loader.
- ``fastscnn_tpu.parallel``  device-mesh construction and pjit/shard_map
  data-parallel (+ spatial-parallel) training steps.
- ``fastscnn_tpu.engine``    end-to-end jitted inference engines (preprocess
  folded into the graph), StableHLO export.
- ``fastscnn_tpu.perception``  bird's-eye-view transform + path planning.
- ``fastscnn_tpu.control``   visual lateral-error differential-drive control.
- ``fastscnn_tpu.serialbridge``  C++ serial/actuation bridge (UART framing,
  checksum, watchdog) with ctypes bindings.

Reference parity map: see SURVEY.md at the repo root; docstrings throughout
cite the reference implementation as ``reference:<file>:<lines>``.
"""

__version__ = "0.1.0"
