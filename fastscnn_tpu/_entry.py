"""Console-script shims for ``pyproject.toml [project.scripts]``.

The in-package ``main()``s deliberately return their primary artifact
(checkpoint path, metrics, pipeline object, ...) so in-process tests can
assert on it — but setuptools console scripts call ``sys.exit(fn())``,
which turns any truthy return into a nonzero exit code.  These wrappers
run the real entry point and exit 0 on success (matching the reference
CLIs, which are plain scripts: reference:demo.py, reference:train.py).
"""

from __future__ import annotations


def _wrap(import_path: str):
    def runner() -> int:
        module_name, fn_name = import_path.rsplit(":", 1)
        import importlib

        fn = getattr(importlib.import_module(module_name), fn_name)
        fn()
        return 0

    return runner


train = _wrap("fastscnn_tpu.train:main")
evaluate = _wrap("fastscnn_tpu.eval:main")
demo = _wrap("fastscnn_tpu.demo:demo")
export_model = _wrap("fastscnn_tpu.export_model:main")
pipeline = _wrap("fastscnn_tpu.pipeline:main")
dashboard = _wrap("fastscnn_tpu.control_dashboard:main")
