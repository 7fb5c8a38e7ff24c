.PHONY: test bench bench-train syscheck lint

test:
	python -m pytest tests/ -q

bench:
	python bench.py

bench-train:
	python bench_train.py

syscheck:
	python -m fastscnn_tpu.tools.system_check

syscheck-quick:
	python -m fastscnn_tpu.tools.system_check --quick
