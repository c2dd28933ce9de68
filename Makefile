# piper_tpu build/test entry points (counterpart of the reference's
# Makefile: make all = build + test).

.PHONY: all native test test-fast test-tpu test-ort bench clean

all: native test

native:
	$(MAKE) -C csrc

test:
	python -m pytest tests/ -x -q

test-fast:
	python -m pytest tests/ -x -q -k "not cli_end_to_end and not onnx"

# On a host with a real TPU attached (Pallas/Mosaic-compiled paths).
test-tpu:
	PIPER_TPU_RUN_TPU_TESTS=1 python -m pytest tests/ -x -q -m tpu

# Wherever the [ort] extra installs (pip install .[ort]): runs every
# exported voice under real onnxruntime vs the JAX graph.
test-ort:
	python -m pytest tests/ -x -q -m ort

bench:
	python bench.py

clean:
	$(MAKE) -C csrc clean
	rm -rf .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
