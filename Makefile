# piper_tpu build/test entry points (counterpart of the reference's
# Makefile: make all = build + test).

.PHONY: all native test test-fast bench clean

all: native test

native:
	$(MAKE) -C csrc

test:
	python -m pytest tests/ -x -q

test-fast:
	python -m pytest tests/ -x -q -k "not cli_end_to_end and not onnx"

bench:
	python bench.py

clean:
	$(MAKE) -C csrc clean
	rm -rf .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
