# Build/test/bench entry points (the reference drives everything through
# make, reference Makefile:216-218; the TPU framework is Python + one
# native library).

.PHONY: build test bench clean debug

build:
	$(MAKE) -C cumf_als_tpu/native

# `make debug` in the reference enables per-phase timing printf; here
# the timing lines are on by default and tests run the debug surface.
debug: build test

test: build
	python -m pytest tests/ -q

bench: build
	python bench.py

clean:
	$(MAKE) -C cumf_als_tpu/native clean
	rm -rf .pytest_cache */__pycache__ */*/__pycache__
