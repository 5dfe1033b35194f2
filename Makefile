# Convenience targets. The framework itself builds nothing at install time;
# the native IO library compiles on demand (data/native.py) — `make native`
# just forces it ahead of time.

PY ?= python

.PHONY: test test-all native bench dryrun clean

# Fast default suite. Measured 2026-08-17: ~9 min serial on THIS box
# (nproc=1, throttled; JAX CPU compiles dominate) — a normal multi-core
# dev box runs it in 2-3 min. The multi-minute end-to-end runs are
# marked `slow` and run via `make test-all`.
test:
	$(PY) -m pytest tests/ -q -m "not slow"

test-all:
	$(PY) -m pytest tests/ -q

native:
	$(PY) -c "from vqa_transfer_externaldata_tpu.data import native; \
	          assert native.available(), 'native build failed'; \
	          print('native IO library ready; jpeg:', \
	                native.jpeg_available())"

bench:
	$(PY) bench.py

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
	$(PY) -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

clean:
	rm -rf vqa_transfer_externaldata_tpu/native/_build .pytest_jax_cache \
	       .pytest_cache $(shell find . -name __pycache__ -type d)
