# radixhashjoin_tpu — convenience targets (reference parity: Makefile:1-14).
PY ?= python
SMALL ?= /root/reference/small

.PHONY: all native test test-all test-slow run bench clean

all: native

native:
	$(MAKE) -C radixhashjoin_tpu/runtime/native

# fast default suite (slow-marked end-to-end/SPMD tests deselected, pytest.ini)
test:
	$(PY) -m pytest tests/ -q

# the whole suite, including slow golden/SPMD tests (CI target).
# Budget: ~9 min with a warm .jax_cache (fast ~3 min + slow ~6 min,
# measured r3); the persistent XLA compilation cache keeps repeat runs
# compile-free — wipe .jax_cache to measure a cold CI worker.
test-all:
	$(PY) -m pytest tests/ -q -m ""

# just the slow tier (golden end-to-end + SPMD mesh tests)
test-slow:
	$(PY) -m pytest tests/ -q -m slow

# the reference's golden benchmark contract: init+work on stdin, diff stdout
run: native
	cd $(dir $(SMALL)) && cat $(SMALL)/small.init $(SMALL)/small.work | \
	  time $(PY) -m radixhashjoin_tpu | diff - $(SMALL)/small.result && \
	  echo "exact match"

bench:
	$(PY) bench.py

clean:
	$(MAKE) -C radixhashjoin_tpu/runtime/native clean
