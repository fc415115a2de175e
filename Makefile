# radixhashjoin_tpu — convenience targets (reference parity: Makefile:1-14).
PY ?= python
SMALL ?= /root/reference/small

.PHONY: all native test test-all run bench clean

all: native

native:
	$(MAKE) -C radixhashjoin_tpu/runtime/native

# fast default suite (slow-marked end-to-end/SPMD tests deselected, pytest.ini)
test:
	$(PY) -m pytest tests/ -q

# the whole suite, including slow golden/SPMD tests (CI target)
test-all:
	$(PY) -m pytest tests/ -q -m ""

# the reference's golden benchmark contract: init+work on stdin, diff stdout
run: native
	cd $(dir $(SMALL)) && cat $(SMALL)/small.init $(SMALL)/small.work | \
	  time $(PY) -m radixhashjoin_tpu | diff - $(SMALL)/small.result && \
	  echo "exact match"

bench:
	$(PY) bench.py

clean:
	$(MAKE) -C radixhashjoin_tpu/runtime/native clean
