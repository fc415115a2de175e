# radixhashjoin_tpu — convenience targets (reference parity: Makefile:1-14).
PY ?= python
SMALL ?= /root/reference/small

.PHONY: all native test run bench clean

all: native

native:
	$(MAKE) -C radixhashjoin_tpu/runtime/native

test:
	$(PY) -m pytest tests/ -q

# the reference's golden benchmark contract: init+work on stdin, diff stdout
run: native
	cd $(dir $(SMALL)) && cat $(SMALL)/small.init $(SMALL)/small.work | \
	  time $(PY) -m radixhashjoin_tpu | diff - $(SMALL)/small.result && \
	  echo "exact match"

bench:
	$(PY) bench.py

clean:
	$(MAKE) -C radixhashjoin_tpu/runtime/native clean
