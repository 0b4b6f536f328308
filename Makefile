# Developer entry points. The package itself is pure Python + one C++
# shared library built on demand (zultra_tpu/native/build.py).

PY ?= python

.PHONY: all native test fuzz bench clean tsan

all: native

native:
	$(PY) zultra_tpu/native/build.py

tsan:
	$(PY) zultra_tpu/native/build.py --tsan

test: native
	$(PY) -m pytest tests/ -q

fuzz: native
	$(PY) tests/fuzz_parity.py 300 $$RANDOM

bench: native
	$(PY) bench.py

clean:
	rm -f zultra_tpu/native/libzultra_tpu.so
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null; true
