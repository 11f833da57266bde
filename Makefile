# Developer entry points (reference: CompressAI/Makefile:49-60).

PYTHON ?= python

.PHONY: all native tests tests-fast bench static-analysis clean

all: native

native: lmic_tpu/csrc/liblmic_rans.so

lmic_tpu/csrc/liblmic_rans.so: lmic_tpu/csrc/lmic_rans.cc
	g++ -O3 -std=c++17 -shared -fPIC -o $@ $<

tests: native
	$(PYTHON) -m pytest tests/ -q

tests-fast: native
	$(PYTHON) -m pytest tests/ -q -m "not slow"

bench: native
	$(PYTHON) bench.py

static-analysis:
	$(PYTHON) -m compileall -q lmic_tpu tests bench.py __graft_entry__.py

clean:
	rm -f lmic_tpu/csrc/liblmic_rans.so
	find . -name __pycache__ -type d -exec rm -rf {} +
