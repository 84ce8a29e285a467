# polar-tpu build/test driver (the reference's 28-line Makefile analog).
#
#   make native    - build the C construction/compiler extension in-place
#   make test      - run the test suite (CPU backend, 8 virtual devices)
#   make bench     - run the north-star benchmark on the default backend
#   make waterfall - run the default BER campaign (the reference's `make test`)
#   make fuzz      - randomized parity fuzz vs the reference oracle
#   make oracle    - build the reference-based golden-test oracle
#   make clean

PY ?= python

.PHONY: all native test bench waterfall fuzz oracle clean

all: native

native:
	$(PY) csrc/setup.py build_ext --inplace

test:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

waterfall:
	$(PY) scripts/waterfall.py --m 14 --rate 0.5 --no-throughput

fuzz:
	$(PY) scripts/fuzz_parity.py --iters 200

oracle:
	$(PY) -c "import sys; sys.path.insert(0, 'tests'); import oracle; print(oracle.oracle_path())"

clean:
	rm -rf build tests/oracle/build _polar_native*.so
