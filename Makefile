# polar-tpu build/test driver (the reference's 28-line Makefile analog).
#
#   make native   - build the C construction/compiler extension in-place
#   make test     - run the test suite (CPU backend, 8 virtual devices)
#   make bench    - run the north-star benchmark on the default backend
#   make oracle   - build the reference-based golden-test oracle
#   make clean

PY ?= python

.PHONY: all native test bench oracle clean

all: native

native:
	$(PY) csrc/setup.py build_ext --inplace

test:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

oracle:
	$(PY) -c "import sys; sys.path.insert(0, 'tests'); import oracle; print(oracle.oracle_path())"

clean:
	rm -rf build tests/oracle/build _polar_native*.so
