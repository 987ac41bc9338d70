# Developer entry points, mirroring the reference Makefile's targets
# (`Makefile:52-82`: all/test/bench/opt/genkeys) in this repo's terms.

PY ?= python
TESTENV = PALLAS_AXON_POOL_IPS=

.PHONY: all test bench bench-suite genkeys native clean help

all: native

# build the native host runtime (`radix_sorting_tpu/native/radix_rt.cpp`)
native:
	$(PY) -c "from radix_sorting_tpu.runtime import native; print('native:', native.available())"

# CPU test suite (8 virtual devices; `make test` analog, Makefile:54-55)
test:
	$(TESTENV) $(PY) -m pytest tests/ -x -q

# headline benchmark on the attached TPU (`make bench` analog, Makefile:57-58)
bench:
	$(PY) bench.py

# full size-sweep suite + dated report (bench.sh analog)
bench-suite:
	$(PY) bench_suite.py --out report

# create the 40M-key dataset (`make genkeys` analog, Makefile:79-82)
genkeys:
	$(PY) -c "from radix_sorting_tpu.utils import keyfile; keyfile.load_or_create(); print(keyfile.default_keyfile())"

clean:
	rm -rf radix_sorting_tpu/native/build .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true

help:
	@grep -E '^[a-z-]+:' Makefile | sed 's/:.*//'
