# mimic3-tpu build/test/release helpers

PYTHON ?= python3

.PHONY: install test test-fast check native sample bench dist docker \
	ci clean

# Full CI gate: the one-command analog of the reference's Jenkinsfile
# pipeline (reference: Jenkinsfile:48-193 Clean/Dist/Docker stages +
# check.sh + Dockerfile:99-105 golden-sample gate). Chains static
# checks -> fast test suite -> deterministic golden sample -> wheel;
# the docker stage runs only when a docker daemon is present (this CI
# box has none). See also .github/workflows/ci.yml for the hosted form.
ci: check test-fast sample dist
	@command -v docker >/dev/null 2>&1 && docker info >/dev/null 2>&1 \
		&& $(MAKE) docker \
		|| echo "ci: docker unavailable, skipping image build"
	@echo "ci: all stages passed"

install:
	$(PYTHON) -m pip install -e . --no-build-isolation

test:
	$(PYTHON) -m pytest tests/ -q

test-fast:
	$(PYTHON) -m pytest tests/ -q -x \
		--ignore=tests/test_server.py \
		--ignore=tests/test_dataset_train_cli.py

check:
	JAX_PLATFORMS=cpu $(PYTHON) scripts/check.py

native:
	g++ -O3 -shared -fPIC -march=native \
		native/mimic3_native.cpp -o native/libmimic3_native.so

# deterministic golden sample: synthesize the regression sentence with a
# test voice and verify it is reproducible
sample:
	rm -rf /tmp/mimic3_tpu_sample && mkdir -p /tmp/mimic3_tpu_sample
	$(PYTHON) -m mimic3_tpu.runtime.testvoice \
		/tmp/mimic3_tpu_sample/voices/en_US/sample_low --tiny
	$(PYTHON) -m mimic3_tpu.cli --voice en_US/sample_low \
		--voices-dir /tmp/mimic3_tpu_sample/voices --no-download \
		--deterministic --stdout \
		"A rainbow is a meteorological phenomenon." \
		> /tmp/mimic3_tpu_sample/a.wav
	$(PYTHON) -m mimic3_tpu.cli --voice en_US/sample_low \
		--voices-dir /tmp/mimic3_tpu_sample/voices --no-download \
		--deterministic --stdout \
		"A rainbow is a meteorological phenomenon." \
		> /tmp/mimic3_tpu_sample/b.wav
	$(PYTHON) scripts/samples_match.py /tmp/mimic3_tpu_sample/a.wav \
		/tmp/mimic3_tpu_sample/b.wav --percent-threshold 0

bench:
	$(PYTHON) bench.py --single-stream

dist:
	$(PYTHON) -m pip wheel . --no-deps -w dist/

docker:
	docker build -t mimic3-tpu .

clean:
	rm -rf build dist *.egg-info native/libmimic3_native.so \
		.pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
