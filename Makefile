# Developer entry points. Tests force an 8-device virtual CPU mesh; the
# conftest re-execs pytest with scrubbed TPU-tunnel env vars, so plain
# `pytest tests/` also works.

PYTEST_ENV = env -u PALLAS_AXON_POOL_IPS _TUBEDETR_TEST_REEXEC=1 \
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8

.PHONY: test test-fast bench native dryrun

test:
	$(PYTEST_ENV) python -m pytest tests/ -x -q

test-fast:  # skips the heavy compile-bound model/mesh tests
	$(PYTEST_ENV) python -m pytest tests/ -x -q \
		--ignore tests/test_train_step.py \
		--ignore tests/test_e2e_synthetic.py \
		--ignore tests/test_model_shapes.py \
		--ignore tests/test_share_backbone.py

bench:
	python bench.py

native: tubedetr_tpu/native/build/libstaging.so
tubedetr_tpu/native/build/libstaging.so: tubedetr_tpu/native/staging.cc
	mkdir -p tubedetr_tpu/native/build
	g++ -O3 -shared -fPIC -std=c++17 -pthread $< -o $@

dryrun:
	$(PYTEST_ENV) python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
