# Convenience targets (see CLAUDE.md for environment details)
CPU_ENV := PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8

test:
	$(CPU_ENV) python -m pytest tests/ -x -q

test-fast:
	$(CPU_ENV) python -m pytest tests/ -x -q -m "not slow"

reference:
	./refbuild/prepare.sh

native:
	$(MAKE) -C native

bench:
	python bench.py

bench-2d:
	python bench.py --case 2d1024

baseline:
	python scripts/measure_reference.py

examples:
	bash scripts/run_examples.sh

.PHONY: test test-fast reference native bench bench-2d baseline examples
