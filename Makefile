# Developer / CI entry points (SURVEY.md §5 sanitizers & CI plan).
#
# `make ci` is the gate a CI runner (or the round driver) executes:
#   1. fast numerics job: the pure-math/kernel-parity test subset under
#      JAX_DEBUG_NANS + jax_enable_checks (any NaN produced anywhere in the
#      forward/backward graph raises immediately instead of propagating);
#   2. the full suite on the virtual 8-device CPU mesh.
#
# The native BVH builder is rebuilt automatically by its ctypes loader;
# `make native` forces it.

PY ?= python

FAST_TESTS = tests/test_math.py tests/test_primitives.py \
             tests/test_rng_twins.py tests/test_accel_native.py \
             tests/test_film.py tests/test_kernels.py

.PHONY: ci test nan-check bench native clean

ci: nan-check test

nan-check:
	JAX_DEBUG_NANS=true JAX_ENABLE_CHECKS=true \
	$(PY) -m pytest $(FAST_TESTS) -q -x

test:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

native:
	$(MAKE) -C native

clean:
	rm -rf native/*.so /tmp/tracer-jax-cache
