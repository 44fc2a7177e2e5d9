"""Pallas TPU kernels: fused, VMEM-resident recasts of the tracer's
non-differentiable hot loops (see kernels/common.py for the RNG twin and
layout conventions). Each kernel has a jnp reference implementation in the
integrator; parity is pinned by tests/test_kernels.py."""

from tracer.kernels import common  # noqa: F401
