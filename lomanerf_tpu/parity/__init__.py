"""Parity harness: the reference loma CPU implementation as a golden oracle."""

from lomanerf_tpu.parity import oracle  # noqa: F401
from lomanerf_tpu.parity.oracle import oracle_available  # noqa: F401
