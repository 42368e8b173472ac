"""Utilities: profiling/observability hooks, misc helpers."""

from lomanerf_tpu.utils.profiling import (  # noqa: F401
    cost_analysis,
    device_memory_stats,
    dump_hlo,
    print_lowered,
    trace,
)
