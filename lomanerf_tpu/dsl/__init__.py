"""loma-compatible DSL front-end lowering to JAX (capability parity with
the reference's loma_public compiler, SURVEY.md §2.1)."""

from lomanerf_tpu.dsl import ir  # noqa: F401
from lomanerf_tpu.dsl.compiler import JaxLib, compile, make__dfloat  # noqa: F401
from lomanerf_tpu.dsl.parser import parse  # noqa: F401
from lomanerf_tpu.dsl.pretty_print import func_to_str  # noqa: F401
