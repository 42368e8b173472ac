"""DSL front-end tests.

Mirrors the reference test tiers: compiler unit tests (loma_public/tests),
forward-mode (hw1), reverse-mode (hw2), control flow + parallel (hw3) —
all against the JAX lowering.  Final tests compile the REFERENCE'S OWN
unmodified DSL kernels and check numeric parity with our core pipelines.
"""

import numpy as np
import pytest

from lomanerf_tpu import dsl
from lomanerf_tpu.dsl import error as dsl_error


def test_basic_arithmetic():
    code = """
def f(x : In[float], y : In[float]) -> float:
    z : float = x * y + 2.0
    return z / (x - y)
"""
    _, lib = dsl.compile(code)
    got = lib.f(3.0, 2.0)
    assert np.isclose(got, (3.0 * 2.0 + 2.0) / (3.0 - 2.0))


def test_int_semantics_c_division():
    code = """
def f(x : In[int], y : In[int]) -> int:
    return x / y
"""
    _, lib = dsl.compile(code)
    assert lib.f(7, 2) == 3


def test_array_out_arg_and_mutation():
    code = """
def fill(out : Out[Array[float, 4]], scale : In[float]):
    i : int = 0
    while (i < 4, max_iter := 4):
        out[i] = int2float(i) * scale
        i = i + 1
"""
    _, lib = dsl.compile(code)
    buf = np.zeros(4, np.float32)
    lib.fill(buf, 2.0)
    np.testing.assert_allclose(buf, [0, 2, 4, 6])


def test_if_else_and_call():
    code = """
def relu(x : In[float]) -> float:
    y : float = 0
    if x > 0:
        y = x
    else:
        y = 0
    return y

def f(x : In[float]) -> float:
    return relu(x) + relu(0 - x)
"""
    _, lib = dsl.compile(code)
    assert np.isclose(lib.f(-3.0), 3.0)
    assert np.isclose(lib.f(2.5), 2.5)


def test_struct_support():
    code = """
class Point:
    x : float
    y : float

def norm2(p : In[Point]) -> float:
    return p.x * p.x + p.y * p.y
"""
    structs, lib = dsl.compile(code)
    assert "Point" in structs
    assert np.isclose(lib.norm2({"x": 3.0, "y": 4.0}), 25.0)


def test_forward_diff():
    code = """
def f(x : In[float]) -> float:
    return x * x * x + sin(x)

d_f = fwd_diff(f)
"""
    _, lib = dsl.compile(code)
    out = lib.d_f(dsl.make__dfloat(2.0, 1.0))
    assert np.isclose(out["val"], 8.0 + np.sin(2.0), rtol=1e-5)
    assert np.isclose(out["dval"], 12.0 + np.cos(2.0), rtol=1e-5)


def test_reverse_diff_scalar():
    code = """
def f(x : In[float], y : In[float]) -> float:
    return x / y

grad_f = rev_diff(f)
"""
    _, lib = dsl.compile(code)
    dx = np.zeros((), np.float32)
    dy = np.zeros((), np.float32)
    # interleaved (value, adjoint) convention + _dreturn (hw2 style)
    x, y, dout = 3.0, 5.0, 0.7
    adj = lib.grad_f(x, dx, y, dy, dout)
    assert np.isclose(float(adj["x"]), dout / y, rtol=1e-5)
    assert np.isclose(float(adj["y"]), -dout * x / (y * y), rtol=1e-5)


def test_reverse_diff_through_loop():
    """Bounded while: d/dx of x^5 computed by repeated multiplication
    (hw3 loop-reversal coverage)."""
    code = """
def f(x : In[float]) -> float:
    y : float = 1.0
    i : int = 0
    while (i < 5, max_iter := 10):
        y = y * x
        i = i + 1
    return y

grad_f = rev_diff(f)
"""
    _, lib = dsl.compile(code)
    dx = np.zeros((), np.float32)
    adj = lib.grad_f(2.0, dx, 1.0)
    assert np.isclose(float(adj["x"]), 5 * 2.0**4, rtol=1e-5)


def test_reverse_diff_array_adjoint_accumulates():
    code = """
def f(xs : In[Array[float, 3]]) -> float:
    return xs[0] * xs[1] + xs[2]

grad_f = rev_diff(f)
"""
    _, lib = dsl.compile(code)
    xs = np.array([2.0, 3.0, 4.0], np.float32)
    dxs = np.ones(3, np.float32)  # pre-existing adjoints: must accumulate
    lib.grad_f(xs, dxs, 1.0)
    np.testing.assert_allclose(dxs, [1 + 3, 1 + 2, 1 + 1])


def test_simd_parallel_add_and_atomic_reduce():
    """hw3's parallel_add / parallel_reduce capability."""
    code = """
@simd
def parallel_add(x : In[Array[float]], y : In[Array[float]],
                 z : Out[Array[float]]):
    i : int = thread_id()
    z[i] = x[i] + y[i]

@simd
def parallel_reduce(x : In[Array[float]], total : Out[Array[float, 1]]):
    i : int = thread_id()
    atomic_add(total[0], x[i])
"""
    _, lib = dsl.compile(code)
    n = 100
    rng = np.random.default_rng(0)
    x = rng.random(n).astype(np.float32)
    y = rng.random(n).astype(np.float32)
    z = np.zeros(n, np.float32)
    lib.parallel_add(x, y, z, n)  # trailing total_work like the reference
    np.testing.assert_allclose(z, x + y, rtol=1e-6)

    total = np.zeros(1, np.float32)
    lib.parallel_reduce(x, total, n)
    np.testing.assert_allclose(total[0], x.sum(), rtol=1e-5)


def test_simd_vmap_plan_classification():
    """The hw3-style kernels must take the PARALLEL (vmap) lowering — slots
    for thread-indexed buffers (incl. tid held in a local), accumulators
    for atomic_add targets — while order-dependent bodies fall back to the
    sequential scan (the reference's work-item contract, codegen_ispc.py:
    15-75: concurrent items, atomics as the only communication)."""
    from lomanerf_tpu.dsl import parser as dslparser
    from lomanerf_tpu.dsl.lower import Lowerer

    code = """
@simd
def parallel_add(x : In[Array[float]], y : In[Array[float]],
                 z : Out[Array[float]]):
    i : int = thread_id()
    z[i] = x[i] + y[i]

@simd
def parallel_reduce(x : In[Array[float]], total : Out[Array[float, 1]]):
    atomic_add(total[0], x[thread_id()])

@simd
def prefix_scan_ish(z : Out[Array[float]]):
    i : int = thread_id()
    z[i] = z[i - 1] + 1.0

@simd
def racy_write(z : Out[Array[float]]):
    z[0] = int2float(thread_id())
"""
    _, funcs = dslparser.parse(code)
    low = Lowerer({}, funcs)
    plan = low._simd_vmap_plan(funcs["parallel_add"], 1000)
    # x, y are READ-ONLY at [thread_id()]: they stay shared (plain vmap
    # gathers) instead of being slotted — slotting them would add an
    # O(total_work) identity scatter-back (ADVICE r4 #2)
    assert plan == (frozenset({"z"}), frozenset())
    plan = low._simd_vmap_plan(funcs["parallel_reduce"], 1000)
    assert plan == (frozenset(), frozenset({"total"}))
    # reads a neighbour's slot -> order-dependent -> scan
    assert low._simd_vmap_plan(funcs["prefix_scan_ish"], 1000) is None
    # non-thread-indexed write -> race -> scan
    assert low._simd_vmap_plan(funcs["racy_write"], 1000) is None


def test_rev_parallel_copy():
    """Port of hw3 test_parallel_copy (hw_tests/hw3/test.py:452-467): the
    adjoint of a broadcast-write is a FAN-IN sum over all threads — the
    role loma's atomic_add plays in the generated parallel adjoint
    (reverse_diff.py:144-155)."""
    code = """
@simd
def parallel_copy(x : In[float],
                  z : Out[Array[float]]):
    i : int = thread_id()
    z[i] = x

rev_parallel_copy = rev_diff(parallel_copy)
"""
    _, lib = dsl.compile(code)
    n = 10000
    x = 0.123
    dx = np.zeros((), np.float32)
    rng = np.random.default_rng(1234)
    z = np.zeros(n, np.float32)
    dz = (rng.random(n) / n).astype(np.float32)
    # interleaved (value, adjoint) pairs + trailing total_work
    lib.rev_parallel_copy(x, dx, z, dz, n)
    np.testing.assert_allclose(dx, dz.sum(), rtol=1e-4)


def test_rev_parallel_add():
    """Port of hw3 test_parallel_add (hw_tests/hw3/test.py:469-492):
    elementwise adjoints pass straight through per-thread."""
    code = """
@simd
def parallel_add(x : In[Array[float]],
                 y : In[Array[float]],
                 z : Out[Array[float]]):
    i : int = thread_id()
    z[i] = x[i] + y[i]

rev_parallel_add = rev_diff(parallel_add)
"""
    _, lib = dsl.compile(code)
    rng = np.random.default_rng(1234)
    n = 10000
    x = (rng.random(n) / n).astype(np.float32)
    y = (rng.random(n) / n).astype(np.float32)
    dx = np.zeros_like(x)
    dy = np.zeros_like(y)
    z = np.zeros_like(x)
    dz = (rng.random(n) / n).astype(np.float32)
    lib.rev_parallel_add(x, dx, y, dy, z, dz, n)
    np.testing.assert_allclose(dx, dz, atol=1e-6)
    np.testing.assert_allclose(dy, dz, atol=1e-6)


def test_rev_parallel_reduce():
    """Port of hw3 test_parallel_reduce (hw_tests/hw3/test.py:494-515):
    the adjoint of an atomic_add reduction broadcasts the scalar cotangent
    to every contributing element."""
    code = """
@simd
def parallel_reduce(x : In[Array[float]],
                    z : Out[float]):
    i : int = thread_id()
    atomic_add(z, x[i])

rev_parallel_reduce = rev_diff(parallel_reduce)
"""
    _, lib = dsl.compile(code)
    rng = np.random.default_rng(1234)
    n = 10000
    x = (rng.random(n) / n).astype(np.float32)
    dx = np.zeros_like(x)
    dz = 0.234
    lib.rev_parallel_reduce(x, dx, np.zeros((), np.float32),
                            np.asarray(dz, np.float32), n)
    np.testing.assert_allclose(dx, np.full(n, dz, np.float32), rtol=1e-5)


def test_fwd_parallel_simd():
    """fwd_diff of a @simd kernel: per-thread tangents flow into the Out
    buffer's dval (the ISPC-dual analog)."""
    code = """
@simd
def parallel_mul(x : In[Array[float]],
                 y : In[Array[float]],
                 z : Out[Array[float]]):
    i : int = thread_id()
    z[i] = x[i] * y[i]

d_parallel_mul = fwd_diff(parallel_mul)
"""
    _, lib = dsl.compile(code)
    rng = np.random.default_rng(7)
    n = 257
    x = rng.random(n).astype(np.float32)
    dx = rng.random(n).astype(np.float32)
    y = rng.random(n).astype(np.float32)
    dy = rng.random(n).astype(np.float32)
    zd = {"val": np.zeros(n, np.float32), "dval": np.zeros(n, np.float32)}
    lib.d_parallel_mul({"val": x, "dval": dx}, {"val": y, "dval": dy},
                       zd, n)
    np.testing.assert_allclose(zd["val"], x * y, rtol=1e-6)
    np.testing.assert_allclose(zd["dval"], dx * y + x * dy, rtol=1e-5)


def test_rev_through_call_mutating_out_arg():
    """rev_diff through a USER CALL that mutates an Out arg — the
    reference's _d_rev_ call machinery (reverse_diff.py:952-1016).  The
    call argument is itself a compound expression, covering the
    CallNormalizeMutator capability (reverse_diff.py:226-312)."""
    code = """
def square_into(x : In[float], y : Out[float]):
    y = x * x

def f(x : In[float]) -> float:
    t : float = 0.0
    square_into(x + 1.0, t)
    return 3.0 * t

grad_f = rev_diff(f)
"""
    _, lib = dsl.compile(code)
    x = 0.7
    dx = np.zeros((), np.float32)
    adj = lib.grad_f(x, dx, 1.0)
    # f = 3 (x+1)^2 -> df/dx = 6 (x+1)
    np.testing.assert_allclose(float(adj["x"]), 6.0 * (x + 1.0), rtol=1e-5)


def test_rev_through_nested_call_args():
    """rev_diff with a user call NESTED inside another call's argument
    list (reverse_diff.py:226-312's normalization capability) plus an Out
    mutation downstream of it."""
    code = """
def cube(x : In[float]) -> float:
    return x * x * x

def scale_into(x : In[float], s : In[float], y : Out[float]):
    y = x * s

def f(x : In[float]) -> float:
    t : float = 0.0
    scale_into(cube(x) + x, 2.0, t)
    return t + cube(t)

grad_f = rev_diff(f)
"""
    _, lib = dsl.compile(code)
    x = 0.6
    dx = np.zeros((), np.float32)
    adj = lib.grad_f(x, dx, 1.0)
    # t = 2 (x^3 + x); f = t + t^3
    t = 2.0 * (x**3 + x)
    dt_dx = 2.0 * (3.0 * x**2 + 1.0)
    want = (1.0 + 3.0 * t**2) * dt_dx
    np.testing.assert_allclose(float(adj["x"]), want, rtol=1e-5)


def test_error_undeclared_variable():
    code = """
def f(x : In[float]) -> float:
    return x + q
"""
    with pytest.raises(dsl_error.UndeclaredVariable):
        dsl.compile(code)


def test_error_duplicate_declare():
    code = """
def f(x : In[float]) -> float:
    y : float = 1.0
    y : float = 2.0
    return y
"""
    with pytest.raises(dsl_error.DuplicateVariable):
        dsl.compile(code)


def test_error_declare_not_outermost():
    code = """
def f(x : In[float]) -> float:
    i : int = 0
    while (i < 3, max_iter := 3):
        y : float = 1.0
        i = i + 1
    return x
"""
    with pytest.raises(dsl_error.DeclarationNotOutmostLevel):
        dsl.compile(code)


def test_error_out_call_not_stmt():
    code = """
def g(y : Out[float]):
    y = 1.0

def f(x : In[float]) -> float:
    z : float = 0
    return x + g(z)
"""
    with pytest.raises(
        (dsl_error.CallWithOutArgNotInCallStmt, dsl_error.UserError)
    ):
        dsl.compile(code)


# ---------------------------------------------------------------------------
# reverse-mode AD breadth (cf. hw_tests/hw2 + hw3/test.py:61-449): nested
# loops, branches with side effects, struct adjoints, taken-branch-only
# control-flow semantics
# ---------------------------------------------------------------------------


def test_rev_three_level_nested_loop():
    """3-level nested while reversal (hw3's loop stress shape): the adjoint
    must see every executed iteration of the data-dependent trip counts."""
    code = """
def f(x : In[float], n : In[int]) -> float:
    i : int = 0
    j : int = 0
    k : int = 0
    z : float = 0.0
    while (i < n, max_iter := 4):
        j = 0
        while (j < i + 1, max_iter := 4):
            k = 0
            while (k < j + 1, max_iter := 4):
                z = z + x * x
                k = k + 1
            j = j + 1
        i = i + 1
    return z

d_f = rev_diff(f)
"""
    _, lib = dsl.compile(code)
    # trip count: sum_{i<n} sum_{j<=i} (j+1) iterations; n=3 -> 1+ (1+2) + (1+2+3) = 10
    x = 1.7
    dx = np.zeros((), np.float32)
    lib.d_f(x, dx, 3, np.zeros((), np.int32), 1.0)
    np.testing.assert_allclose(dx, 10 * 2 * x, rtol=1e-5)


def test_rev_if_with_side_effects():
    """Branches that WRITE to an Out arg: adjoints flow through the taken
    branch only (reverse_diff.py:618-625)."""
    code = """
def f(x : In[float], y : Out[float]):
    if x > 1.0:
        y = x * x * x
    else:
        y = 5.0 * x

d_f = rev_diff(f)
"""
    _, lib = dsl.compile(code)
    for x, want in [(2.0, 3 * 4.0), (0.5, 5.0)]:
        dx = np.zeros((), np.float32)
        dy = np.asarray(0.3, np.float32)  # incoming cotangent for the Out arg
        lib.d_f(x, dx, np.zeros((), np.float32), dy)
        np.testing.assert_allclose(dx, 0.3 * want, rtol=1e-5)


def test_rev_struct_adjoints():
    """Struct-valued inputs accumulate per-field adjoints."""
    code = """
class Pt:
    x : float
    y : float

def f(p : In[Pt], q : In[float]) -> float:
    return p.x * p.y + sin(p.x) * q

d_f = rev_diff(f)
"""
    _, lib = dsl.compile(code)
    px, py, q = 0.8, -1.2, 2.0
    dp = {"x": np.zeros((), np.float32), "y": np.zeros((), np.float32)}
    dq = np.zeros((), np.float32)
    lib.d_f({"x": px, "y": py}, dp, q, dq, 1.0)
    np.testing.assert_allclose(dp["x"], py + np.cos(px) * q, rtol=1e-5)
    np.testing.assert_allclose(dp["y"], px, rtol=1e-5)
    np.testing.assert_allclose(dq, np.sin(px), rtol=1e-5)


def test_ifelse_untaken_branch_cannot_nan():
    """Taken-branch-only semantics (lax.cond lowering): an untaken branch
    whose derivative is undefined (sqrt at a negative input, 1/x at zero)
    must not poison the primal or the adjoint — exactly loma's behavior,
    where the untaken branch never executes."""
    code = """
def f(x : In[float]) -> float:
    y : float = 0.0
    if x > 0.0:
        y = sqrt(x)
    else:
        y = 1.0 / (x - 1.0) + 0.0 - x
    return y

d_f = rev_diff(f)
"""
    _, lib = dsl.compile(code)
    # x = -1: sqrt branch untaken (its adjoint at -1 would be NaN)
    dx = np.zeros((), np.float32)
    lib.d_f(-1.0, dx, 1.0)
    np.testing.assert_allclose(dx, -1.0 / 4.0 - 1.0, rtol=1e-5)
    assert np.isfinite(dx)
    # x = 1: the 1/(x-1) branch untaken (it would divide by zero)
    dx = np.zeros((), np.float32)
    lib.d_f(1.0, dx, 1.0)
    np.testing.assert_allclose(dx, 0.5, rtol=1e-5)
    assert np.isfinite(dx)


def test_while_skipped_iterations_cannot_nan():
    """Iterations beyond the dynamic trip count are skipped (lax.cond in the
    scan body), so an expression that would be singular at the stale loop
    state cannot contaminate gradients."""
    code = """
def f(x : In[float], n : In[int]) -> float:
    i : int = 0
    z : float = 1.0
    while (i < n, max_iter := 8):
        z = z * x / (2.0 - z)
        i = i + 1
    return z

d_f = rev_diff(f)
"""
    _, lib = dsl.compile(code)
    # n=1: z goes 1 -> x/(2-1) = x; further iterations (skipped) would hit
    # division by (2 - z) == 0 at x == 2
    dx = np.zeros((), np.float32)
    lib.d_f(2.0, dx, 1, np.zeros((), np.int32), 1.0)
    np.testing.assert_allclose(dx, 1.0, rtol=1e-5)
    assert np.isfinite(dx)


# ---------------------------------------------------------------------------
# static type inference (dsl/typecheck.py; cf. type_inference.py:34-348) —
# wrong-typed programs must fail at dsl.compile time with lineno-carrying
# TypeMismatch errors, never inside a jit trace
# ---------------------------------------------------------------------------


def test_error_binop_on_array():
    code = """
def f(x : In[Array[float]]) -> float:
    y : float = 0.0
    y = x + 1.0
    return y
"""
    with pytest.raises(dsl_error.BinaryOpTypeMismatch) as ei:
        dsl.compile(code)
    assert ei.value.lineno == 4


def test_error_subscript_non_array():
    code = """
def f(x : In[float]) -> float:
    return x[0]
"""
    with pytest.raises(dsl_error.ArrayAccessTypeMismatch):
        dsl.compile(code)


def test_error_member_access_non_struct():
    code = """
def f(x : In[float]) -> float:
    return x.val
"""
    with pytest.raises(dsl_error.StructAccessTypeMismatch):
        dsl.compile(code)


def test_error_struct_member_not_found():
    code = """
class Pt:
    x : float
    y : float

def f(p : In[Pt]) -> float:
    return p.z
"""
    with pytest.raises(dsl_error.StructMemberNotFound) as ei:
        dsl.compile(code)
    assert ei.value.member == "z"


def test_error_assign_struct_to_float():
    code = """
class Pt:
    x : float

def f(p : In[Pt]) -> float:
    y : float = 0.0
    y = p
    return y
"""
    with pytest.raises(dsl_error.AssignTypeMismatch) as ei:
        dsl.compile(code)
    assert ei.value.lineno == 7


def test_error_declare_array_from_float():
    code = """
def f(x : In[float]) -> float:
    a : Array[float, 3] = x
    return x
"""
    with pytest.raises(dsl_error.DeclareTypeMismatch):
        dsl.compile(code)


def test_error_return_type_mismatch():
    code = """
class Pt:
    x : float

def f(p : In[Pt]) -> float:
    return p
"""
    with pytest.raises(dsl_error.ReturnTypeMismatch):
        dsl.compile(code)


def test_error_call_arity():
    code = """
def g(a : In[float], b : In[float]) -> float:
    return a + b

def f(x : In[float]) -> float:
    return g(x)
"""
    with pytest.raises(dsl_error.CallTypeMismatch) as ei:
        dsl.compile(code)
    assert ei.value.lineno == 6


def test_error_intrinsic_arity():
    code = """
def f(x : In[float]) -> float:
    return pow(x)
"""
    with pytest.raises(dsl_error.CallTypeMismatch):
        dsl.compile(code)


def test_error_call_array_arg_mismatch():
    code = """
def g(a : In[Array[float]]) -> float:
    return a[0]

def f(x : In[float]) -> float:
    return g(x)
"""
    with pytest.raises(dsl_error.CallTypeMismatch):
        dsl.compile(code)


def test_error_ifelse_cond_struct():
    code = """
class Pt:
    x : float

def f(p : In[Pt]) -> float:
    y : float = 0.0
    if p:
        y = 1.0
    return y
"""
    with pytest.raises(dsl_error.IfElseCondTypeMismatch):
        dsl.compile(code)


def test_auto_casts_match_reference_semantics():
    """int<->float auto-conversion (type_inference.py:99-155, 218-245):
    int/int stays integer division (C truncation); mixing promotes to
    float; float initializer of an int declare truncates."""
    code = """
def f(n : In[int]) -> float:
    half : int = 2.9
    q : int = n / 2
    y : float = q
    z : float = n * 0.5
    return y + z + half
"""
    _, lib = dsl.compile(code)
    # n=7: q = 3 (trunc), y = 3.0, z = 3.5, half = 2 -> 8.5
    assert lib.f(7) == pytest.approx(8.5)


def test_auto_cast_call_args():
    code = """
def g(a : In[float]) -> float:
    return a * 2.0

def f(n : In[int]) -> float:
    return g(n) + sin(0) * pow(2, n)
"""
    _, lib = dsl.compile(code)
    assert lib.f(3) == pytest.approx(6.0)


def test_sized_array_passes_unbounded_arg():
    """A locally sized array must be accepted by an unbounded callee arg."""
    code = """
def total(a : In[Array[float]], n : In[int]) -> float:
    s : float = 0.0
    i : int = 0
    while (i < n, max_iter := 8):
        s = s + a[i]
        i = i + 1
    return s

def f(x : In[float]) -> float:
    buf : Array[float, 4]
    buf[0] = x
    buf[1] = 2.0
    return total(buf, 4)
"""
    _, lib = dsl.compile(code)
    assert lib.f(1.5) == pytest.approx(3.5)


# ---------------------------------------------------------------------------
# the reference's own unmodified kernels through our DSL
# ---------------------------------------------------------------------------

REFERENCE = "/root/reference"


def _reference_source(name):
    import os

    path = os.path.join(REFERENCE, "scripts", f"{name}.py")
    if not os.path.exists(path):
        pytest.skip("reference not available")
    with open(path) as f:
        return f.read()


def test_reference_mlp_fit_through_dsl(rng):
    """Compile /root/reference/scripts/mlp_fit.py UNMODIFIED and check the
    forward loss and reverse-mode weight gradients against our jnp core."""
    import jax
    import jax.numpy as jnp

    from lomanerf_tpu.core import image_fit_loss, params_from_numpy, \
        seeded_value_and_grad

    code = _reference_source("mlp_fit")
    _, lib = dsl.compile(code)

    n, in_ch = 16, 22
    sizes = [(22, 16), (16, 16), (16, 3)]
    ws = [rng.standard_normal(s).astype(np.float32) * 0.3 for s in sizes]
    bs = [rng.standard_normal(s[1]).astype(np.float32) * 0.1 for s in sizes]
    coords = rng.standard_normal((n, in_ch)).astype(np.float32)
    target = rng.random((n, 3)).astype(np.float32)

    # padded dense layout like the reference host code (fit_img.py:409-410)
    ws_p = np.zeros((3, 22, 16), np.float32)
    for i, w in enumerate(ws):
        ws_p[i, : w.shape[0], : w.shape[1]] = w
    bs_p = np.zeros((3, 16), np.float32)
    for i, b in enumerate(bs):
        bs_p[i, : b.shape[0]] = b
    ws_shape = np.array([w.shape for w in ws], np.int32)
    bs_shape = np.array([[len(b), 1] for b in bs], np.int32)
    inter_shapes = np.array([[n, s[1]] for s in sizes], np.int32)
    md = int(inter_shapes.max())
    inter = np.zeros((3, md, md), np.float32)
    layer_out = np.zeros((n, 3), np.float32)

    loss = lib.mlp_fit(
        coords, n, in_ch, layer_out, ws_p, bs_p, target, n, 3, 3,
        ws_shape, bs_shape, inter_shapes, inter,
    )
    params = params_from_numpy(ws, bs)
    want = float(image_fit_loss(params, jnp.asarray(coords),
                                jnp.asarray(target)))
    np.testing.assert_allclose(loss, want, rtol=1e-4)

    # reverse mode with the loss-valued seed quirk.  NOTE: unlike the
    # reference's deep-copying ctypes marshalling, our lib writes array
    # mutations back, so the forward call above filled `inter`/`layer_out`;
    # the kernel ACCUMULATES into them, so pass fresh zero buffers.
    inter = np.zeros_like(inter)
    layer_out = np.zeros_like(layer_out)
    seed = 0.43
    d = {k: np.zeros_like(v) for k, v in {
        "coords": coords, "layer_out": layer_out, "ws": ws_p, "bs": bs_p,
        "target": target, "inter": inter,
    }.items()}
    zi = lambda: np.zeros((), np.int32)
    adj = lib.grad_mlp_fit(
        coords, d["coords"], n, zi(), in_ch, zi(), layer_out,
        d["layer_out"], ws_p, d["ws"], bs_p, d["bs"], target, d["target"],
        n, zi(), 3, zi(), 3, zi(), ws_shape, np.zeros_like(ws_shape),
        bs_shape, np.zeros_like(bs_shape), inter_shapes,
        np.zeros_like(inter_shapes), inter, d["inter"], seed,
    )
    vag = seeded_value_and_grad(image_fit_loss)
    _, grads = vag(params, jnp.asarray(coords), jnp.asarray(target),
                   seed=seed)
    for i, g in enumerate(grads["w"]):
        np.testing.assert_allclose(
            d["ws"][i, : g.shape[0], : g.shape[1]], np.asarray(g),
            rtol=2e-4, atol=2e-5,
        )
    for i, g in enumerate(grads["b"]):
        np.testing.assert_allclose(
            d["bs"][i, : g.shape[0]], np.asarray(g), rtol=2e-4, atol=2e-5
        )


def test_reference_nerf_through_dsl(rng):
    """Compile /root/reference/scripts/nerf.py UNMODIFIED — the 305-line,
    21-arg full NeRF kernel (nested bounded loops, reshape-by-loop, the dead
    shifted-write, inclusive-cumprod compositing) — and check the loss and
    reverse-mode gradients (weights, biases, AND encoded-point inputs)
    against core.pipeline.nerf_loss on the parity MLP (33->30->30->4).

    loop_slack=1: the reference's feature loop runs 33 iterations under
    ``max_iter := 32`` (scripts/nerf.py:85; legal in loma, where max_iter
    only budgets the tape — see dsl.compile's docstring)."""
    import jax
    import jax.numpy as jnp

    from lomanerf_tpu.core import params_from_numpy
    from lomanerf_tpu.core.pipeline import nerf_loss

    code = _reference_source("nerf")
    _, lib = dsl.compile(code, loop_slack=1)

    n_rays, S, in_ch = 2, 4, 33
    sizes = [(33, 30), (30, 30), (30, 4)]
    ws = [rng.standard_normal(s).astype(np.float32) * 0.3 for s in sizes]
    bs = [rng.standard_normal(s[1]).astype(np.float32) * 0.1 for s in sizes]
    rows = n_rays * S
    enc = rng.standard_normal((rows, in_ch)).astype(np.float32)
    target = rng.random((n_rays, 3)).astype(np.float32)
    t = np.linspace(2.0, 6.0, S).astype(np.float32)
    dists = np.tile(np.concatenate([t[1:] - t[:-1], [1e8]]),
                    (n_rays, 1)).astype(np.float32)

    # padded dense layouts (the reference host's pad_array discipline,
    # mlp_utils.py:272-313)
    ws_p = np.zeros((3, 33, 30), np.float32)
    bs_p = np.zeros((3, 30), np.float32)
    for i, (w, b) in enumerate(zip(ws, bs)):
        ws_p[i, : w.shape[0], : w.shape[1]] = w
        bs_p[i, : b.shape[0]] = b
    ws_shape = np.array([w.shape for w in ws], np.int32)
    bs_shape = np.array([[len(b), 1] for b in bs], np.int32)
    inter_shapes = np.array([[rows, s[1]] for s in sizes], np.int32)
    inter = np.zeros((3, rows, 30), np.float32)
    rgba = np.zeros((n_rays, S, 4), np.float32)
    alpha = np.zeros((n_rays, S), np.float32)
    cumprod = np.zeros((n_rays, S), np.float32)
    wsamp = np.zeros((n_rays, S), np.float32)
    color = np.zeros((n_rays, 3), np.float32)

    def fwd_args():
        return (enc.copy(), rows, in_ch, ws_p.copy(), bs_p.copy(),
                target.copy(), n_rays, 3, 3, ws_shape.copy(),
                bs_shape.copy(), inter_shapes.copy(), np.zeros_like(inter),
                np.zeros_like(rgba), S, dists.copy(), np.zeros_like(alpha),
                np.zeros_like(cumprod), np.zeros_like(wsamp),
                np.zeros_like(color))

    loss = lib.nerf_evaluate_and_march(*fwd_args())

    params = params_from_numpy(ws, bs)
    enc3 = jnp.asarray(enc.reshape(n_rays, S, in_ch))
    want_loss, vjp = jax.vjp(
        lambda p, e: nerf_loss(p, e, jnp.asarray(dists), jnp.asarray(target),
                               mode="loma"),
        params, enc3,
    )
    np.testing.assert_allclose(loss, float(want_loss), rtol=1e-4)

    # reverse mode: interleaved (value, adjoint) convention + seeded _dreturn
    seed = 0.37
    vals = fwd_args()
    adjs = []
    for v in vals:
        if isinstance(v, np.ndarray):
            adjs.append(np.zeros_like(v))
        else:
            adjs.append(np.zeros((), np.int32))
    inter_args = [x for pair in zip(vals, adjs) for x in pair]
    lib.grad_nerf_evaluate_and_march(*inter_args, seed)

    gp, ge = vjp(jnp.asarray(seed, jnp.float32))
    d_enc, d_ws, d_bs = adjs[0], adjs[3], adjs[4]
    for i, g in enumerate(gp["w"]):
        np.testing.assert_allclose(
            d_ws[i, : g.shape[0], : g.shape[1]], np.asarray(g),
            rtol=3e-4, atol=3e-5,
        )
    for i, g in enumerate(gp["b"]):
        np.testing.assert_allclose(d_bs[i, : g.shape[0]], np.asarray(g),
                                   rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(
        d_enc, np.asarray(ge).reshape(rows, in_ch), rtol=3e-4, atol=3e-5
    )

    # DEFAULT-ARGS compile (no loop_slack): the call-time trip analysis
    # (dsl/loopcheck.py) must see layer_input_w=33 > max_iter 32 on the
    # feature loop, auto-extend the scan, warn — and match the oracle loss
    # (VERDICT r4 missing: "silently computes wrong values unless the user
    # knows to pass loop_slack")
    from lomanerf_tpu.dsl.error import LoopBoundWarning

    _, lib_default = dsl.compile(code)
    with pytest.warns(LoopBoundWarning):
        loss_default = lib_default.nerf_evaluate_and_march(*fwd_args())
    np.testing.assert_allclose(loss_default, float(want_loss), rtol=1e-4)


def test_const_bound_loop_auto_extends():
    """A literal loop bound exceeding max_iter is detected statically
    (dsl/loopcheck.py) and the scan auto-extends with a warning instead of
    silently truncating (VERDICT r4 weak #2)."""
    from lomanerf_tpu.dsl.error import LoopBoundWarning

    code = """
def f(x : In[float]) -> float:
    i : int = 0
    acc : float = 0.0
    while (i < 10, max_iter := 5):
        acc = acc + x
        i = i + 1
    return acc
"""
    _, lib = dsl.compile(code)
    with pytest.warns(LoopBoundWarning):
        got = lib.f(2.0)
    assert got == 20.0  # all 10 iterations ran


def test_arg_bound_loop_auto_extends_at_call():
    """An In[int] loop bound is resolved from the CONCRETE argument at call
    time: within-budget calls run silently, overruns re-lower with the
    needed slack (and rev_diff gradients cover the full trip count)."""
    from lomanerf_tpu.dsl.error import LoopBoundWarning

    code = """
def f(n : In[int], x : In[float]) -> float:
    i : int = 0
    acc : float = 0.0
    while (i < n, max_iter := 4):
        acc = acc + x
        i = i + 1
    return acc

grad_f = rev_diff(f)
"""
    import warnings

    _, lib = dsl.compile(code)
    with warnings.catch_warnings():
        warnings.simplefilter("error", LoopBoundWarning)
        assert lib.f(3, 1.5) == 4.5  # within budget: silent
    with pytest.warns(LoopBoundWarning):
        assert lib.f(7, 1.0) == 7.0  # auto-extended
    with pytest.warns(LoopBoundWarning):
        adj = lib.grad_f(7, np.zeros((), np.int32), 1.0,
                         np.zeros((), np.float32), 1.0)
    assert float(np.asarray(adj["x"])) == 7.0  # d acc/dx = n, full trips


def test_unanalyzable_overrun_fires_truncation_guard():
    """A bound the static analysis can't see (array element) that overruns
    max_iter fires the runtime truncation guard (lower.py): the result is
    truncated — as loma's tape discipline allows — but LOUDLY."""
    import jax

    from lomanerf_tpu.dsl import lower

    code = """
def f(bounds : In[Array[int, 2]], x : In[float]) -> float:
    i : int = 0
    acc : float = 0.0
    while (i < bounds[0], max_iter := 4):
        acc = acc + x
        i = i + 1
    return acc
"""
    _, lib = dsl.compile(code)
    lower.TRUNCATION_EVENTS.clear()
    got = lib.f(np.array([7, 0], np.int32), 1.0)
    jax.effects_barrier()  # flush debug callbacks
    assert got == 4.0  # scan budget reached
    assert lower.TRUNCATION_EVENTS, "truncation guard did not fire"
    # within budget: no event
    lower.TRUNCATION_EVENTS.clear()
    assert lib.f(np.array([3, 0], np.int32), 1.0) == 3.0
    jax.effects_barrier()
    assert not lower.TRUNCATION_EVENTS
    # explicit loop_slack covers the overrun: full result, no event
    _, lib2 = dsl.compile(code, loop_slack=3)
    lower.TRUNCATION_EVENTS.clear()
    assert lib2.f(np.array([7, 0], np.int32), 1.0) == 7.0
    jax.effects_barrier()
    assert not lower.TRUNCATION_EVENTS


def _reference_example_source(name):
    import os

    path = os.path.join(REFERENCE, "loma_public", "examples", "loma_code",
                        f"{name}.py")
    if not os.path.exists(path):
        pytest.skip("reference not available")
    with open(path) as f:
        return f.read()


def test_reference_sum_array_through_dsl(rng):
    """Compile the reference's sum_array demo unmodified (bounded loop +
    ReLU tail, examples/loma_code/sum_array.py)."""
    _, lib = dsl.compile(_reference_example_source("sum_array"))
    arr = rng.standard_normal(37).astype(np.float32)
    got = lib.sum_array(arr, 37)
    np.testing.assert_allclose(got, max(arr.sum(), 0.0), rtol=1e-5)


def test_reference_pendulum_through_dsl():
    """Compile the reference's pendulum demo unmodified: Diff[Struct]
    locals (struct-of-duals) and a DSL-level call to a fwd_diff function
    (examples/loma_code/pendulum_fwd.py) — Hamiltonian partials must match
    the analytic derivatives."""
    _, lib = dsl.compile(_reference_example_source("pendulum_fwd"))
    q, p = 0.6, 0.3
    m, r, g = 1.0, 20.0, 9.8
    c = {"mass": m, "radius": r, "g": g}
    # H = p^2/(m r^2) + m g (-r cos q)
    np.testing.assert_allclose(lib.dHdq(q, p, c), m * g * r * np.sin(q),
                               rtol=1e-5)
    np.testing.assert_allclose(lib.dHdp(q, p, c), 2 * p / (m * r * r),
                               rtol=1e-5)


def test_reference_mult_a_b_through_dsl(rng):
    code = _reference_source("mlp_fit")
    _, lib = dsl.compile(code)
    a = np.array([[1, 2], [3, 4], [5, 6]], np.float32)
    b = np.array([[100], [200]], np.float32)
    c = np.zeros((3, 1), np.float32)
    lib.mult_a_b(a, 3, 2, b, 2, 1, c)
    np.testing.assert_allclose(c, [[500], [1100], [1700]])


def test_hessian_rev_over_fwd():
    """Second derivative via rev_diff(fwd_diff(f)) — the reference's
    Newton-method Hessian pattern (examples/loma_code/third_order_poly_hess)."""
    code = """
def f(x : In[float]) -> float:
    return x * x * x - 2.0 * x

d_f = fwd_diff(f)
h_f = rev_diff(d_f)
"""
    _, lib = dsl.compile(code)
    x = 1.7
    # seed the DUAL return: dval cotangent 1 extracts d/dx of f'(x)
    dx = {"val": np.zeros((), np.float32), "dval": np.zeros((), np.float32)}
    adj = lib.h_f(
        dsl.make__dfloat(x, 1.0), dx, {"val": 0.0, "dval": 1.0}
    )
    d2 = float(np.asarray(adj["x"]["val"]))
    assert np.isclose(d2, 6 * x, rtol=1e-4)  # f'' = 6x


def test_simd_vmap_fallback_correctness():
    """Bodies the vmap planner must REJECT still run correctly through the
    sequential-scan fallback: a tid alias that is reassigned (no longer
    provably thread_id()) and an accumulator that is also read (order-
    dependent).  Results must match the sequential semantics."""
    from lomanerf_tpu.dsl import parser as dslparser
    from lomanerf_tpu.dsl.lower import Lowerer

    code = """
@simd
def shifted_write(x : In[Array[float]], z : Out[Array[float]]):
    i : int = thread_id()
    i = i + 1
    z[i - 1] = x[i - 1] * 2.0

@simd
def running_read(total : Out[Array[float, 1]]):
    atomic_add(total[0], total[0] + 1.0)
"""
    _, funcs = dslparser.parse(code)
    low = Lowerer({}, funcs)
    # both must fall back (plan None)
    assert low._simd_vmap_plan(funcs["shifted_write"], 16) is None
    assert low._simd_vmap_plan(funcs["running_read"], 5) is None

    _, lib = dsl.compile(code)
    n = 16
    x = np.arange(n, dtype=np.float32)
    z = np.zeros(n, np.float32)
    lib.shifted_write(x, z, n)
    np.testing.assert_allclose(z, 2.0 * x, rtol=1e-6)
    # sequential semantics: t_k = 2*t_{k-1} + 1 -> 2^k - 1
    total = np.zeros(1, np.float32)
    lib.running_read(total, 5)
    np.testing.assert_allclose(total[0], 2.0**5 - 1)


def test_simd_vmap_struct_slots():
    """Struct-of-arrays slots take the vmap path: each thread writes its
    own struct element through thread_id()."""
    from lomanerf_tpu.dsl import parser as dslparser
    from lomanerf_tpu.dsl.lower import Lowerer

    code = """
class Pair:
    a : float
    b : float

@simd
def make_pairs(x : In[Array[float]], out : Out[Array[Pair]]):
    i : int = thread_id()
    out[i].a = x[i] + 1.0
    out[i].b = x[i] * 3.0
"""
    structs, funcs = dslparser.parse(code)
    low = Lowerer(structs, funcs)
    plan = low._simd_vmap_plan(funcs["make_pairs"], 8)
    assert plan is not None and "out" in plan[0]

    _, lib = dsl.compile(code)
    n = 8
    x = np.arange(n, dtype=np.float32)
    out_a = np.zeros(n, np.float32)
    out_b = np.zeros(n, np.float32)
    lib.make_pairs(x, {"a": out_a, "b": out_b}, n)
    np.testing.assert_allclose(out_a, x + 1.0, rtol=1e-6)
    np.testing.assert_allclose(out_b, x * 3.0, rtol=1e-6)


def test_simd_unsized_accumulator_runs():
    """An @simd reduction into an UNSIZED Out[Array[float]] accumulator
    must dispatch (the vmap memory guard sizes from runtime values, not
    the static type, which has no size here)."""
    code = """
@simd
def reduce_unsized(x : In[Array[float]], total : Out[Array[float]]):
    atomic_add(total[0], x[thread_id()])
"""
    _, lib = dsl.compile(code)
    n = 1000
    x = np.arange(n, dtype=np.float32) / n
    total = np.zeros(1, np.float32)
    lib.reduce_unsized(x, total, n)
    np.testing.assert_allclose(total[0], x.sum(), rtol=1e-5)


def test_simd_vmap_callee_name_collision():
    """A user callee whose parameter shares a SLOTTED buffer's name must
    index its own (by-value) arrays normally — the slotted-name
    interception is scoped to the @simd body frame."""
    code = """
def fill(out : Out[Array[float, 2]]):
    out[0] = 7.0
    out[1] = 9.0

@simd
def k(x : In[Array[float]], out : Out[Array[float]]):
    tmp : Array[float, 2]
    fill(tmp)
    out[thread_id()] = tmp[0] + tmp[1] + x[thread_id()]
"""
    from lomanerf_tpu.dsl import parser as dslparser
    from lomanerf_tpu.dsl.lower import Lowerer

    _, funcs = dslparser.parse(code)
    low = Lowerer({}, funcs)
    plan = low._simd_vmap_plan(funcs["k"], 4)
    assert plan is not None and "out" in plan[0]  # vmap path taken

    _, lib = dsl.compile(code)
    n = 4
    x = np.arange(n, dtype=np.float32)
    out = np.zeros(n, np.float32)
    lib.k(x, out, n)
    np.testing.assert_allclose(out, 16.0 + x, rtol=1e-6)
