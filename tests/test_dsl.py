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
