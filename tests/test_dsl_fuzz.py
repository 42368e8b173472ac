"""Differential fuzzing of the DSL core.

Random small loma programs — scalar arithmetic, bounded while loops,
if/else, intrinsic calls — are compiled through the full pipeline
(parse -> checks -> typecheck -> lower-to-JAX -> jit) and compared against
an INDEPENDENT reference: direct evaluation of the generated Python-source
semantics with plain Python floats (loma is a Python subset, so the source
itself runs under exec with small shims).  rev_diff gradients are checked
against central finite differences.

This broadens the reference's hand-written hw-test style (hw1-hw3) with
generative coverage of the same constructs.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pytest

from lomanerf_tpu import dsl


def _gen_expr(rng, vars_, depth=0):
    """A float-typed expression over ``vars_`` (safe: no div-by-unknown)."""
    if depth > 2 or rng.random() < 0.3:
        if vars_ and rng.random() < 0.7:
            return rng.choice(vars_)
        return f"{rng.uniform(0.3, 2.5):.4f}"
    a = _gen_expr(rng, vars_, depth + 1)
    b = _gen_expr(rng, vars_, depth + 1)
    op = rng.choice(["+", "-", "*"])
    if rng.random() < 0.25:
        fn = rng.choice(["sin", "cos", "exp"])
        if fn == "exp":  # keep magnitudes tame
            return f"{fn}(0.25 * ({a}))"
        return f"{fn}({a})"
    return f"({a} {op} {b})"


def _gen_program(seed):
    """Random single-function program: returns (source, n_args)."""
    rng = random.Random(seed)
    n_args = rng.randint(1, 3)
    args = [f"x{i}" for i in range(n_args)]
    lines = [
        "def f(" + ", ".join(f"{a} : In[float]" for a in args)
        + ") -> float:"
    ]
    vars_ = list(args)
    # a couple of local declarations
    for i in range(rng.randint(1, 2)):
        v = f"t{i}"
        lines.append(f"    {v} : float = {_gen_expr(rng, vars_)}")
        vars_.append(v)
    acc = "acc"
    lines.append(f"    {acc} : float = 0.0")
    body_kind = rng.choice(["loop", "if", "both"])
    if body_kind in ("loop", "both"):
        trips = rng.randint(1, 6)
        max_iter = rng.choice([trips, trips + 2, 8])
        lines.append("    i : int = 0")
        lines.append(f"    while (i < {trips}, max_iter := {max_iter}):")
        lines.append(f"        {acc} = {acc} + {_gen_expr(rng, vars_)}")
        lines.append("        i = i + 1")
    if body_kind in ("if", "both"):
        cond_var = rng.choice(args)
        thresh = f"{rng.uniform(-0.5, 0.5):.4f}"
        lines.append(f"    if {cond_var} > {thresh}:")
        lines.append(f"        {acc} = {acc} + {_gen_expr(rng, vars_)}")
        lines.append("    else:")
        lines.append(f"        {acc} = {acc} - {_gen_expr(rng, vars_)}")
    lines.append(f"    return {acc} + {_gen_expr(rng, vars_)}")
    return "\n".join(lines) + "\n", n_args


def _python_reference(source, arg_values):
    """Evaluate the loma source as PLAIN PYTHON (loma is a Python subset):
    strip annotations/max_iter, provide the intrinsics, run with floats —
    an implementation-independent oracle."""
    import re

    src = source
    # while (cond, max_iter := N):  ->  while cond:
    src = re.sub(r"while \((.*), max_iter := \d+\):", r"while \1:", src)
    # strip parameter annotations
    src = re.sub(r" : In\[float\]", "", src)
    # local declarations "v : float = e" -> "v = e"; "i : int = 0" -> ...
    src = re.sub(r" : (float|int) = ", " = ", src)
    env = {"sin": math.sin, "cos": math.cos, "exp": math.exp,
           "sqrt": math.sqrt, "log": math.log}
    exec(src, env)
    return env["f"](*[float(v) for v in arg_values])


@pytest.mark.parametrize("seed", range(24))
def test_fuzz_forward_matches_python(seed):
    source, n_args = _gen_program(seed)
    rng = np.random.default_rng(seed)
    _, lib = dsl.compile(source)
    for trial in range(3):
        xs = [float(v) for v in rng.uniform(-1.2, 1.2, size=n_args)]
        got = lib.f(*xs)
        want = _python_reference(source, xs)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6,
                                   err_msg=f"seed {seed}\n{source}")


@pytest.mark.parametrize("seed", range(0, 24, 3))
def test_fuzz_rev_grad_matches_finite_differences(seed):
    source, n_args = _gen_program(seed)
    rng = np.random.default_rng(1000 + seed)
    _, lib = dsl.compile(source + "\ngrad_f = rev_diff(f)\n")
    xs = [float(v) for v in rng.uniform(-1.0, 1.0, size=n_args)]
    # keep clear of the if-branch threshold (kink) for finite differences
    interleaved = []
    for x in xs:
        interleaved += [x, np.zeros((), np.float32)]
    adj = lib.grad_f(*interleaved, 1.0)
    eps = 1e-3
    for i in range(n_args):
        hi = list(xs)
        lo = list(xs)
        hi[i] += eps
        lo[i] -= eps
        fd = (_python_reference(source, hi)
              - _python_reference(source, lo)) / (2 * eps)
        got = float(np.asarray(adj[f"x{i}"]))
        # central differences on a float32 pipeline: loose-ish tolerance;
        # skip comparisons right at an if-branch kink
        if abs(fd) < 50.0:
            np.testing.assert_allclose(
                got, fd, rtol=5e-3, atol=5e-3,
                err_msg=f"seed {seed} dx{i}\n{source}")


def _gen_simd_program(seed):
    """Random @simd kernel over shared arrays: thread-indexed slot writes,
    atomic_add reductions, and read-only inputs — the planner's domain."""
    rng = random.Random(10_000 + seed)
    lines = [
        "@simd",
        "def k(a : In[Array[float]], b : In[Array[float]], "
        "out : Out[Array[float]], total : Out[Array[float]]):",
        "    i : int = thread_id()",
        f"    v : float = a[i] * {rng.uniform(0.5, 2.0):.3f} "
        f"{rng.choice(['+', '-'])} b[i]",
    ]
    if rng.random() < 0.5:
        lines.append("    v = v + a[i] * b[i]")
    lines.append("    out[i] = v")
    if rng.random() < 0.7:
        lines.append("    atomic_add(total[0], v)")
    if rng.random() < 0.4:
        lines.append(f"    atomic_add(total[1], b[i] * {rng.uniform(0.1, 1.0):.3f})")
    return "\n".join(lines) + "\n"


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_simd_vmap_equals_scan(seed):
    """Planner soundness, generatively: for kernels the static analysis
    accepts for jax.vmap, the parallel lowering must produce bitwise-close
    results to the sequential scan fallback (the semantics)."""
    from lomanerf_tpu.dsl import parser as dslparser
    from lomanerf_tpu.dsl.lower import Lowerer

    source = _gen_simd_program(seed)
    _, funcs = dslparser.parse(source)
    low = Lowerer({}, funcs)
    f = funcs["k"]
    n = 64
    rng = np.random.default_rng(seed)

    def fresh_args():
        import jax.numpy as jnp

        return [
            jnp.asarray(rng.random(n).astype(np.float32)),
            jnp.asarray(rng.random(n).astype(np.float32)),
            jnp.zeros(n, jnp.float32),
            jnp.zeros(4, jnp.float32),
        ]

    plan = low._simd_vmap_plan(f, n)
    assert plan is not None, f"planner rejected a plannable kernel:\n{source}"
    a1 = fresh_args()
    got = low._run_simd_vmap(f, a1, n, *plan)
    rng = np.random.default_rng(seed)  # same inputs for the scan run
    a2 = fresh_args()
    want = low._run_simd_scan(f, a2, n)
    for name in ("out", "total"):
        np.testing.assert_allclose(
            np.asarray(got[name]), np.asarray(want[name]),
            rtol=1e-6, atol=1e-6, err_msg=f"seed {seed} {name}\n{source}")
