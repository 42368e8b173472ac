"""Compile orchestrator: DSL source -> JaxLib of callables.

The JAX-native counterpart of ``loma_public/compiler.py:70-278``: instead of
codegen + gcc/ispc/OpenCL + ctypes binding, the pipeline is

    parse -> static checks -> lower to JAX -> jit

``compile(code)`` returns ``(structs, lib)`` where ``lib.<fname>`` are
callables with reference-compatible conventions:

* plain functions: numpy arrays in, return value out; array arguments are
  written back in place (loma arrays are C pointers mutable by the callee —
  the reference's ctypes marshalling deep-copies so only read-back buffers
  round-trip, mlp_utils.py:33-118; here mutation is actually visible, a
  strict superset).
* ``d_f = fwd_diff(f)``: takes ``{"val": ..., "dval": ...}`` duals for
  float args (``lib.make__dfloat`` builds them), returns a dual.
* ``grad_f = rev_diff(f)``: takes the interleaved (value, adjoint-buffer)
  argument list loma generates (reverse_diff.py:492-517) with the trailing
  ``_dreturn`` seed; In-arg adjoints are ACCUMULATED into the passed numpy
  buffers, Out-arg adjoint buffers are read as incoming cotangents.

``target='jax'`` is the native backend; 'c'/'ispc'/'opencl' raise — this
framework runs the DSL on XLA, on every jax backend (CPU/TPU), with the
same bounded-loop/tape discipline.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from lomanerf_tpu.dsl import autodiff as dsl_ad
from lomanerf_tpu.dsl import check as dsl_check
from lomanerf_tpu.dsl import ir, parser
from lomanerf_tpu.dsl.lower import Lowerer


def make__dfloat(val, dval):
    return {"val": jnp.asarray(val, jnp.float32),
            "dval": jnp.asarray(dval, jnp.float32)}


class JaxLib:
    """Namespace of compiled DSL entry points (the CDLL analog)."""

    def __init__(self):
        self._fns: Dict[str, Any] = {}
        self.make__dfloat = make__dfloat

    def __getattr__(self, name):
        fns = self.__dict__.get("_fns", {})
        if name in fns:
            return fns[name]
        raise AttributeError(name)

    def add(self, name, fn):
        self._fns[name] = fn


def _to_jax(x):
    if isinstance(x, dict):
        return {k: _to_jax(v) for k, v in x.items()}
    if isinstance(x, (int, np.integer)):
        return jnp.asarray(x, jnp.int32)
    if isinstance(x, (float, np.floating)):
        return jnp.asarray(x, jnp.float32)
    a = np.asarray(x)
    if a.dtype == np.float64:
        a = a.astype(np.float32)
    if a.dtype == np.int64:
        a = a.astype(np.int32)
    return jnp.asarray(a)


def _writeback(buf, val):
    if isinstance(buf, np.ndarray):
        np.copyto(buf, np.asarray(val).astype(buf.dtype, copy=False))


def _make_plain_entry(lowerer: Lowerer, f: ir.FunctionDef):
    if f.is_simd:
        @functools.lru_cache(maxsize=8)
        def jitted(total_work):
            def run(args):
                return lowerer.run_simd(f, list(args), total_work)

            return jax.jit(run)

        def entry(*call_args):
            *args, total_work = call_args
            jargs = tuple(_to_jax(a) for a in args)
            finals = jitted(int(total_work))(jargs)
            for a, buf in zip(f.args, args):
                if a.id in finals:
                    _writeback(buf, finals[a.id])
            return None

        return entry

    run = jax.jit(lambda args: lowerer.run_function(f, list(args)))

    def entry(*args):
        jargs = tuple(_to_jax(a) for a in args)
        ret, finals = run(jargs)
        for a, buf in zip(f.args, args):
            if a.id in finals:
                _writeback(buf, finals[a.id])
        if ret is not None:
            r = np.asarray(ret)
            return r.item() if r.ndim == 0 else r
        return None

    return entry


def _make_fwd_entry(lowerer: Lowerer, primal: ir.FunctionDef):
    d_f = dsl_ad.make_forward_diff(lowerer, primal)
    jitted = jax.jit(lambda duals: d_f(*duals))

    def entry(*dual_args):
        jargs = tuple(_to_jax(a) for a in dual_args)
        ret, dual_finals = jitted(jargs)
        for a, buf in zip(primal.args, dual_args):
            if a.id in dual_finals and isinstance(buf, dict):
                _writeback(buf.get("val"), dual_finals[a.id]["val"])
                _writeback(buf.get("dval"), dual_finals[a.id]["dval"])
        if ret is not None:
            return {
                "val": float(ret["val"]), "dval": float(ret["dval"])
            }
        return None

    return entry


def _make_rev_entry(lowerer: Lowerer, primal: ir.FunctionDef):
    grad_f = dsl_ad.make_reverse_diff(lowerer, primal)
    out_names = {a.id for a in primal.args if a.is_out}
    has_ret = primal.ret_type is not None

    def run(args, dret, out_adj):
        return grad_f(*args, _dreturn=dret, out_adjoints=out_adj)

    jitted = jax.jit(run)

    def entry(*call_args):
        """Interleaved loma convention: for each primal arg, (value,
        adjoint buffer); then _dreturn if the primal returns a value."""
        if has_ret:
            *inter, dreturn = call_args
        else:
            inter, dreturn = call_args, 1.0
        if len(inter) != 2 * len(primal.args):
            raise TypeError(
                f"grad entry expects {2 * len(primal.args)} interleaved args"
                f"{' + _dreturn' if has_ret else ''}, got {len(call_args)}"
            )
        values = list(inter[0::2])
        adj_bufs = list(inter[1::2])
        out_adj = {
            a.id: _to_jax(adj)
            for a, adj in zip(primal.args, adj_bufs)
            if a.id in out_names
        }
        jargs = tuple(_to_jax(v) for v in values)
        adjoints = jitted(jargs, _to_jax(float(dreturn)), out_adj)
        for a, buf in zip(primal.args, adj_bufs):
            if a.id in adjoints and isinstance(buf, np.ndarray):
                # loma ACCUMULATES adjoints into the caller's buffers
                buf += np.asarray(adjoints[a.id]).astype(buf.dtype,
                                                         copy=False)
        return adjoints

    return entry


def compile(
    code: str, target: str = "jax", output_filename: Optional[str] = None
) -> Tuple[Dict[str, ir.Struct], JaxLib]:
    """Compile DSL source.  Returns (structs, lib)."""
    if target != "jax":
        raise ValueError(
            f"target {target!r} is not supported by the TPU-native DSL; "
            "use target='jax' (runs on any jax backend including TPU)"
        )
    structs, funcs = parser.parse(code)
    dsl_check.check(structs, funcs)
    lowerer = Lowerer(structs, funcs)
    lib = JaxLib()
    for name, f in funcs.items():
        if isinstance(f, ir.FunctionDef):
            lib.add(name, _make_plain_entry(lowerer, f))
        elif isinstance(f, ir.ForwardDiff):
            primal = funcs[f.primal_func]
            lib.add(name, _make_fwd_entry(lowerer, primal))
        elif isinstance(f, ir.ReverseDiff):
            primal = funcs[f.primal_func]
            lib.add(name, _make_rev_entry(lowerer, primal))
    return structs, lib
