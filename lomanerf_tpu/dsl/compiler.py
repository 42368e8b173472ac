"""Compile orchestrator: DSL source -> JaxLib of callables.

The JAX-native counterpart of ``loma_public/compiler.py:70-278``: instead of
codegen + gcc/ispc/OpenCL + ctypes binding, the pipeline is

    parse -> static checks -> lower to JAX -> jit

``compile(code)`` returns ``(structs, lib)`` where ``lib.<fname>`` are
callables with reference-compatible conventions:

* plain functions: numpy arrays in, return value out; array arguments are
  written back in place (loma arrays are C pointers mutable by the callee;
  note the reference's ctypes marshalling deep-copies per call,
  mlp_utils.py:33-118, so pass fresh buffers when re-calling accumulating
  kernels).
* ``d_f = fwd_diff(f)``: ``{"val": ..., "dval": ...}`` duals for float
  args (``lib.make__dfloat`` builds them), dual result out.
* ``grad_f = rev_diff(f)``: the interleaved (value, adjoint-buffer)
  argument list loma generates (reverse_diff.py:492-517) with the trailing
  ``_dreturn`` seed; In-arg adjoints are ACCUMULATED into the passed numpy
  buffers, Out-arg adjoint buffers are read as incoming cotangents.
* compositions (``rev_diff`` of a ``fwd_diff`` function, etc.) resolve
  transitively — the reference's Hessian-by-rev-over-fwd pattern.

``target='jax'`` is the native backend; 'c'/'ispc'/'opencl' raise — this
framework runs the DSL on XLA, on every jax backend (CPU/TPU).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from lomanerf_tpu.dsl import autodiff as dsl_ad
from lomanerf_tpu.dsl import loopcheck
from lomanerf_tpu.dsl import check as dsl_check
from lomanerf_tpu.dsl import ir, parser
from lomanerf_tpu.dsl import typecheck as dsl_typecheck
from lomanerf_tpu.dsl.error import UserError
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
    """Write a result pytree back into the caller's buffers in place —
    recursing through struct (dict) values, whose arrays-of-structs are
    marshalled as dicts of numpy arrays."""
    if isinstance(buf, np.ndarray):
        np.copyto(buf, np.asarray(val).astype(buf.dtype, copy=False))
    elif isinstance(buf, dict) and isinstance(val, dict):
        for k, v in val.items():
            if k in buf:
                _writeback(buf[k], v)


def _accum_into(buf, adj):
    """Accumulate an adjoint pytree into the caller's numpy buffers —
    recursing through struct (dict) adjoints, incl. nested _dfloat duals."""
    if isinstance(buf, np.ndarray):
        buf += np.asarray(adj).astype(buf.dtype, copy=False)
    elif isinstance(buf, dict) and isinstance(adj, dict):
        for k, v in adj.items():
            if k in buf:
                _accum_into(buf[k], v)


def _make_plain_entry(spec: dsl_ad.LoweredSpec):
    if spec.is_simd:
        @functools.lru_cache(maxsize=8)
        def jitted(total_work):
            return jax.jit(lambda args: spec.simd_fn(args, total_work))

        def entry(*call_args):
            *args, total_work = call_args
            jargs = tuple(_to_jax(a) for a in args)
            finals = jitted(int(total_work))(jargs)
            for a, buf in zip(spec.args, args):
                if a.id in finals:
                    _writeback(buf, finals[a.id])
            return None

        return entry

    run = jax.jit(lambda args: spec.fn(list(args)))

    def entry(*args):
        jargs = tuple(_to_jax(a) for a in args)
        ret, finals = run(jargs)
        for a, buf in zip(spec.args, args):
            if a.id in finals:
                _writeback(buf, finals[a.id])
        if ret is not None:
            r = np.asarray(ret)
            return r.item() if r.ndim == 0 else r
        return None

    return entry


def _make_fwd_entry(spec: dsl_ad.LoweredSpec):
    if spec.is_simd:
        # fwd_diff of a @simd kernel: dual args + the reference's trailing
        # total_work (compiler.py:262-277 appends it for simd symbols)
        @functools.lru_cache(maxsize=8)
        def jitted_simd(total_work):
            return jax.jit(lambda duals: spec.simd_fn(duals, total_work))

        def entry(*call_args):
            *dual_args, total_work = call_args
            jargs = tuple(_to_jax(a) for a in dual_args)
            dual_finals = jitted_simd(int(total_work))(jargs)
            for a, buf in zip(spec.args, dual_args):
                if a.id in dual_finals and isinstance(buf, dict):
                    _writeback(buf.get("val"), dual_finals[a.id]["val"])
                    _writeback(buf.get("dval"), dual_finals[a.id]["dval"])
            return None

        return entry

    jitted = jax.jit(lambda duals: spec.fn(list(duals)))

    def entry(*dual_args):
        jargs = tuple(_to_jax(a) for a in dual_args)
        ret, dual_finals = jitted(jargs)
        for a, buf in zip(spec.args, dual_args):
            if a.id in dual_finals and isinstance(buf, dict):
                _writeback(buf.get("val"), dual_finals[a.id]["val"])
                _writeback(buf.get("dval"), dual_finals[a.id]["dval"])
        if ret is not None:
            return jax.tree.map(lambda x: float(x) if np.asarray(x).ndim == 0
                                else np.asarray(x), ret)
        return None

    return entry


def _make_rev_entry(spec: dsl_ad.LoweredSpec):
    out_names = {a.id for a in spec.args if a.is_out}
    has_ret = spec.ret

    if spec.is_simd:
        # rev_diff of a @simd kernel (the reference's parallel reverse mode,
        # hw_tests/hw3/test.py:452-515): interleaved (value, adjoint) pairs
        # + the trailing total_work the reference appends to every simd
        # symbol (compiler.py:273-275).  simd kernels return void, so there
        # is no _dreturn; the seeds are the Out-arg adjoint buffers.
        @functools.lru_cache(maxsize=8)
        def jitted_simd(total_work):
            return jax.jit(
                lambda args, out_adj:
                    spec.grad_simd_fn(list(args), out_adj, total_work)
            )

        def entry(*call_args):
            *inter, total_work = call_args
            if len(inter) != 2 * len(spec.args):
                raise TypeError(
                    f"simd grad entry expects {2 * len(spec.args)} "
                    f"interleaved args + total_work, got {len(call_args)}"
                )
            values = list(inter[0::2])
            adj_bufs = list(inter[1::2])
            out_adj = {
                a.id: _to_jax(adj)
                for a, adj in zip(spec.args, adj_bufs)
                if a.id in out_names
            }
            jargs = tuple(_to_jax(v) for v in values)
            adjoints = jitted_simd(int(total_work))(jargs, out_adj)
            for a, buf in zip(spec.args, adj_bufs):
                if a.id in adjoints:
                    _accum_into(buf, adjoints[a.id])
            return adjoints

        return entry

    jitted = jax.jit(
        lambda args, dret, out_adj: spec.grad_fn(list(args), dret, out_adj)
    )

    def entry(*call_args):
        """Interleaved loma convention: for each primal arg, (value,
        adjoint buffer); then _dreturn if the primal returns a value."""
        if has_ret:
            *inter, dreturn = call_args
        else:
            inter, dreturn = list(call_args), 1.0
        if len(inter) != 2 * len(spec.args):
            raise TypeError(
                f"grad entry expects {2 * len(spec.args)} interleaved args"
                f"{' + _dreturn' if has_ret else ''}, got {len(call_args)}"
            )
        values = list(inter[0::2])
        adj_bufs = list(inter[1::2])
        out_adj = {
            a.id: _to_jax(adj)
            for a, adj in zip(spec.args, adj_bufs)
            if a.id in out_names
        }
        jargs = tuple(_to_jax(v) for v in values)
        dret = _to_jax(dreturn) if isinstance(dreturn, dict) else \
            _to_jax(float(dreturn))
        adjoints = jitted(jargs, dret, out_adj)
        for a, buf in zip(spec.args, adj_bufs):
            if a.id in adjoints:
                _accum_into(buf, adjoints[a.id])
        return adjoints

    return entry


def _resolve_spec(name: str, funcs: Dict[str, ir.Func], lowerer: Lowerer,
                  cache: Dict[str, dsl_ad.LoweredSpec]) -> dsl_ad.LoweredSpec:
    if name in cache:
        return cache[name]
    f = funcs[name]
    if isinstance(f, ir.FunctionDef):
        spec = dsl_ad.spec_of_function(lowerer, f)
    elif isinstance(f, ir.ForwardDiff):
        primal = _resolve_spec(f.primal_func, funcs, lowerer, cache)
        if hasattr(primal, "grad_fn"):
            raise UserError("fwd_diff of a rev_diff function is unsupported",
                            f.lineno)
        spec = dsl_ad.forward_diff_spec(primal, f.id)
    elif isinstance(f, ir.ReverseDiff):
        primal = _resolve_spec(f.primal_func, funcs, lowerer, cache)
        spec = dsl_ad.reverse_diff_spec(primal, f.id)
    else:  # pragma: no cover
        raise UserError(f"unknown declaration {name}")
    cache[name] = spec
    return spec


def compile(
    code: str, target: str = "jax", output_filename: Optional[str] = None,
    loop_slack: int = 0,
) -> Tuple[Dict[str, ir.Struct], JaxLib]:
    """Compile DSL source.  Returns (structs, lib).

    ``loop_slack`` adds masked extra iterations to every bounded while loop
    (semantically free).  loma's ``max_iter`` only budgets the reverse TAPE
    (product over the nest; its C backend runs a true ``while``), so loma
    programs may exceed a single loop's max_iter — e.g. the reference NeRF
    kernel's feature loop runs 33 times under ``max_iter := 32``
    (scripts/nerf.py:85 with in_ch=33, train_nerf.py:199).  Our scan length
    is a hard per-loop bound; pass loop_slack >= the overrun to run such
    programs unmodified."""
    if target != "jax":
        raise ValueError(
            f"target {target!r} is not supported by the TPU-native DSL; "
            "use target='jax' (runs on any jax backend including TPU)"
        )
    structs, funcs = parser.parse(code)
    dsl_check.check(structs, funcs)
    dsl_typecheck.infer(structs, funcs)  # static types + auto int<->float casts

    @functools.lru_cache(maxsize=None)
    def entries_for(extend: int) -> Dict[str, Any]:
        """All entries lowered with ``extend`` extra scan iterations per
        bounded loop (0 = the plain user-requested loop_slack)."""
        lowerer = Lowerer(structs, funcs, loop_slack=loop_slack,
                          loop_extend=extend)
        cache: Dict[str, dsl_ad.LoweredSpec] = {}
        ents: Dict[str, Any] = {}
        for name, f in funcs.items():
            spec = _resolve_spec(name, funcs, lowerer, cache)
            if isinstance(f, ir.FunctionDef):
                ents[name] = _make_plain_entry(spec)
            elif isinstance(f, ir.ForwardDiff):
                ents[name] = _make_fwd_entry(spec)
            else:
                ents[name] = _make_rev_entry(spec)
        return ents

    def primal_def(f: ir.Func) -> ir.FunctionDef:
        while not isinstance(f, ir.FunctionDef):
            f = funcs[f.primal_func]
        return f

    # lower the whole module EAGERLY so lowering-stage errors surface at
    # compile() (the reference compiler's behavior), not at first call
    entries_for(0)

    lib = JaxLib()
    for name, f in funcs.items():
        bounds = loopcheck.analyze(primal_def(f))
        lib.add(name, _autoslack_entry(name, f, primal_def(f), bounds,
                                       loop_slack, entries_for))
    return structs, lib


def _autoslack_entry(name: str, decl: ir.Func, primal: ir.FunctionDef,
                     bounds, user_slack: int, entries_for):
    """Wrap an entry with the loop-overrun auto-extension.

    ``dsl/loopcheck.analyze`` recognizes counting loops whose bound is a
    constant or an unmodified ``In[int]`` argument; constants resolve here
    at compile time, argument bounds resolve per call from the concrete
    value.  When a loop needs more iterations than ``max_iter +
    loop_slack`` allows, the entry dispatches to a re-lowered variant with
    the scan extended to cover it (semantically free — extra iterations
    are condition-gated no-ops) and warns, instead of silently truncating.
    The reference's own NeRF kernel needs this: its feature loop runs
    layer_input_w=33 times under ``max_iter := 32`` (reference
    scripts/nerf.py:85), legal in loma where max_iter only sizes the
    reverse tape.  Loops the analysis can't see are caught at execution
    time by lower.py's truncation guard."""
    import warnings

    from lomanerf_tpu.dsl.error import LoopBoundWarning

    kind = ("plain" if isinstance(decl, ir.FunctionDef)
            else "fwd" if isinstance(decl, ir.ForwardDiff) else "rev")
    arg_pos = {a.id: i for i, a in enumerate(primal.args)}
    const_extra = max(
        (lb.extra_needed(lb.bound, user_slack)
         for lb in bounds if isinstance(lb.bound, int)),
        default=0,
    )
    dyn = [lb for lb in bounds if isinstance(lb.bound, str)]
    warned: set = set()

    if not dyn and not const_extra:
        # nothing to probe: expose the base entry directly
        return lambda *a: entries_for(0)[name](*a)

    def entry(*call_args):
        extra = const_extra
        culprit = None
        for lb in dyn:
            i = arg_pos[lb.bound]
            v = call_args[2 * i] if kind == "rev" else call_args[i]
            if isinstance(v, dict):  # fwd-diff dual (ints pass through raw)
                v = v.get("val", 0)
            try:
                v = int(np.asarray(v))
            except (TypeError, ValueError):  # pragma: no cover
                continue
            e = lb.extra_needed(v, user_slack)
            if e > extra:
                extra, culprit = e, (lb, v)
        if extra and (name, extra) not in warned:
            warned.add((name, extra))
            where = (f"line {culprit[0].lineno} (bound {culprit[0].bound}="
                     f"{culprit[1]})" if culprit else "a constant-bound loop")
            warnings.warn(
                f"'{name}': the while loop at {where} runs more iterations "
                f"than max_iter + loop_slack allows; auto-extending every "
                f"scan by {extra} (legal in loma, where max_iter only "
                f"sizes the reverse tape).",
                LoopBoundWarning, stacklevel=2,
            )
        return entries_for(extra)[name](*call_args)

    return entry
