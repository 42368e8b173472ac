"""DSL autodiff: fwd_diff via jax.jvp, rev_diff via jax.vjp.

Replaces the reference's source-to-source transforms (forward_diff.py,
reverse_diff.py) — the lowered IR is a pure JAX program, so dual numbers
and adjoints come from jax's transforms with exactly the same calling
conventions loma generates:

* ``fwd_diff(f)``: every float leaf becomes a ``_dfloat`` dual
  ``{"val", "dval"}`` (autodiff.py:42-112); ints pass through.
* ``rev_diff(f)``: each In arg gains an adjoint *output* (accumulated, like
  loma's ``+=``/atomic_add adjoints), Out args' adjoints and the return
  adjoint ``_dreturn`` are *inputs* (reverse_diff.py:492-517).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from lomanerf_tpu.dsl import ir
from lomanerf_tpu.dsl.lower import Lowerer, zero_value


def _is_float_type(t: ir.Type) -> bool:
    if isinstance(t, ir.Float):
        return True
    if isinstance(t, ir.Array):
        return _is_float_type(t.elem)
    if isinstance(t, ir.Struct):
        return any(_is_float_type(ft) for _, ft in t.fields)
    if isinstance(t, ir.Diff):
        return True
    return False


def _float_leaves_only(x):
    """Tangent/cotangent structure: float leaves keep, int leaves -> zeros
    (jax requires symbolic-zero-compatible tangents; int tangents illegal)."""
    return jax.tree.map(
        lambda a: a if jnp.issubdtype(a.dtype, jnp.floating) else None, x
    )


def make_forward_diff(lowerer: Lowerer, primal: ir.FunctionDef):
    """d_f(*dual_args) -> dual result.

    Dual args: float-typed args (and float leaves inside structs/arrays)
    are ``{"val": ..., "dval": ...}``; ints are plain.
    """

    def primal_fn(vals: List[Any]):
        ret, finals = lowerer.run_function(primal, vals)
        return (ret, finals)

    def d_f(*dual_args):
        vals, tans = [], []
        for a, x in zip(primal.args, dual_args):
            if _is_float_type(a.t):
                vals.append(x["val"])
                tans.append(x["dval"])
            else:
                vals.append(jnp.asarray(x))
                tans.append(None)

        # close over int args (no tangents allowed)
        float_idx = [i for i, t in enumerate(tans) if t is not None]

        def g(float_vals):
            full = list(vals)
            for i, v in zip(float_idx, float_vals):
                full[i] = v
            return primal_fn(full)

        fvals = tuple(vals[i] for i in float_idx)
        ftans = tuple(tans[i] for i in float_idx)
        (ret, finals), (dret, dfinals) = jax.jvp(g, (fvals,), (ftans,))
        out_ret = None
        if ret is not None:
            out_ret = {"val": ret, "dval": dret}
        dual_finals = {
            k: {"val": finals[k], "dval": dfinals[k]} for k in finals
        }
        return out_ret, dual_finals

    return d_f


def make_reverse_diff(lowerer: Lowerer, primal: ir.FunctionDef):
    """grad_f(*args, _dreturn=..., out_adjoints=...) -> in-arg adjoints.

    Args are the primal values.  ``_dreturn`` seeds the return adjoint (the
    reference feeds the running loss here, train_nerf.py:477).
    ``out_adjoints`` maps Out-arg names to their incoming adjoints.
    Returns {in_arg_name: adjoint} for differentiable In args.
    """

    diff_idx = [
        i for i, a in enumerate(primal.args)
        if not a.is_out and _is_float_type(a.t)
    ]
    out_names = [a.id for a in primal.args if a.is_out]

    def grad_f(*args, _dreturn=1.0, out_adjoints: Dict[str, Any] = None):
        args = [jnp.asarray(x) if not isinstance(x, dict) else x for x in args]

        def g(diff_args):
            full = list(args)
            for i, v in zip(diff_idx, diff_args):
                full[i] = v
            ret, finals = lowerer.run_function(primal, full)
            outs = {k: finals[k] for k in out_names if k in finals}
            return ret, outs

        diff_args = tuple(args[i] for i in diff_idx)
        (ret, outs), vjp_fn = jax.vjp(g, diff_args)
        ret_ct = (
            jnp.asarray(_dreturn, jnp.float32) if ret is not None else None
        )
        outs_ct = {
            k: (out_adjoints or {}).get(k, jnp.zeros_like(v))
            for k, v in outs.items()
        }
        (d_diff_args,) = vjp_fn((ret_ct, outs_ct))
        return {
            primal.args[i].id: d
            for i, d in zip(diff_idx, d_diff_args)
        }

    return grad_f
