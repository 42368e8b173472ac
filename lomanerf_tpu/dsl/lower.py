"""Lowering: DSL IR -> jittable JAX functions.

This replaces the reference's entire code-generation backend
(codegen_c/ispc/opencl + source-to-source autodiff): the IR is executed as
a *pure functional* JAX program, so ``jax.jvp`` / ``jax.vjp`` provide
forward/reverse differentiation with exactly loma's semantics:

* mutable locals/arrays -> an environment pytree threaded through statements
  (array writes are functional ``.at[...].set``),
* ``if/else`` -> ``lax.cond`` over the env carry: both branches are traced
  once but only the TAKEN branch executes — loma's exact semantics (an
  untaken branch that would divide by zero or index out of bounds has no
  effect on values or adjoints; reverse-mode reverses per-branch,
  reverse_diff.py:618-625),
* bounded ``while (cond, max_iter := N)`` -> ``lax.scan`` over N iterations
  whose body runs under ``lax.cond(pred, body, identity)`` — iterations
  past the dynamic trip count are skipped, not masked-and-discarded; the
  scan carry IS loma's statically-sized tape (reverse_diff.py:444-461) —
  same max_iter discipline, same memory bound,
* ``@simd`` bodies -> ``lax.scan`` over thread ids with shared buffers in
  the carry (sequentialized threads: deterministic, race-free, and the
  adjoint of ``atomic_add`` accumulation falls out of scan's VJP — the role
  loma's atomic_add plays in reverse mode, reverse_diff.py:144-155),
* user calls -> inlined lowered callees with copy-in/copy-out array args
  (loma arrays are C pointers mutable by callees).

Values: Int/Float -> 0-d jnp arrays; Array -> jnp arrays (structs-of-arrays
for arrays of structs); Struct/Diff -> dicts.  ``_dfloat`` is the dict
``{"val": x, "dval": dx}`` (autodiff.py:164-166's struct, as a pytree).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp

from lomanerf_tpu.dsl import ir
from lomanerf_tpu.dsl.error import TypeMismatch, UserError


def zero_value(t: ir.Type) -> Any:
    if isinstance(t, ir.Int):
        return jnp.zeros((), jnp.int32)
    if isinstance(t, ir.Float):
        return jnp.zeros((), jnp.float32)
    if isinstance(t, ir.Array):
        inner = zero_value(t.elem)
        n = t.static_size
        return jax.tree.map(
            lambda z: jnp.zeros((n,) + z.shape, z.dtype), inner
        )
    if isinstance(t, ir.Struct):
        return {f: zero_value(ft) for f, ft in t.fields}
    if isinstance(t, ir.Diff):
        base = zero_value(t.of)
        return {"val": base, "dval": base}
    raise TypeMismatch(f"cannot zero-init type {t}")


def _index(value, idx):
    return jax.tree.map(lambda a: a[idx], value)


def _set_path(container, path, new_value):
    """Functional update along a path of ('idx', i) / ('field', name)."""
    if not path:
        return new_value
    kind, key = path[0]
    if kind == "field":
        return {**container, key: _set_path(container[key], path[1:],
                                            new_value)}
    sub = _set_path(_index(container, key), path[1:], new_value)
    return jax.tree.map(lambda a, s: a.at[key].set(s), container, sub)


def _as_bool(pred):
    """loma conditions are int/float (nonzero = true) or comparisons."""
    if hasattr(pred, "dtype") and pred.dtype == jnp.bool_:
        return pred
    return pred != 0


def _dual_split(t: ir.Type, v):
    """Split a diff-typed VALUE of primal type ``t`` (struct-of-duals, the
    loma _dStruct layout) into (primal, tangent) trees.  Int leaves get
    float0 tangents so ``jax.jvp`` accepts them."""
    import numpy as np

    if isinstance(t, ir.Float):
        return v["val"], v["dval"]
    if isinstance(t, ir.Int):
        return v, np.zeros(getattr(v, "shape", ()), jax.dtypes.float0)
    if isinstance(t, ir.Array):
        return _dual_split(t.elem, v)  # arrays-of-structs are struct-of-arrays
    if isinstance(t, ir.Struct):
        vals, tans = {}, {}
        for f, ft in t.fields:
            vals[f], tans[f] = _dual_split(ft, v[f])
        return vals, tans
    if isinstance(t, ir.Diff):
        return v["val"], v["dval"]
    raise TypeMismatch(f"cannot split dual of type {t}")


def _dual_merge(t: ir.Type, val, tan):
    """Inverse of :func:`_dual_split`: rebuild the struct-of-duals value."""
    if isinstance(t, (ir.Float, ir.Diff)):
        return {"val": val, "dval": tan}
    if isinstance(t, ir.Int):
        return val
    if isinstance(t, ir.Array):
        return _dual_merge(t.elem, val, tan)
    if isinstance(t, ir.Struct):
        return {f: _dual_merge(ft, val[f], tan[f]) for f, ft in t.fields}
    raise TypeMismatch(f"cannot merge dual of type {t}")


_BUILTIN_FNS = {
    "sin": jnp.sin,
    "cos": jnp.cos,
    "sqrt": jnp.sqrt,
    "exp": jnp.exp,
    "log": jnp.log,
}


class Lowerer:
    def __init__(self, structs: Dict[str, ir.Struct],
                 funcs: Dict[str, ir.Func], loop_slack: int = 0):
        self.structs = structs
        self.funcs = funcs
        # loma's ``max_iter`` budgets the reverse-mode TAPE as the product
        # over the loop nest — its C backend emits a true ``while``, so a
        # single loop may legally exceed its own max_iter as long as the
        # nest's total work stays within the product (the reference's NeRF
        # kernel does exactly this: ``k < layer_input_w`` with
        # layer_input_w=33 under ``max_iter := 32``, scripts/nerf.py:85).
        # Our scan length IS the bound, so such programs request extra
        # masked iterations explicitly via ``loop_slack`` (semantically
        # free: a false condition leaves the env unchanged).
        self.loop_slack = loop_slack

    # -- expressions --------------------------------------------------------

    def eval_expr(self, e: ir.Expr, env: Dict) -> Any:
        if isinstance(e, ir.Var):
            return env[e.id]
        if isinstance(e, ir.ConstInt):
            return jnp.asarray(e.val, jnp.int32)
        if isinstance(e, ir.ConstFloat):
            return jnp.asarray(e.val, jnp.float32)
        if isinstance(e, ir.ArrayAccess):
            return _index(self.eval_expr(e.array, env),
                          self.eval_expr(e.index, env))
        if isinstance(e, ir.StructAccess):
            return self.eval_expr(e.struct, env)[e.member]
        if isinstance(e, ir.UnaryOp):
            return -self.eval_expr(e.operand, env)
        if isinstance(e, ir.BinaryOp):
            return self._binop(e, env)
        if isinstance(e, ir.Call):
            return self._call_expr(e, env)
        raise UserError(f"cannot evaluate {e}", getattr(e, "lineno", None))

    def _binop(self, e: ir.BinaryOp, env: Dict):
        a = self.eval_expr(e.left, env)
        b = self.eval_expr(e.right, env)
        op = e.op
        both_int = (
            hasattr(a, "dtype") and hasattr(b, "dtype")
            and jnp.issubdtype(a.dtype, jnp.integer)
            and jnp.issubdtype(b.dtype, jnp.integer)
        )
        if op == "+":
            return a + b
        if op == "-":
            return a - b
        if op == "*":
            return a * b
        if op == "/":
            # C semantics: int / int truncates toward zero
            return jax.lax.div(a, b) if both_int else a / b
        if op == "%":
            return jax.lax.rem(a, b)
        if op == "<":
            return a < b
        if op == "<=":
            return a <= b
        if op == ">":
            return a > b
        if op == ">=":
            return a >= b
        if op == "==":
            return a == b
        if op == "!=":
            return a != b
        if op == "and":
            return jnp.logical_and(a, b)
        if op == "or":
            return jnp.logical_or(a, b)
        raise UserError(f"unknown operator {op}", e.lineno)

    def _call_expr(self, e: ir.Call, env: Dict):
        if e.id in _BUILTIN_FNS:
            return _BUILTIN_FNS[e.id](self.eval_expr(e.args[0], env))
        if e.id == "pow":
            return jnp.power(self.eval_expr(e.args[0], env),
                             self.eval_expr(e.args[1], env))
        if e.id == "int2float":
            return self.eval_expr(e.args[0], env).astype(jnp.float32)
        if e.id == "float2int":
            return self.eval_expr(e.args[0], env).astype(jnp.int32)
        if e.id == "thread_id":
            return env["__thread_id__"]
        if e.id == "make__dfloat":
            return {
                "val": self.eval_expr(e.args[0], env).astype(jnp.float32),
                "dval": self.eval_expr(e.args[1], env).astype(jnp.float32),
            }
        if e.id in self.funcs:
            ret, env = self._call_user(e, env)
            return ret
        raise UserError(f"unknown function {e.id}", e.lineno)

    # -- calls --------------------------------------------------------------

    def _target_path(self, e: ir.Expr, env: Dict):
        """Decompose an lvalue expr into (root var name, path)."""
        path = []
        while True:
            if isinstance(e, ir.Var):
                return e.id, list(reversed(path))
            if isinstance(e, ir.ArrayAccess):
                path.append(("idx", self.eval_expr(e.index, env)))
                e = e.array
            elif isinstance(e, ir.StructAccess):
                path.append(("field", e.member))
                e = e.struct
            else:
                raise UserError("invalid assignment target",
                                getattr(e, "lineno", None))

    def _call_user(self, e: ir.Call, env: Dict):
        callee = self.funcs[e.id]
        arg_vals = [self.eval_expr(a, env) for a in e.args]
        if isinstance(callee, ir.FunctionDef):
            ret, finals = self.run_function(
                callee, arg_vals, thread_id=env.get("__thread_id__")
            )
            arg_defs = callee.args
        elif isinstance(callee, ir.ForwardDiff):
            ret, finals = self._call_fwd_diff(callee, arg_vals, env)
            arg_defs = self.funcs[callee.primal_func].args
        else:
            raise UserError(
                f"cannot call rev_diff declaration '{e.id}' directly "
                "from DSL code", e.lineno,
            )
        # copy-out: arrays (C pointers) and Out args mutate the caller's view
        for arg, expr in zip(arg_defs, e.args):
            if arg.id in finals:
                root, path = self._target_path(expr, env)
                env = {**env, root: _set_path(env[root], path,
                                              finals[arg.id])}
        return ret, env

    def _call_fwd_diff(self, fd: ir.ForwardDiff, arg_vals: List[Any],
                       env: Dict):
        """DSL-level call to a fwd_diff function (the reference's pendulum
        pattern): args/results are structural diff values (struct-of-duals);
        the dual arithmetic is jax.jvp over the lowered primal."""
        primal = self.funcs[fd.primal_func]
        if not isinstance(primal, ir.FunctionDef):
            raise UserError(
                f"fwd_diff of non-function '{fd.primal_func}'", fd.lineno
            )
        vals, tans = [], []
        for a, dv in zip(primal.args, arg_vals):
            v, t = _dual_split(a.t, dv)
            vals.append(v)
            tans.append(t)
        tid = env.get("__thread_id__")

        def g(vs):
            return self.run_function(primal, list(vs), thread_id=tid)

        (ret, finals), (dret, dfinals) = jax.jvp(
            g, (tuple(vals),), (tuple(tans),)
        )
        out = (_dual_merge(primal.ret_type, ret, dret)
               if primal.ret_type is not None else None)
        arg_types = {a.id: a.t for a in primal.args}
        dual_finals = {
            k: _dual_merge(arg_types[k], finals[k], dfinals[k])
            for k in finals
        }
        return out, dual_finals

    # -- statements ---------------------------------------------------------

    def exec_stmts(self, stmts: List[ir.Stmt], env: Dict) -> Dict:
        for s in stmts:
            env = self.exec_stmt(s, env)
        return env

    def exec_stmt(self, s: ir.Stmt, env: Dict) -> Dict:
        if isinstance(s, ir.Declare):
            val = (self._coerce(self.eval_expr(s.val, env), s.t)
                   if s.val is not None else zero_value(s.t))
            return {**env, s.target: val}
        if isinstance(s, ir.Assign):
            root, path = self._target_path(s.target, env)
            val = self.eval_expr(s.val, env)
            old = env[root]
            # numeric coercion to the stored dtype (loma auto-casts,
            # type_inference.py:99-155)
            site = old
            for kind, key in path:
                site = site[key] if kind == "field" else _index(site, key)
            val = self._coerce_like(val, site)
            return {**env, root: _set_path(old, path, val)}
        if isinstance(s, ir.Return):
            return {**env, "__ret__": self.eval_expr(s.val, env)}
        if isinstance(s, ir.IfElse):
            # lax.cond: both branches traced, only the taken one executes —
            # matching loma's taken-branch-only values AND adjoints (an
            # untaken 1/0 or sqrt(-x) cannot NaN the gradient)
            pred = _as_bool(self.eval_expr(s.cond, env))
            keys = sorted(env.keys())

            def _branch(stmts):
                def fn(carry):
                    e = self.exec_stmts(stmts, dict(zip(keys, carry)))
                    return tuple(e[k] for k in keys)
                return fn

            carry = jax.lax.cond(
                pred, _branch(s.then_stmts), _branch(s.else_stmts),
                tuple(env[k] for k in keys),
            )
            return dict(zip(keys, carry))
        if isinstance(s, ir.While):
            return self._exec_while(s, env)
        if isinstance(s, ir.CallStmt):
            call = s.call
            if call.id == "atomic_add":
                root, path = self._target_path(call.args[0], env)
                add = self.eval_expr(call.args[1], env)
                site = env[root]
                for kind, key in path:
                    site = site[key] if kind == "field" else _index(site, key)
                return {**env, root: _set_path(env[root], path, site + add)}
            if call.id in self.funcs:
                _, env = self._call_user(call, env)
                return env
            # builtin as statement (no effect)
            self.eval_expr(call, env)
            return env
        raise UserError(f"cannot execute {s}", getattr(s, "lineno", None))

    def _exec_while(self, s: ir.While, env: Dict) -> Dict:
        keys = sorted(env.keys())
        carry0 = tuple(env[k] for k in keys)

        def run_body(carry):
            e = self.exec_stmts(s.body, dict(zip(keys, carry)))
            return tuple(e[k] for k in keys)

        def body(carry, _):
            pred = _as_bool(self.eval_expr(s.cond, dict(zip(keys, carry))))
            # iterations past the dynamic trip count are SKIPPED (lax.cond),
            # not masked-and-discarded: no compute and no NaN-able adjoints
            # from out-of-range reads, exactly like loma's runtime while
            return jax.lax.cond(pred, run_body, lambda c: c, carry), None

        carry, _ = jax.lax.scan(
            body, carry0, None, length=s.max_iter + self.loop_slack
        )
        return dict(zip(keys, carry))

    def _coerce(self, val, t: ir.Type):
        if isinstance(t, ir.Float) and hasattr(val, "astype"):
            return val.astype(jnp.float32)
        if isinstance(t, ir.Int) and hasattr(val, "astype"):
            return val.astype(jnp.int32)
        return val

    def _coerce_like(self, val, site):
        if hasattr(site, "dtype") and hasattr(val, "astype"):
            return val.astype(site.dtype)
        return val

    # -- functions ----------------------------------------------------------

    def run_function(self, f: ir.FunctionDef, arg_vals: List[Any],
                     thread_id=None) -> Tuple[Any, Dict[str, Any]]:
        """Execute a (non-simd dispatch of a) function body.

        Returns (return_value_or_None, {mutable_arg_name: final_value}).
        """
        env = {a.id: v for a, v in zip(f.args, arg_vals)}
        if thread_id is not None:
            env["__thread_id__"] = thread_id
        env = self.exec_stmts(f.body, env)
        mutable = {
            a.id: env[a.id]
            for a in f.args
            if a.is_out or isinstance(a.t, ir.Array)
        }
        return env.get("__ret__"), mutable

    def run_simd(self, f: ir.FunctionDef, arg_vals: List[Any],
                 total_work: int) -> Dict[str, Any]:
        """Dispatch a @simd kernel: scan over thread ids with the shared
        buffers in the carry (deterministic sequential threads)."""
        env0 = {a.id: v for a, v in zip(f.args, arg_vals)}
        keys = sorted(env0.keys())
        carry0 = tuple(env0[k] for k in keys)

        def body(carry, tid):
            env = dict(zip(keys, carry))
            env["__thread_id__"] = tid
            env = self.exec_stmts(f.body, env)
            return tuple(env[k] for k in keys), None

        carry, _ = jax.lax.scan(
            body, carry0, jnp.arange(total_work, dtype=jnp.int32)
        )
        env = dict(zip(keys, carry))
        return {
            a.id: env[a.id]
            for a in f.args
            if a.is_out or isinstance(a.t, ir.Array)
        }
