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
* ``@simd`` bodies -> ``jax.vmap`` over thread ids when static analysis
  proves the only cross-thread effects are thread-indexed slots and
  ``atomic_add`` accumulation (gather/scatter slots + summed per-thread
  contributions — true parallel work-items, like the reference's
  ISPC/OpenCL backends, codegen_ispc.py:15-75); otherwise ``lax.scan``
  with shared buffers in the carry (sequentialized threads: deterministic,
  race-free, and the adjoint of ``atomic_add`` accumulation falls out of
  either lowering's VJP — the role loma's atomic_add plays in reverse
  mode, reverse_diff.py:144-155),
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


# record of runtime loop truncations (lineno, budget) — appended by the
# jax.debug.callback guard in _exec_while at EXECUTION time; tests and
# tools read/clear it (warnings also fire, but callbacks may run off the
# pytest-warning-capture thread)
TRUNCATION_EVENTS: List[Tuple[int, int]] = []


def report_truncation(still_true, lineno, budget) -> None:
    import numpy as _np

    if not _np.any(_np.asarray(still_true)):
        return
    lineno, budget = int(lineno), int(budget)
    msg = (
        f"bounded while loop at line {lineno} exhausted its scan budget "
        f"({budget} iterations) with its condition still true: results are "
        f"TRUNCATED. loma's max_iter only sizes the reverse tape "
        f"(reference reverse_diff.py:444-461); recompile with "
        f"loop_slack >= the overrun to run the remaining iterations."
    )
    if len(TRUNCATION_EVENTS) < 1000:
        TRUNCATION_EVENTS.append((lineno, budget))
    import warnings

    warnings.warn(msg, RuntimeWarning, stacklevel=2)


class Lowerer:
    def __init__(self, structs: Dict[str, ir.Struct],
                 funcs: Dict[str, ir.Func], loop_slack: int = 0,
                 loop_extend: int = 0, guard_truncation: bool = True):
        self.structs = structs
        self.funcs = funcs
        # auto-extension computed by the compiler's static/call-time trip
        # analysis (dsl/loopcheck.py) — same semantics as loop_slack but
        # derived, not user-requested
        self.loop_extend = loop_extend
        self.guard_truncation = guard_truncation
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
        # roots of @simd shared buffers accessed only at thread_id() —
        # inside the vmap lowering their env entry IS the thread's slot
        # (set dynamically by _run_simd_vmap)
        self._slotted: frozenset = frozenset()

    # -- expressions --------------------------------------------------------

    def eval_expr(self, e: ir.Expr, env: Dict) -> Any:
        if isinstance(e, ir.Var):
            return env[e.id]
        if isinstance(e, ir.ConstInt):
            return jnp.asarray(e.val, jnp.int32)
        if isinstance(e, ir.ConstFloat):
            return jnp.asarray(e.val, jnp.float32)
        if isinstance(e, ir.ArrayAccess):
            if isinstance(e.array, ir.Var) and e.array.id in self._slotted:
                # slotted @simd buffer: env holds this thread's slot (the
                # vmap plan proved the index is thread_id())
                return env[e.array.id]
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
                p = list(reversed(path))
                if e.id in self._slotted and p and p[0][0] == "idx":
                    # slotted @simd buffer: the innermost [thread_id()]
                    # level is the env entry itself
                    p = p[1:]
                return e.id, p
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

        budget = s.max_iter + self.loop_slack + self.loop_extend
        carry, _ = jax.lax.scan(body, carry0, None, length=budget)
        if self.guard_truncation:
            # loud truncation guard: if the condition is STILL true after
            # the scan budget, the loop wanted more iterations than
            # max_iter (+slack) — legal in loma, whose max_iter only sizes
            # the reverse tape (reference reverse_diff.py:444-461), but a
            # hard bound for our scan.  The callback records the event and
            # warns at execution time (transform-safe: fires under
            # jit/jvp/vjp/vmap).
            still = _as_bool(self.eval_expr(s.cond, dict(zip(keys, carry))))
            jax.debug.callback(
                report_truncation, still, s.lineno or 0, budget
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
        # slotted-name interception is scoped to the @simd BODY frame:
        # a callee whose parameter happens to share a slotted buffer's
        # name must index its own (by-value) arrays normally.  Copy-out
        # runs in the caller's frame afterwards, where slotting applies.
        prev = self._slotted
        self._slotted = frozenset()
        try:
            env = self.exec_stmts(f.body, env)
        finally:
            self._slotted = prev
        mutable = {
            a.id: env[a.id]
            for a in f.args
            if a.is_out or isinstance(a.t, ir.Array)
        }
        return env.get("__ret__"), mutable

    def run_simd(self, f: ir.FunctionDef, arg_vals: List[Any],
                 total_work: int) -> Dict[str, Any]:
        """Dispatch a @simd kernel.

        When static analysis proves the body's only cross-thread effects
        are thread-indexed slots and ``atomic_add`` accumulation (the
        reference's entire ``@simd`` contract — its ISPC/OpenCL backends
        run work-items concurrently with atomics as the sole communication
        primitive, codegen_ispc.py:15-75, codegen_opencl.py:15-62), lower
        to ``jax.vmap`` over thread ids: slots are gathered/scattered, and
        per-thread atomic contributions are summed — the TPU-native
        parallel execution of the work-item model.  Bodies with
        order-dependent shared effects fall back to the sequential scan
        (last-writer / read-your-predecessors semantics).
        """
        plan = self._simd_vmap_plan(f, total_work)
        if plan is not None:
            slotted, accums = plan
            # accumulator contributions materialize as (total_work, *shape)
            # before the sum; bail to the memory-bounded scan when that
            # would be huge.  Sized from the RUNTIME values (unsized
            # Array[...] accumulators have no static size in the IR).
            if accums:
                elems = sum(
                    int(z.size)
                    for a, v in zip(f.args, arg_vals)
                    if a.id in accums
                    for z in jax.tree.leaves(v)
                )
                if total_work * elems > (1 << 24):
                    plan = None
        if plan is not None:
            return self._run_simd_vmap(f, arg_vals, total_work, *plan)
        return self._run_simd_scan(f, arg_vals, total_work)

    def _simd_vmap_plan(self, f: ir.FunctionDef, total_work: int):
        """Classify each shared (Out / Array) arg of a ``@simd`` body:

        * ``slot``: every access (read, write, atomic_add target, mutable
          call arg) is rooted at ``name[thread_id()]`` — threads touch
          disjoint slots;
        * ``accum``: appears ONLY as an ``atomic_add`` target (any index)
          and is never read — commutative accumulation;
        * read-only: never written (any index is fine);
        * anything else (bare mentions, non-thread-indexed writes, reads
          of an accumulator, whole-value Out assigns) is order-dependent.

        Returns ``(slotted, accums)`` frozensets when vmap is sound, else
        None (scan fallback).
        """
        shared = {
            a.id for a in f.args
            if a.is_out or isinstance(a.t, ir.Array)
        }
        if not shared:
            return frozenset(), frozenset()
        uses: Dict[str, set] = {name: set() for name in shared}

        # locals provably == thread_id(): every write to the name (Declare
        # or Assign) stores thread_id() or another such alias (fixpoint;
        # e.g. ``i : int = thread_id()`` then indexing with ``i``)
        writes: Dict[str, list] = {}

        _non_tid = ir.BinaryOp()  # sentinel: disqualifies an alias

        def note_call_mutations(e):
            """Locals bound to a user callee's Out/Array params are written
            via copy-out — record a non-tid write for them."""
            if isinstance(e, ir.Call):
                callee = self.funcs.get(e.id)
                prim = callee if isinstance(callee, ir.FunctionDef) else (
                    self.funcs.get(callee.primal_func)
                    if isinstance(callee, ir.ForwardDiff) else None
                )
                for i, a in enumerate(e.args):
                    note_call_mutations(a)
                    if (prim is not None and i < len(prim.args)
                            and isinstance(a, ir.Var)):
                        ad = prim.args[i]
                        if ad.is_out or isinstance(ad.t, ir.Array):
                            writes.setdefault(a.id, []).append(_non_tid)
            elif isinstance(e, ir.BinaryOp):
                note_call_mutations(e.left)
                note_call_mutations(e.right)
            elif isinstance(e, ir.UnaryOp):
                note_call_mutations(e.operand)
            elif isinstance(e, ir.ArrayAccess):
                note_call_mutations(e.array)
                note_call_mutations(e.index)
            elif isinstance(e, ir.StructAccess):
                note_call_mutations(e.struct)

        def collect_writes(stmts):
            for s in stmts:
                if isinstance(s, ir.Declare):
                    writes.setdefault(s.target, []).append(s.val)
                    note_call_mutations(s.val)
                elif isinstance(s, ir.Assign):
                    if isinstance(s.target, ir.Var):
                        writes.setdefault(s.target.id, []).append(s.val)
                    note_call_mutations(s.val)
                elif isinstance(s, ir.Return):
                    note_call_mutations(s.val)
                elif isinstance(s, ir.IfElse):
                    note_call_mutations(s.cond)
                    collect_writes(s.then_stmts)
                    collect_writes(s.else_stmts)
                elif isinstance(s, ir.While):
                    note_call_mutations(s.cond)
                    collect_writes(s.body)
                elif isinstance(s, ir.CallStmt):
                    note_call_mutations(s.call)

        collect_writes(f.body)
        tid_aliases = {
            n for n, vs in writes.items()
            if n not in shared and all(v is not None for v in vs)
        }
        changed = True
        while changed:
            changed = False
            for n in list(tid_aliases):
                ok = all(
                    (isinstance(v, ir.Call) and v.id == "thread_id")
                    or (isinstance(v, ir.Var) and v.id in tid_aliases)
                    for v in writes[n]
                )
                if not ok:
                    tid_aliases.discard(n)
                    changed = True

        def is_tid(e):
            return (isinstance(e, ir.Call) and e.id == "thread_id") or (
                isinstance(e, ir.Var) and e.id in tid_aliases
            )

        def chain_root(e):
            """(root var name, innermost index expr or None) of an access
            chain; (None, None) if the chain isn't rooted at a Var."""
            idx = None
            while True:
                if isinstance(e, ir.ArrayAccess):
                    idx, e = e.index, e.array
                elif isinstance(e, ir.StructAccess):
                    idx, e = None, e.struct
                elif isinstance(e, ir.Var):
                    return e.id, idx
                else:
                    return None, None

        def walk_chain_indices(e):
            while isinstance(e, (ir.ArrayAccess, ir.StructAccess)):
                if isinstance(e, ir.ArrayAccess):
                    walk_expr(e.index)
                    e = e.array
                else:
                    e = e.struct

        def walk_expr(e):
            if e is None or isinstance(e, (ir.ConstInt, ir.ConstFloat)):
                return
            if isinstance(e, ir.Var):
                if e.id in shared:
                    uses[e.id].add("bad")  # bare mention
                return
            if isinstance(e, (ir.ArrayAccess, ir.StructAccess)):
                root, idx = chain_root(e)
                if root in shared:
                    uses[root].add(
                        "slot_read" if (idx is not None and is_tid(idx))
                        else "read"
                    )
                walk_chain_indices(e)
                return
            if isinstance(e, ir.UnaryOp):
                walk_expr(e.operand)
                return
            if isinstance(e, ir.BinaryOp):
                walk_expr(e.left)
                walk_expr(e.right)
                return
            if isinstance(e, ir.Call):
                callee = self.funcs.get(e.id)
                prim = None
                if isinstance(callee, ir.FunctionDef):
                    prim = callee
                elif isinstance(callee, ir.ForwardDiff):
                    prim = self.funcs.get(callee.primal_func)
                for i, a in enumerate(e.args):
                    walk_expr(a)
                    if prim is not None and i < len(prim.args):
                        ad = prim.args[i]
                        if ad.is_out or isinstance(ad.t, ir.Array):
                            # copy-out writes back through this arg expr
                            root, idx = chain_root(a) if isinstance(
                                a, (ir.ArrayAccess, ir.StructAccess)
                            ) else (None, None)
                            if isinstance(a, ir.Var) and a.id in shared:
                                pass  # already "bad" from walk_expr
                            elif root in shared:
                                # copy-out writes back through this arg
                                uses[root].add(
                                    "slot_write"
                                    if (idx is not None and is_tid(idx))
                                    else "bad"
                                )
                return
            return

        def walk_lvalue(t):
            if isinstance(t, ir.Var):
                if t.id in shared:
                    uses[t.id].add("bad")  # whole-value overwrite
                return
            root, idx = chain_root(t)
            if root in shared:
                uses[root].add(
                    "slot_write" if (idx is not None and is_tid(idx))
                    else "bad"
                )
            walk_chain_indices(t)

        def walk_stmt(s):
            if isinstance(s, ir.Declare):
                walk_expr(s.val)
            elif isinstance(s, ir.Assign):
                walk_lvalue(s.target)
                walk_expr(s.val)
            elif isinstance(s, ir.Return):
                walk_expr(s.val)
            elif isinstance(s, ir.IfElse):
                walk_expr(s.cond)
                for b in s.then_stmts:
                    walk_stmt(b)
                for b in s.else_stmts:
                    walk_stmt(b)
            elif isinstance(s, ir.While):
                walk_expr(s.cond)
                for b in s.body:
                    walk_stmt(b)
            elif isinstance(s, ir.CallStmt):
                c = s.call
                if c.id == "atomic_add":
                    t = c.args[0]
                    if isinstance(t, ir.Var):
                        if t.id in shared:
                            uses[t.id].add("accum")
                    else:
                        root, idx = chain_root(t)
                        if root in shared:
                            uses[root].add(
                                "slot_write"
                                if (idx is not None and is_tid(idx))
                                else "accum"
                            )
                        walk_chain_indices(t)
                    walk_expr(c.args[1])
                else:
                    walk_expr(c)

        for s in f.body:
            walk_stmt(s)

        slotted, accums = set(), set()
        for name, kinds in uses.items():
            if not kinds or kinds <= {"read", "slot_read"}:
                # untouched / read-only (including reads at [thread_id()]):
                # stays SHARED — per-thread [tid] reads are plain gathers
                # under vmap, so slotting (and the O(total_work) identity
                # scatter-back it implies) would be pure overhead
                continue
            if kinds <= {"slot_write", "slot_read"}:
                slotted.add(name)
            elif kinds == {"accum"}:
                accums.add(name)
            else:
                return None  # order-dependent (incl. slot+read mixes)
        # (the accumulator-size memory guard runs in run_simd, where the
        # runtime values are available — unsized Array accumulators carry
        # no static size here)
        return frozenset(slotted), frozenset(accums)

    def _run_simd_vmap(self, f: ir.FunctionDef, arg_vals: List[Any],
                       total_work: int, slotted: frozenset,
                       accums: frozenset) -> Dict[str, Any]:
        env_shared = {a.id: v for a, v in zip(f.args, arg_vals)}
        tids = jnp.arange(total_work, dtype=jnp.int32)
        prev = self._slotted
        self._slotted = slotted
        try:
            def per_thread(tid):
                env = {}
                for a in f.args:
                    v = env_shared[a.id]
                    if a.id in slotted:
                        env[a.id] = jax.tree.map(lambda x: x[tid], v)
                    elif a.id in accums:
                        env[a.id] = jax.tree.map(jnp.zeros_like, v)
                    else:
                        env[a.id] = v
                env["__thread_id__"] = tid
                env = self.exec_stmts(f.body, env)
                return ({k: env[k] for k in slotted},
                        {k: env[k] for k in accums})

            slots_out, contribs = jax.vmap(per_thread)(tids)
        finally:
            self._slotted = prev
        out = {}
        for a in f.args:
            if not (a.is_out or isinstance(a.t, ir.Array)):
                continue
            v = env_shared[a.id]
            if a.id in slotted:
                out[a.id] = jax.tree.map(
                    lambda orig, sl: orig.at[tids].set(sl),
                    v, slots_out[a.id],
                )
            elif a.id in accums:
                out[a.id] = jax.tree.map(
                    lambda orig, c: orig + c.sum(axis=0),
                    v, contribs[a.id],
                )
            else:
                out[a.id] = v
        return out

    def _run_simd_scan(self, f: ir.FunctionDef, arg_vals: List[Any],
                       total_work: int) -> Dict[str, Any]:
        """Fallback: scan over thread ids with the shared buffers in the
        carry (deterministic sequential threads — the semantics of bodies
        with order-dependent shared effects)."""
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
