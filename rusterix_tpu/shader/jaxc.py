"""rusteria -> JAX compiler.

The reference compiles shader source to stack bytecode interpreted per pixel
(rusteria/src/compile.rs -> node/execution.rs). TPU-native design: we trace
the AST directly into jnp operations over the whole pixel grid — the shader
becomes part of the jitted frame program and XLA fuses it with sampling and
lighting. Control flow vectorizes with active-lane masks (if/return) and
static unrolling (for loops with literal trip counts).

Value model (reference rusteria/src/lib.rs:17 `Value = Vec3<f32>`): every
value is an array shaped (..., 3); scalars are broadcast. A static `width`
tag (1/2/3) mirrors the reference compiler's type inference that selects
Dot2/Dot3/Length2/... variants. Comparison/logical results use the .x lane
(execution.rs:512-560).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

import jax.numpy as jnp

from ..lang import ast as A
from ..lang.parser import ParseError, parse
from .patterns import PATTERN_NAMES, pattern_bank, sample_pattern_jnp

REGISTER_WIDTHS = {
    "uv": 2,
    "color": 3,
    "roughness": 1,
    "metallic": 1,
    "emissive": 3,
    "opacity": 1,
    "bump": 1,
    "normal": 3,
    "hitpoint": 3,
    "time": 3,
}

MAX_RECURSION = 24
MAX_DYNAMIC_ITERS = 64


class CompileError(Exception):
    pass


@dataclass
class Val:
    arr: object  # jnp array (..., 3)
    width: int = 1

    @property
    def x(self):
        return self.arr[..., 0]


def _broadcast(x) -> Val:
    a = jnp.asarray(x, jnp.float32)
    return Val(jnp.stack([a, a, a], axis=-1), 1)


def _mask_of(v: Val):
    return v.arr[..., 0] != 0.0


class Evaluator:
    """AST tracer. One instance per shade/run invocation."""

    def __init__(self, program: "Program", state: Dict, palette=None, host=None):
        self.program = program
        self.state = state  # registers: name -> jnp (..., 3)
        self.palette = palette
        self.host = host  # optional host-call handler (unused for shaders)
        self.scopes: List[Dict[str, Val]] = [{}]  # globals at [0]
        self.active = None  # None = all lanes live, else bool array
        self.depth = 0
        self.last_value: Optional[Val] = None
        #: host-mode texture script state (alloc/iterate/save,
        #: execution.rs:656-741); only touched by Rusteria.execute_script
        self.textures: List[np.ndarray] = []
        self.saved: Dict[str, np.ndarray] = {}
        self.save_dir: Optional[str] = None

    # ---- env ----

    def lookup(self, name: str) -> Optional[Val]:
        for scope in reversed(self.scopes):
            if name in scope:
                return scope[name]
        if name in self.state:
            return Val(self.state[name], REGISTER_WIDTHS.get(name, 3))
        return None

    def assign_name(self, name: str, val: Val):
        for scope in reversed(self.scopes):
            if name in scope:
                old = scope[name]
                scope[name] = self._merge(old, val)
                return
        if name in self.state:
            merged = self._merge(Val(self.state[name], val.width), val)
            self.state[name] = merged.arr
            return
        # implicit creation in current scope
        self.scopes[-1][name] = val

    def _merge(self, old: Val, new: Val) -> Val:
        if self.active is None or self.active is True:
            return new
        if self.active is False:
            return old
        m = self.active[..., None]
        return Val(jnp.where(m, new.arr, old.arr), new.width)

    # ---- statements ----

    def exec_block(self, stmts, new_scope: bool = True):
        if new_scope:
            self.scopes.append({})
        try:
            for s in stmts:
                self.exec_stmt(s)
        finally:
            if new_scope:
                self.scopes.pop()

    def exec_stmt(self, s):
        if self.active is False:
            return  # all lanes returned — dead code
        if isinstance(s, A.Let):
            self.scopes[-1][s.name] = self.eval(s.value)
        elif isinstance(s, A.Assign):
            self.exec_assign(s)
        elif isinstance(s, A.ExprStmt):
            self.last_value = self.eval(s.expr)
        elif isinstance(s, A.If):
            self.exec_if(s)
        elif isinstance(s, A.For):
            self.exec_for(s)
        elif isinstance(s, A.While):
            self.exec_while(s)
        elif isinstance(s, A.Return):
            v = self.eval(s.value) if s.value is not None else _broadcast(0.0)
            if self.active is None or self.active is True:
                self.ret_val = v
                self.ret_mask = True
                self.active = False
            elif self.active is False:
                pass  # dead code after a full return
            else:
                if self.ret_val is None:
                    self.ret_val = v
                    self.ret_mask = self.active
                else:
                    self.ret_val = Val(
                        jnp.where(self.active[..., None], v.arr, self.ret_val.arr),
                        max(v.width, self.ret_val.width),
                    )
                    self.ret_mask = jnp.logical_or(self.ret_mask, self.active)
                self.active = self.active & False
        elif isinstance(s, A.Match):
            self.exec_match(s)
        elif isinstance(s, A.FnDef):
            pass  # functions collected at program build
        elif isinstance(s, A.Break):
            raise CompileError("break is not supported in vectorized shaders")
        else:
            raise CompileError(f"unsupported statement {type(s).__name__}")

    def exec_assign(self, s: A.Assign):
        new = self.eval(s.value)
        if isinstance(s.target, A.Ident):
            name = s.target.name
            if s.op != "=":
                cur = self.lookup(name)
                if cur is None:
                    raise CompileError(f"unknown variable {name}")
                new = self._binop(s.op[0], cur, new)
            else:
                cur = self.lookup(name)
                if cur is not None:
                    new = Val(new.arr, new.width)
            self.assign_name(name, new)
        elif isinstance(s.target, A.Swizzle) and isinstance(s.target.base, A.Ident):
            name = s.target.base.name
            cur = self.lookup(name)
            if cur is None:
                raise CompileError(f"unknown variable {name}")
            comps = s.target.components
            if s.op != "=":
                cur_sub = self._swizzle(cur, comps)
                new = self._binop(s.op[0], cur_sub, new)
            # SetComponents semantics (execution.rs:158-182); the target may
            # need promotion from uniform to per-pixel shape first
            arr = cur.arr
            shape = jnp.broadcast_shapes(arr.shape, new.arr.shape)
            arr = jnp.broadcast_to(arr, shape)
            for i, ci in enumerate(comps):
                src = jnp.broadcast_to(new.arr[..., min(i, 2)], shape[:-1])
                arr = arr.at[..., ci].set(src)
            out = Val(arr, cur.width)
            self.assign_name(name, out)
        else:
            raise CompileError("unsupported assignment target")

    def _concrete_bool(self, m):
        """bool(m) when m is a concrete uniform scalar (not traced), else None.

        Lets recursive functions (fib) terminate when run on concrete values
        outside jit — the taken branch alone executes, like the reference's
        scalar interpreter."""
        import jax

        if isinstance(m, jax.core.Tracer):
            return None
        try:
            if getattr(m, "size", None) == 1:
                return bool(m.reshape(()))
        except Exception:
            return None
        return None

    def exec_if(self, s: A.If):
        cond = _mask_of(self.eval(s.cond))
        if self.active is None or self.active is True:
            cb = self._concrete_bool(cond)
            if cb is not None:
                if cb:
                    self.exec_block(s.then)
                elif s.other is not None:
                    self.exec_block(s.other)
                return
        saved = self.active
        self.active = cond if saved is None else saved & cond
        self.exec_block(s.then)
        self.active = (~cond) if saved is None else saved & (~cond)
        if s.other is not None:
            self.exec_block(s.other)
        self.active = saved

    def exec_match(self, s: A.Match):
        """match with string/num patterns -> chained if/else on equality."""
        subject = self.eval(s.subject)
        saved = self.active
        taken = None
        for pattern, body in s.arms:
            if pattern is None:
                cond = jnp.ones((), bool) if taken is None else ~taken
                m = cond
            else:
                pv = self.eval(pattern)
                m = subject.arr[..., 0] == pv.arr[..., 0]
                if taken is not None:
                    m = m & ~taken
            taken = m if taken is None else (taken | m)
            self.active = m if saved is None else saved & m
            self.exec_block(body)
        self.active = saved

    def _static_float(self, expr, env: Dict[str, float]) -> Optional[float]:
        """Best-effort constant fold for loop bounds."""
        if isinstance(expr, A.Num):
            return expr.value
        if isinstance(expr, A.Ident) and expr.name in env:
            return env[expr.name]
        if isinstance(expr, A.Unary) and expr.op == "-":
            v = self._static_float(expr.operand, env)
            return None if v is None else -v
        if isinstance(expr, A.Binary):
            a = self._static_float(expr.left, env)
            b = self._static_float(expr.right, env)
            if a is None or b is None:
                return None
            return {
                "+": lambda: a + b,
                "-": lambda: a - b,
                "*": lambda: a * b,
                "/": lambda: a / b if b != 0 else None,
                "%": lambda: a - b * np.floor(a / b) if b != 0 else None,
                "<": lambda: float(a < b),
                "<=": lambda: float(a <= b),
                ">": lambda: float(a > b),
                ">=": lambda: float(a >= b),
                "==": lambda: float(a == b),
                "!=": lambda: float(a != b),
            }.get(expr.op, lambda: None)()
        return None

    def exec_for(self, s: A.For):
        # try static unroll: `for (let i = C0; i < C1; i += C2)`
        static_env: Dict[str, float] = {}
        loop_var = None
        if len(s.init) == 1 and isinstance(s.init[0], A.Let):
            c0 = self._static_float(s.init[0].value, {})
            if c0 is not None:
                loop_var = s.init[0].name
                static_env[loop_var] = c0

        if loop_var is not None:
            iters = []
            guard = 0
            env = dict(static_env)
            while True:
                c = self._static_float(s.cond, env)
                if c is None:
                    loop_var = None
                    break
                if c == 0.0:
                    break
                iters.append(env[loop_var])
                # apply increment statically
                ok = False
                if len(s.incr) == 1 and isinstance(s.incr[0], A.Assign):
                    inc = s.incr[0]
                    if isinstance(inc.target, A.Ident) and inc.target.name == loop_var:
                        delta = self._static_float(inc.value, env)
                        if delta is not None:
                            if inc.op == "+=":
                                env[loop_var] += delta
                                ok = True
                            elif inc.op == "-=":
                                env[loop_var] -= delta
                                ok = True
                            elif inc.op == "=":
                                env[loop_var] = delta
                                ok = True
                            elif inc.op == "*=":
                                env[loop_var] *= delta
                                ok = True
                if not ok:
                    loop_var = None
                    break
                guard += 1
                if guard > 65536:
                    raise CompileError("for loop exceeds unroll limit")
            if loop_var is not None:
                self.scopes.append({})
                try:
                    for it in iters:
                        self.scopes[-1][loop_var] = _broadcast(it)
                        self.exec_block(s.body)
                finally:
                    self.scopes.pop()
                return

        # dynamic fallback: fixed-cap masked iterations
        self.scopes.append({})
        try:
            self.exec_block(s.init, new_scope=False)
            saved = self.active
            for _ in range(MAX_DYNAMIC_ITERS):
                cond = _mask_of(self.eval(s.cond))
                self.active = cond if saved is None else saved & cond
                self.exec_block(s.body)
                self.exec_block(s.incr, new_scope=False)
            self.active = saved
        finally:
            self.scopes.pop()

    def exec_while(self, s: A.While):
        saved = self.active
        for _ in range(MAX_DYNAMIC_ITERS):
            cond = _mask_of(self.eval(s.cond))
            self.active = cond if saved is None else saved & cond
            self.exec_block(s.body)
        self.active = saved

    # ---- expressions ----

    def eval(self, e) -> Val:
        if isinstance(e, A.Num):
            return _broadcast(e.value)
        if isinstance(e, A.Str):
            raise CompileError("strings are host-VM only (entity scripts)")
        if isinstance(e, A.Ident):
            v = self.lookup(e.name)
            if v is None:
                raise CompileError(f"unknown identifier {e.name}")
            return v
        if isinstance(e, A.Swizzle):
            return self._swizzle(self.eval(e.base), e.components)
        if isinstance(e, A.Unary):
            v = self.eval(e.operand)
            if e.op == "-":
                return Val(-v.arr, v.width)
            return Val(
                jnp.where((v.arr[..., 0] == 0.0)[..., None], _broadcast(1.0).arr, _broadcast(0.0).arr),
                1,
            )
        if isinstance(e, A.Binary):
            return self._binop(e.op, self.eval(e.left), self.eval(e.right))
        if isinstance(e, A.Ternary):
            c = _mask_of(self.eval(e.cond))
            a = self.eval(e.then)
            b = self.eval(e.other)
            return Val(jnp.where(c[..., None], a.arr, b.arr), max(a.width, b.width))
        if isinstance(e, A.Call):
            return self.call(e)
        raise CompileError(f"unsupported expression {type(e).__name__}")

    def _swizzle(self, v: Val, comps) -> Val:
        """GetComponents (execution.rs:134-157): 1 comp -> broadcast."""
        if len(comps) == 1:
            c = v.arr[..., comps[0]]
            return Val(jnp.stack([c, c, c], axis=-1), 1)
        parts = [v.arr[..., c] for c in comps]
        while len(parts) < 3:
            parts.append(jnp.zeros_like(parts[0]))
        return Val(jnp.stack(parts[:3], axis=-1), len(comps))

    def _binop(self, op, a: Val, b: Val) -> Val:
        w = max(a.width, b.width)
        x, y = a.arr, b.arr
        if op == "+":
            return Val(x + y, w)
        if op == "-":
            return Val(x - y, w)
        if op == "*":
            return Val(x * y, w)
        if op == "/":
            return Val(x / y, w)
        if op == "%":
            # GLSL mod (execution.rs:423-430)
            return Val(x - y * jnp.floor(x / y), w)
        ax, bx = x[..., 0], y[..., 0]
        if op == "==":
            m = ax == bx
        elif op == "!=":
            m = ax != bx
        elif op == "<":
            m = ax < bx
        elif op == "<=":
            m = ax <= bx
        elif op == ">":
            m = ax > bx
        elif op == ">=":
            m = ax >= bx
        elif op == "&&":
            m = (ax != 0.0) & (bx != 0.0)
        elif op == "||":
            m = (ax != 0.0) | (bx != 0.0)
        else:
            raise CompileError(f"unknown operator {op}")
        f = m.astype(jnp.float32)
        return Val(jnp.stack([f, f, f], axis=-1), 1)

    # ---- calls ----

    def call(self, e: A.Call) -> Val:
        name = e.name
        fns = self.program.functions
        if name in fns:
            return self.call_user(fns[name], [self.eval(a) for a in e.args])
        builtin = getattr(self, f"_b_{name}", None)
        if builtin is not None:
            # string args (pattern names, format strings) stay AST-side;
            # builtins read them from e.args
            vals = [
                None if isinstance(a, A.Str) else self.eval(a) for a in e.args
            ]
            return builtin(vals, e)
        if self.host is not None:
            return self.host(name, e.args, self)
        raise CompileError(f"unknown function {name}")

    def call_user(self, fn: A.FnDef, args: List[Val]) -> Val:
        if self.depth >= MAX_RECURSION:
            raise CompileError(
                f"recursion in {fn.name} exceeds shader inline depth "
                f"{MAX_RECURSION} (use the host VM for recursive scripts)"
            )
        self.depth += 1
        saved_scopes = self.scopes
        saved_ret = getattr(self, "ret_val", None), getattr(self, "ret_mask", None)
        saved_active = self.active
        self.scopes = [self.scopes[0], {}]  # globals + fresh frame
        for p, v in zip(fn.params, args):
            self.scopes[-1][p] = v
        self.ret_val = None
        self.ret_mask = None
        saved_last = self.last_value
        self.last_value = None
        try:
            self.exec_block(fn.body, new_scope=False)
            if self.ret_val is not None:
                if self.ret_mask is True or self.ret_mask is None:
                    result = self.ret_val
                else:
                    base = self.last_value if self.last_value is not None else _broadcast(0.0)
                    result = Val(
                        jnp.where(
                            self.ret_mask[..., None] if hasattr(self.ret_mask, "shape") else self.ret_mask,
                            self.ret_val.arr,
                            base.arr,
                        ),
                        self.ret_val.width,
                    )
            elif self.last_value is not None:
                result = self.last_value
            else:
                result = _broadcast(0.0)
        finally:
            self.scopes = saved_scopes
            self.ret_val, self.ret_mask = saved_ret
            self.active = saved_active
            self.last_value = saved_last
            self.depth -= 1
        return result

    # ---- builtins (NodeOp intrinsics, execution.rs:330-770) ----

    def _cw(self, fn, args, width=None):
        a = args[0]
        return Val(fn(a.arr), width if width is not None else a.width)

    def _b_abs(self, a, e):
        return self._cw(jnp.abs, a)

    def _b_sin(self, a, e):
        return self._cw(jnp.sin, a)

    def _b_cos(self, a, e):
        return self._cw(jnp.cos, a)

    def _b_tan(self, a, e):
        return self._cw(jnp.tan, a)

    def _b_atan(self, a, e):
        if len(a) == 2:
            return Val(jnp.arctan2(a[0].arr, a[1].arr), max(a[0].width, a[1].width))
        return self._cw(jnp.arctan, a)

    def _b_atan2(self, a, e):
        return Val(jnp.arctan2(a[0].arr, a[1].arr), max(a[0].width, a[1].width))

    def _b_floor(self, a, e):
        return self._cw(jnp.floor, a)

    def _b_ceil(self, a, e):
        return self._cw(jnp.ceil, a)

    def _b_round(self, a, e):
        # Rust round: half away from zero
        return self._cw(lambda x: jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5), a)

    def _b_fract(self, a, e):
        return self._cw(lambda x: x - jnp.floor(x), a)

    def _b_sqrt(self, a, e):
        return self._cw(jnp.sqrt, a)

    def _b_log(self, a, e):
        return self._cw(jnp.log, a)

    def _b_degrees(self, a, e):
        return self._cw(jnp.degrees, a)

    def _b_radians(self, a, e):
        return self._cw(jnp.radians, a)

    def _b_mod(self, a, e):
        x, y = a[0].arr, a[1].arr
        return Val(x - y * jnp.floor(x / y), max(a[0].width, a[1].width))

    def _b_min(self, a, e):
        return Val(jnp.minimum(a[0].arr, a[1].arr), max(a[0].width, a[1].width))

    def _b_max(self, a, e):
        return Val(jnp.maximum(a[0].arr, a[1].arr), max(a[0].width, a[1].width))

    def _b_pow(self, a, e):
        return Val(
            jnp.power(a[0].arr, a[1].arr), max(a[0].width, a[1].width)
        )

    def _b_mix(self, a, e):
        x, y, t = a
        return Val(x.arr + (y.arr - x.arr) * t.arr, max(x.width, y.width))

    def _b_clamp(self, a, e):
        return Val(jnp.clip(a[0].arr, a[1].arr, a[2].arr), a[0].width)

    def _b_step(self, a, e):
        edge, x = a
        return Val((x.arr >= edge.arr).astype(jnp.float32), max(edge.width, x.width))

    def _b_smoothstep(self, a, e):
        # scalar semantics on .x (execution.rs:458-476)
        e0, e1, x = a[0].x, a[1].x, a[2].x
        denom = e1 - e0
        t = jnp.where(denom != 0.0, (x - e0) / jnp.where(denom != 0.0, denom, 1.0), 0.0)
        t = jnp.clip(t, 0.0, 1.0)
        s = t * t * (3.0 - 2.0 * t)
        return Val(jnp.stack([s, s, s], axis=-1), 1)

    def _b_length(self, a, e):
        v = a[0]
        comps = [v.arr[..., i] for i in range(max(v.width, 1))]
        s = sum(c * c for c in comps)
        r = jnp.sqrt(s)
        return Val(jnp.stack([r, r, r], axis=-1), 1)

    def _b_dot(self, a, e):
        x, y = a
        w = max(x.width, y.width)
        s = sum(x.arr[..., i] * y.arr[..., i] for i in range(w))
        return Val(jnp.stack([s, s, s], axis=-1), 1)

    # arity-suffixed variants (rusteria nodeop.rs Sin1/Sin2/Cos1/Cos2/
    # Length2/Length3/Dot2/Dot3): read exactly N lanes, scalar/vec2 result
    def _b_length2(self, a, e):
        v = a[0].arr
        r = jnp.sqrt(v[..., 0] ** 2 + v[..., 1] ** 2)
        return Val(jnp.stack([r, r, r], axis=-1), 1)

    def _b_length3(self, a, e):
        v = a[0].arr
        r = jnp.sqrt(v[..., 0] ** 2 + v[..., 1] ** 2 + v[..., 2] ** 2)
        return Val(jnp.stack([r, r, r], axis=-1), 1)

    def _b_dot2(self, a, e):
        x, y = a[0].arr, a[1].arr
        s = x[..., 0] * y[..., 0] + x[..., 1] * y[..., 1]
        return Val(jnp.stack([s, s, s], axis=-1), 1)

    def _b_dot3(self, a, e):
        x, y = a[0].arr, a[1].arr
        s = (
            x[..., 0] * y[..., 0]
            + x[..., 1] * y[..., 1]
            + x[..., 2] * y[..., 2]
        )
        return Val(jnp.stack([s, s, s], axis=-1), 1)

    def _b_sin1(self, a, e):
        r = jnp.sin(a[0].arr[..., 0])
        z = jnp.zeros_like(r)
        return Val(jnp.stack([r, z, z], axis=-1), 1)

    def _b_sin2(self, a, e):
        v = a[0].arr
        z = jnp.zeros_like(v[..., 0])
        return Val(
            jnp.stack([jnp.sin(v[..., 0]), jnp.sin(v[..., 1]), z], axis=-1), 2
        )

    def _b_cos1(self, a, e):
        r = jnp.cos(a[0].arr[..., 0])
        z = jnp.zeros_like(r)
        return Val(jnp.stack([r, z, z], axis=-1), 1)

    def _b_cos2(self, a, e):
        v = a[0].arr
        z = jnp.zeros_like(v[..., 0])
        return Val(
            jnp.stack([jnp.cos(v[..., 0]), jnp.cos(v[..., 1]), z], axis=-1), 2
        )

    def _b_cross(self, a, e):
        x, y = a[0].arr, a[1].arr
        return Val(jnp.cross(x, y), 3)

    def _b_normalize(self, a, e):
        v = a[0]
        comps = [v.arr[..., i] for i in range(max(v.width, 1))]
        s = jnp.sqrt(sum(c * c for c in comps))
        s = jnp.maximum(s, 1e-30)
        out = v.arr / s[..., None]
        if v.width < 3:
            # zero out unused lanes to keep vec2 semantics
            keep = jnp.array([1.0] * v.width + [0.0] * (3 - v.width), jnp.float32)
            out = out * keep
        return Val(out, v.width)

    def _b_rotate2d(self, a, e):
        """Rotate2D (rotate .xy by angle.x)."""
        p, ang = a[0].arr, a[1].x
        ca, sa = jnp.cos(ang), jnp.sin(ang)
        x = p[..., 0] * ca - p[..., 1] * sa
        y = p[..., 0] * sa + p[..., 1] * ca
        return Val(jnp.stack([x, y, jnp.zeros_like(x)], axis=-1), 2)

    def _vec_ctor(self, args, n):
        comps = []
        for v in args:
            take = 1 if len(args) > 1 else v.width
            if len(args) == 1 and v.width == 1:
                # broadcast single scalar
                comps = [v.arr[..., 0]] * n
                break
            for i in range(min(take, 3)):
                comps.append(v.arr[..., i])
        while len(comps) < 3:
            comps.append(jnp.zeros_like(comps[0]))
        comps = jnp.broadcast_arrays(*comps[:3])
        return Val(jnp.stack(comps, axis=-1), n)

    def _b_vec2(self, a, e):
        return self._vec_ctor(a, 2)

    def _b_vec3(self, a, e):
        return self._vec_ctor(a, 3)

    def _b_sample(self, a, e):
        if len(e.args) < 2 or not isinstance(e.args[1], A.Str):
            raise CompileError('sample(uv, "pattern") needs a pattern name')
        pat = e.args[1].value.lower()
        if pat not in PATTERN_NAMES:
            return _broadcast(0.0)
        bank = self.program.pattern_bank_dev()
        uv = a[0]
        s = sample_pattern_jnp(bank, PATTERN_NAMES[pat], uv.arr[..., 0], uv.arr[..., 1])
        return Val(jnp.stack([s, s, s], axis=-1), 3)

    def _b_sample_normal(self, a, e):
        z = jnp.zeros_like(a[0].arr[..., 0])
        return Val(jnp.stack([z, z, z + 1.0], axis=-1), 3)

    def _b_palette(self, a, e):
        if self.palette is None:
            return _broadcast(0.0)
        idx = jnp.clip(a[0].x.astype(jnp.int32), 0, len(self.palette) - 1)
        pal = jnp.asarray(self.palette)
        return Val(jnp.take(pal, idx, axis=0), 3)

    def _b_print(self, a, e):
        return _broadcast(0.0)

    # ---- host-mode texture builtins (execution.rs:656-741) ----
    #
    # These run at the top level of a texture script (make_textures.rusteria)
    # OUTSIDE any jit trace: indices and sizes are concrete Python ints. The
    # reference's rayon per-pixel iterate loop becomes one jitted whole-grid
    # trace on the bake device (CPU — see _bake_device).

    def _concrete_scalar(self, v: Val) -> float:
        return float(np.asarray(v.arr).reshape(-1)[0])

    def _b_alloc(self, a, e):
        """alloc(w, h) -> texture index (execution.rs:656-663)."""
        w = int(self._concrete_scalar(a[0]))
        h = int(self._concrete_scalar(a[1]))
        idx = len(self.textures)
        self.textures.append(np.zeros((h, w, 3), np.float32))
        return _broadcast(float(idx))

    def _b_iterate(self, a, e):
        """iterate(tex, "fn") — evaluate fn over every texel
        (execution.rs:664-715): per-pixel uv, registers carried from the
        current context; result is the fn's explicit return value, else the
        color register after the call."""
        if len(e.args) != 2 or not isinstance(e.args[1], A.Str):
            raise CompileError('iterate(tex, "fn_name") expects a string literal')
        fname = e.args[1].value
        fn = self.program.functions.get(fname)
        if fn is None:
            raise CompileError(f"iterate: unknown function {fname}")
        idx = int(self._concrete_scalar(a[0]))
        tex = self.textures[idx]
        h, w = tex.shape[:2]
        carried = {
            k: np.asarray(v, np.float32).reshape(-1, 3)[0]
            for k, v in self.state.items()
            if k != "uv"
        }
        globals_snapshot = dict(self.scopes[0])
        program, palette = self.program, self.palette
        has_return = program._scan(
            fn.body, lambda n: isinstance(n, A.Return) and n.value is not None
        )
        import jax

        @jax.jit
        def run():
            u = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
            v = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
            uu, vv = jnp.meshgrid(u, v)
            state = {"uv": jnp.stack([uu, vv, jnp.zeros_like(uu)], axis=-1)}
            for k, c in carried.items():
                state[k] = jnp.broadcast_to(jnp.asarray(c), (h, w, 3))
            ev = Evaluator(program, state, palette)
            ev.scopes[0].update(globals_snapshot)
            res = ev.call_user(fn, [])
            out = res.arr if has_return else ev.state["color"]
            return jnp.broadcast_to(out, (h, w, 3))

        self.textures[idx] = np.asarray(_run_on_bake_device(run))
        return _broadcast(float(idx))

    def _b_save(self, a, e):
        """save(tex, "path.png") — store texture + derived normal map
        (execution.rs:716-741). Script paths are relative to the reference
        repo layout; results land in self.saved by stem, and file IO only
        happens when save_dir is set (basenames, never the script's dirs)."""
        import os

        if len(e.args) != 2 or not isinstance(e.args[1], A.Str):
            raise CompileError('save(tex, "path.png") expects a string literal')
        idx = int(self._concrete_scalar(a[0]))
        tex = self.textures[idx]
        normal = texture_to_normal_map(tex, 5.0)
        path = e.args[1].value
        stem, ext = os.path.splitext(os.path.basename(path))
        ext = ext or ".png"
        self.saved[stem] = tex
        self.saved[stem + "_normal"] = normal
        if self.save_dir is not None:
            from PIL import Image

            os.makedirs(self.save_dir, exist_ok=True)
            for name, img in ((stem + ext, tex), (f"{stem}_normal{ext}", normal)):
                u8 = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
                Image.fromarray(u8, "RGB").save(os.path.join(self.save_dir, name))
        return _broadcast(0.0)


def texture_to_normal_map(tex: np.ndarray, strength: float = 5.0) -> np.ndarray:
    """Height-field -> tangent-space normal map, packed to [0,1].

    Vectorized port of TexStorage::to_normal_map (rusteria/src/textures/
    mod.rs): Rec.709 luminance, wrap-around central differences, Z-up."""
    lum = tex[..., 0] * 0.2126 + tex[..., 1] * 0.7152 + tex[..., 2] * 0.0722
    dx = (np.roll(lum, -1, axis=1) - np.roll(lum, 1, axis=1)) * 0.5 * strength
    dy = (np.roll(lum, -1, axis=0) - np.roll(lum, 1, axis=0)) * 0.5 * strength
    n = np.stack([-dx, -dy, np.ones_like(dx)], axis=-1)
    length = np.sqrt((n * n).sum(-1, keepdims=True))
    n = np.where(length > 0, n / length, n)
    return ((n + 1.0) * 0.5).astype(np.float32)


def input_loads(module: A.Module) -> frozenset:
    """Registers whose INCOMING value a program may read.

    Pack-time baking (scene_pack) evaluates shade() over a uv grid with
    DEFAULT register inputs; at runtime the rasterizer supplies real
    per-pixel values for `color` (the texel), `normal` (interpolated),
    `hitpoint` (world position), and — under per-batch materials —
    `roughness`/`metallic`/`opacity`. A shader that reads any of those
    before fully overwriting them bakes silently wrong, so the bake gate
    consults this set (reference analogue: the VM reads registers live per
    pixel, rusteria/src/node/execution.rs:600-660, so it has no such gate).

    Conservative definite-assignment walk: a register counts as loaded
    unless a plain `=` to the bare name dominates the read on every path.
    Swizzle stores and augmented ops read-modify-write; If/Match join by
    intersection; loop bodies and helper functions are analyzed against
    their entry state (registers are global — Evaluator.lookup falls
    through scopes into `state`); `let`/params that shadow a register name
    are ignored (reads after them still flag)."""
    loads: set = set()
    fns = module.functions()

    def expr(e, assigned):
        if isinstance(e, A.Ident):
            if e.name in REGISTER_WIDTHS and e.name not in assigned:
                loads.add(e.name)
        elif isinstance(e, A.Swizzle):
            expr(e.base, assigned)
        elif isinstance(e, A.Unary):
            expr(e.operand, assigned)
        elif isinstance(e, A.Binary):
            expr(e.left, assigned)
            expr(e.right, assigned)
        elif isinstance(e, A.Ternary):
            expr(e.cond, assigned)
            expr(e.then, assigned)
            expr(e.other, assigned)
        elif isinstance(e, A.Call):
            for a in e.args:
                expr(a, assigned)

    def stmt_seq(stmts, assigned, stack):
        assigned = set(assigned)
        for s in stmts:
            if isinstance(s, A.Assign):
                expr(s.value, assigned)
                if isinstance(s.target, A.Ident):
                    name = s.target.name
                    if s.op != "=" and name in REGISTER_WIDTHS:
                        if name not in assigned:
                            loads.add(name)
                    if name in REGISTER_WIDTHS:
                        assigned.add(name)
                elif isinstance(s.target, A.Swizzle) and isinstance(
                    s.target.base, A.Ident
                ):
                    name = s.target.base.name
                    # partial store: unwritten components still leak through
                    if name in REGISTER_WIDTHS and name not in assigned:
                        loads.add(name)
                else:
                    expr(s.target, assigned)
            elif isinstance(s, A.Let):
                expr(s.value, assigned)
            elif isinstance(s, A.ExprStmt):
                expr(s.expr, assigned)
                assigned = call_effects(s.expr, assigned, stack)
            elif isinstance(s, A.If):
                expr(s.cond, assigned)
                a1 = stmt_seq(s.then, assigned, stack)
                a2 = stmt_seq(s.other or [], assigned, stack)
                assigned = a1 & a2
            elif isinstance(s, A.Match):
                expr(s.subject, assigned)
                arms = [stmt_seq(body, assigned, stack) for _p, body in s.arms]
                has_default = any(p is None for p, _b in s.arms)
                joined = set.intersection(*arms) if arms else set(assigned)
                assigned = joined if has_default else (joined & assigned)
            elif isinstance(s, A.For):
                assigned = stmt_seq(s.init, assigned, stack)
                expr(s.cond, assigned)
                stmt_seq(s.body + s.incr, assigned, stack)
            elif isinstance(s, A.While):
                expr(s.cond, assigned)
                stmt_seq(s.body, assigned, stack)
            elif isinstance(s, A.Return):
                if s.value is not None:
                    expr(s.value, assigned)
            elif isinstance(s, A.FnDef):
                pass  # bodies analyzed at call sites
        return assigned

    def call_effects(e, assigned, stack):
        """Helper-function bodies run against the caller's register state;
        their definite assignments persist (registers are global)."""
        if isinstance(e, A.Call) and e.name in fns and e.name not in stack:
            return stmt_seq(fns[e.name].body, assigned, stack | {e.name})
        return assigned

    # expression-position user calls also walk callee bodies for loads —
    # patch expr's Call case through a second pass over the module keeps the
    # code simpler: analyze every function body from the entry points.
    top = [s for s in module.stmts if not isinstance(s, A.FnDef)]
    assigned = stmt_seq(top, set(), frozenset())
    if "shade" in fns:
        stmt_seq(fns["shade"].body, assigned, frozenset({"shade"}))
    # calls nested inside expressions (let x = helper();) bypass
    # call_effects above; cover them by analyzing every OTHER function
    # body against the weakest (empty) assumption — conservative, and only
    # adds loads, never removes
    for name, fn in fns.items():
        if name != "shade":
            stmt_seq(fn.body, set(), frozenset({name}))
    return frozenset(loads)


class Program:
    """Compiled shader: AST + metadata; `shade` traces into the caller's jit."""

    def __init__(self, module: A.Module):
        self.module = module
        self.functions = module.functions()
        self.shade_index = "shade" in self.functions
        #: registers whose incoming per-pixel value may be read (bake gate)
        self.input_loads = input_loads(module)
        self.supports_opacity = self._scan(
            module.stmts,
            lambda n: isinstance(n, A.Assign)
            and isinstance(n.target, A.Ident)
            and n.target.name == "opacity",
        )
        #: True when the shader reads `time` — such programs cannot be baked
        #: to a static atlas tile and stay on the per-pixel path
        self.uses_time = self._scan(
            module.stmts, lambda n: isinstance(n, A.Ident) and n.name == "time"
        )
        self._bank_dev = None

    def _scan(self, stmts, pred) -> bool:
        found = False

        def walk(node):
            nonlocal found
            if pred(node):
                found = True
            for attr in getattr(node, "__dict__", {}).values():
                if isinstance(attr, list):
                    for x in attr:
                        if hasattr(x, "__dict__") or isinstance(x, tuple):
                            if isinstance(x, tuple):
                                for y in x:
                                    if hasattr(y, "__dict__"):
                                        walk(y)
                                    elif isinstance(y, list):
                                        for z in y:
                                            walk(z)
                            else:
                                walk(x)
                elif hasattr(attr, "__dict__"):
                    walk(attr)

        for s in stmts:
            walk(s)
        return found

    def pattern_bank_dev(self):
        if self._bank_dev is None:
            import jax

            # concrete even when first touched inside a jit trace — caching
            # a traced constant would leak the tracer into later traces
            with jax.ensure_compile_time_eval():
                self._bank_dev = jnp.asarray(pattern_bank())
        return self._bank_dev

    def run_globals(self, ev: Evaluator):
        for s in self.module.stmts:
            if not isinstance(s, A.FnDef):
                ev.exec_stmt(s)

    def shade(self, state: Dict, palette=None) -> Dict:
        """Run top-level lets + fn shade() over the register state dict.

        state values are jnp arrays shaped (..., 3); mutated registers are
        returned in a new dict."""
        state = dict(state)
        ev = Evaluator(self, state, palette)
        self.run_globals(ev)
        if self.shade_index:
            ev.call_user(self.functions["shade"], [])
        return ev.state

    def run(self, state: Optional[Dict] = None, palette=None):
        """Execute top-level statements; returns (state, last value array).

        Mirrors `VM::execute_string` semantics for numeric scripts."""
        state = dict(state or {})
        ev = Evaluator(self, state, palette)
        self.run_globals(ev)
        last = ev.last_value.arr if ev.last_value is not None else jnp.zeros(3)
        return ev.state, last


def _bake_device():
    """Device for build-time shader bakes: the CPU backend when available.

    Deep shaders (main.rusteria's 6-iteration masked truchet loop) compile in
    seconds on CPU XLA but pathologically on XLA-TPU (measured 529 s at 64x64
    round 2), and bakes are 128^2 build-time work where TPU throughput buys
    nothing — pin them off the accelerator. Returns None when only one
    platform exists (pure-CPU test sessions), where the default is already
    right."""
    import jax

    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return None


def _run_on_bake_device(fn, platform=None):
    """Call a nullary jitted bake on the CPU backend (see _bake_device).

    `platform` overrides the pin: a JAX platform string ("cpu", "axon", ...)
    selects that backend explicitly; "default" runs on the session default
    device (rsia --device tpu)."""
    import jax

    if platform == "default":
        return fn()
    if platform is not None:
        with jax.default_device(jax.devices(platform)[0]):
            return fn()
    dev = _bake_device()
    if dev is None:
        return fn()
    with jax.default_device(dev):
        return fn()


class Rusteria:
    """Facade mirroring the reference API (rusteria/src/lib.rs:57-210)."""

    @staticmethod
    def parse_str(src: str) -> A.Module:
        return parse(src)

    @staticmethod
    def parse_and_compile(src: str) -> Optional[Program]:
        try:
            return Program(parse(src))
        except (ParseError, CompileError):
            return None

    @staticmethod
    def execute_script(src_or_program, palette=None, save_dir=None) -> Evaluator:
        """Run a host-mode texture script — the reference's
        make_textures.rusteria flow of alloc/iterate/save top-level calls
        (rusteria/src/node/execution.rs:656-741). Returns the Evaluator with
        `.textures` (list of (H,W,3) f32) and `.saved` ({stem: image, incl.
        derived *_normal maps}) populated. Per-texel iterate bakes are one
        jitted whole-grid trace each, pinned to the CPU backend."""
        program = (
            src_or_program
            if isinstance(src_or_program, Program)
            else Program(parse(src_or_program))
        )
        zeros = jnp.zeros(3, jnp.float32)
        state = {
            "uv": zeros,
            "color": zeros,
            "roughness": zeros + 0.5,
            "metallic": zeros,
            "emissive": zeros,
            "opacity": zeros + 1.0,
            "bump": zeros,
            "normal": zeros,
            "hitpoint": zeros,
            "time": zeros,
        }
        ev = Evaluator(program, state, palette)
        ev.save_dir = save_dir
        program.run_globals(ev)
        return ev

    @staticmethod
    def shade_image(program: Program, width: int, height: int, palette=None,
                    time: float = 0.0, device=None):
        """Offline bake: evaluate fn shade() over a WxH uv grid -> (H,W,3) f32.

        Replaces the reference's rayon 80x80-tile bake (lib.rs:161-210) with
        one jitted whole-image evaluation, pinned to the CPU backend
        (_bake_device) — rsia parity: the reference CLI renders on host."""
        import jax

        @jax.jit
        def run():
            u = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
            v = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
            uu, vv = jnp.meshgrid(u, v)
            zeros = jnp.zeros((height, width), jnp.float32)

            def r3(x, y, z):
                return jnp.stack([x, y, z], axis=-1)

            state = {
                "uv": r3(uu, vv, zeros),
                "color": r3(zeros, zeros, zeros),
                "roughness": r3(zeros + 0.5, zeros + 0.5, zeros + 0.5),
                "metallic": r3(zeros, zeros, zeros),
                "emissive": r3(zeros, zeros, zeros),
                "opacity": r3(zeros + 1, zeros + 1, zeros + 1),
                "bump": r3(zeros, zeros, zeros),
                "normal": r3(zeros, zeros, zeros),
                "hitpoint": r3(zeros, zeros, zeros),
                "time": r3(zeros + time, zeros + time, zeros + time),
            }
            out = program.shade(state, palette)
            return jnp.broadcast_to(out["color"], (height, width, 3))

        return np.asarray(_run_on_bake_device(run, device))

    @staticmethod
    def bake_tile(program: Program, size: int = 128, palette=None,
                  time: float = 0.0) -> np.ndarray:
        """Bake fn shade() to a (size, size, 4) RGBA8 texture over shader-uv
        [0,1)^2 — the reference's chunk-shader pre-bake (src/chunk.rs:104-121)
        generalized to per-batch shaders so shaded batches stay on the
        uniform texture path. Alpha comes from the shader's opacity register
        when the program writes it."""
        import jax

        @jax.jit
        def run():
            u = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
            uu, vv = jnp.meshgrid(u, u)
            zeros = jnp.zeros((size, size), jnp.float32)

            def r3(x):
                return jnp.stack([x, x, x], axis=-1)

            state = {
                "uv": jnp.stack([uu, vv, zeros], axis=-1),
                "color": r3(zeros),
                "roughness": r3(zeros + 0.5),
                "metallic": r3(zeros),
                "emissive": r3(zeros),
                "opacity": r3(zeros + 1.0),
                "bump": r3(zeros),
                "normal": r3(zeros),
                "hitpoint": r3(zeros),
                "time": r3(zeros + time),
            }
            out = program.shade(state, palette)
            rgb = jnp.broadcast_to(out["color"], (size, size, 3))
            a = jnp.broadcast_to(out["opacity"], (size, size, 3))[..., :1]
            return jnp.concatenate([rgb, a], axis=-1)

        rgba = np.array(_run_on_bake_device(run))  # copy: jax buffers are read-only views
        if not program.supports_opacity:
            rgba[..., 3] = 1.0
        # encode linear shader color for the sRGB-decoding texel samplers
        # (reference gamma-encodes its bakes too, renderbuffer.rs:88-107)
        from ..utils.color import linear_to_srgb_exact_inverse

        rgba[..., :3] = linear_to_srgb_exact_inverse(rgba[..., :3])
        return (np.clip(rgba, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)

    @staticmethod
    def bake_state(program: Program, size: int = 128, palette=None,
                   time: float = 0.0) -> dict:
        """Evaluate fn shade() over the bake grid and return ALL shader
        output registers (numpy f32): color/opacity plus roughness,
        metallic, emissive, normal, bump. Used by pack-time bake
        eligibility — a shader that writes non-default material registers
        only bakes when those are representable (emissive 0, normal/bump
        untouched, roughness/metallic spatially constant; scene_pack)."""
        import jax

        @jax.jit
        def run():
            u = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
            uu, vv = jnp.meshgrid(u, u)
            zeros = jnp.zeros((size, size), jnp.float32)

            def r3(x):
                return jnp.stack([x, x, x], axis=-1)

            state = {
                "uv": jnp.stack([uu, vv, zeros], axis=-1),
                "color": r3(zeros),
                "roughness": r3(zeros + 0.5),
                "metallic": r3(zeros),
                "emissive": r3(zeros),
                "opacity": r3(zeros + 1.0),
                "bump": r3(zeros),
                "normal": r3(zeros),
                "hitpoint": r3(zeros),
                "time": r3(zeros + time),
            }
            out = program.shade(state, palette)
            full = (size, size, 3)
            return {
                k: jnp.broadcast_to(out[k], full)
                for k in (
                    "color", "opacity", "roughness", "metallic",
                    "emissive", "normal", "bump",
                )
            }

        return {k: np.asarray(v) for k, v in _run_on_bake_device(run).items()}
