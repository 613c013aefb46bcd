"""Math-expression compiler: input-deck expression strings -> jittable JAX functions.

The reference compiles deck math expressions (density/momentum profiles, external
fields, ...) to device-executable parsers via amrex::Parser
(reference: Source/Utils/Parser/ParserUtils.{H,cpp}).  Here an expression string is
translated to a Python expression evaluated in a jax.numpy namespace, producing a
pure function of its declared variables that traces/jits cleanly.

Supported syntax (superset of what the regression decks use):
  +,-,*,/,** (also '^'), comparisons (return 0.0/1.0), sqrt, sin, cos, tan, asin,
  acos, atan, atan2, sinh, cosh, tanh, exp, log, log10, pow, abs/fabs, floor, ceil,
  min, max, fmod, heaviside(x, x0), sign, if(cond, a, b), and/or/not (on 0/1 values).
"""

from __future__ import annotations

import re
from typing import Callable, Mapping, Sequence

import jax.numpy as jnp

from .. import constants

__all__ = ["compile_expression", "evaluate_constant"]


def _heaviside(x, x0):
    return jnp.where(x < 0, 0.0, jnp.where(x > 0, 1.0, x0))


def _if(cond, a, b):
    return jnp.where(cond != 0, a, b)


_FUNCS = {
    "sqrt": jnp.sqrt,
    "sin": jnp.sin,
    "cos": jnp.cos,
    "tan": jnp.tan,
    "asin": jnp.arcsin,
    "acos": jnp.arccos,
    "atan": jnp.arctan,
    "atan2": jnp.arctan2,
    "sinh": jnp.sinh,
    "cosh": jnp.cosh,
    "tanh": jnp.tanh,
    "exp": jnp.exp,
    "log": jnp.log,
    "log10": jnp.log10,
    "pow": jnp.power,
    "abs": jnp.abs,
    "fabs": jnp.abs,
    "floor": jnp.floor,
    "ceil": jnp.ceil,
    "min": jnp.minimum,
    "max": jnp.maximum,
    "fmod": jnp.fmod,
    "heaviside": _heaviside,
    "sign": jnp.sign,
    "where": _if,  # target of the if() rewrite
    "logand": lambda a, b: jnp.logical_and(a, b),
    "logor": lambda a, b: jnp.logical_or(a, b),
    "lognot": lambda a: jnp.logical_not(a),
    "erf": None,  # filled lazily below (jax.scipy)
}


def _erf(x):
    from jax.scipy.special import erf

    return erf(x)


_FUNCS["erf"] = _erf

# 'if' is a Python keyword: rewrite calls "if(" -> "where(".
_IF_RE = re.compile(r"\bif\s*\(")
# Boolean word-operators operate on 0/1-valued floats.
_AND_RE = re.compile(r"\band\b")
_OR_RE = re.compile(r"\bor\b")
_NOT_RE = re.compile(r"\bnot\b")


def _translate(expr: str) -> str:
    s = expr.strip().replace("\n", " ")
    s = s.replace("^", "**")
    s = _IF_RE.sub("where(", s)
    # and/or/not on {0,1} floats: a*b, max(a,b), 1-a.  Implemented via bitwise-ish
    # float tricks using multiplication and min/max through operator rewriting.
    # and/or/not keep Python's loose precedence (a<b and c>d parses as
    # (a<b) and (c>d)); the AST pass below turns them into logical calls —
    # a textual "&" substitution would BIND TIGHTER than the comparisons
    # and produce bitwise_and on floats (e.g. the field_probe EB deck).
    return s


class _Logical:
    """Wrap comparison results so &,|,~ behave as logical ops returning 0.0/1.0."""


def compile_expression(
    expr: str,
    variables: Sequence[str],
    user_constants: Mapping[str, float] | None = None,
) -> Callable:
    """Compile ``expr`` into ``f(*variables) -> jnp.ndarray``.

    Comparison operators produce jnp boolean arrays; &,|,~ work on those natively.
    The result is coerced to a float array.

    Supports the AMReX parser's assignment-statement form
    ``a = expr1; b = expr2; final_expr`` (amrex::Parser local symbols, used
    e.g. by the rotated-cube EB decks): each assignment introduces a local
    symbol visible to the following segments.
    """
    if ";" in expr:
        segments = [s.strip() for s in expr.split(";") if s.strip()]
        assigns = []
        names = list(variables)
        import re as _re

        for seg in segments[:-1]:
            m = _re.match(r"^([A-Za-z_]\w*)\s*=(?!=)\s*(.+)$", seg)
            if not m:
                raise ValueError(
                    f"expected 'name = expr' segment, got {seg!r}"
                )
            nm, rhs = m.group(1), m.group(2)
            assigns.append(
                (nm, compile_expression(rhs, tuple(names), user_constants))
            )
            names.append(nm)
        final = compile_expression(
            segments[-1], tuple(names), user_constants
        )

        def chained(*args):
            vals = list(args)
            for _, fn in assigns:
                vals.append(fn(*vals))
            return final(*vals)

        return chained
    src = _translate(expr)
    if "__" in expr:
        # physics expressions never need dunders; blocking them keeps the
        # restricted eval safe while __import__ stays available for jax's
        # lazy imports triggered inside the eval frame
        raise ValueError(f"invalid deck expression: {expr!r}")
    namespace: dict = {}
    namespace.update(_FUNCS)
    namespace.update(constants.EXPRESSION_CONSTANTS)
    if user_constants:
        namespace.update(user_constants)
    namespace["__builtins__"] = {"__import__": __import__}

    import ast

    tree = ast.parse(src, mode="eval")

    class _Bool(ast.NodeTransformer):
        def visit_BoolOp(self, node):
            self.generic_visit(node)
            fn = "logand" if isinstance(node.op, ast.And) else "logor"
            out = node.values[0]
            for v in node.values[1:]:
                out = ast.Call(
                    func=ast.Name(id=fn, ctx=ast.Load()),
                    args=[out, v], keywords=[],
                )
            return out

        def visit_UnaryOp(self, node):
            self.generic_visit(node)
            if isinstance(node.op, ast.Not):
                return ast.Call(
                    func=ast.Name(id="lognot", ctx=ast.Load()),
                    args=[node.operand], keywords=[],
                )
            return node

    tree = ast.fix_missing_locations(_Bool().visit(tree))
    code = compile(tree, f"<deck-expr: {expr[:60]}>", "eval")

    def fn(*args):
        local = dict(zip(variables, args))
        out = eval(code, namespace, local)  # noqa: S307 - restricted namespace
        return jnp.asarray(out, dtype=jnp.result_type(float)) + jnp.zeros(
            jnp.broadcast_shapes(*[jnp.shape(a) for a in args]) if args else (),
            dtype=jnp.result_type(float),
        )

    fn.__name__ = "deck_expr"
    fn.expression = expr
    return fn


def evaluate_constant(
    expr: str, user_constants: Mapping[str, float] | None = None
) -> float:
    """Evaluate a variable-free deck expression to a Python float on the host."""
    src = _translate(expr)
    import math

    namespace: dict = {
        "sqrt": math.sqrt,
        "sin": math.sin,
        "cos": math.cos,
        "tan": math.tan,
        "asin": math.asin,
        "acos": math.acos,
        "atan": math.atan,
        "atan2": math.atan2,
        "sinh": math.sinh,
        "cosh": math.cosh,
        "tanh": math.tanh,
        "exp": math.exp,
        "log": math.log,
        "log10": math.log10,
        "pow": math.pow,
        "abs": abs,
        "fabs": abs,
        "floor": math.floor,
        "ceil": math.ceil,
        "min": min,
        "max": max,
        "fmod": math.fmod,
        "erf": math.erf,
        "sign": lambda x: (x > 0) - (x < 0),
        "heaviside": lambda x, x0: 0.0 if x < 0 else (1.0 if x > 0 else x0),
        "where": lambda c, a, b: a if c else b,
    }
    namespace.update(constants.EXPRESSION_CONSTANTS)
    if user_constants:
        namespace.update(user_constants)
    namespace["__builtins__"] = {}
    return float(eval(src, namespace, {}))  # noqa: S307
