"""Feature Constructor: user-typed Python expressions → Spark Columns.

Reference: ``Orange/widgets/data/owfeatureconstructor.py`` — expressions are
AST-whitelist sandboxed (``validate_exp`` ``:947-1013``), free variables bind
to sanitized column names (``sanitized_name`` ``:1028-1033``), ``math.*``
functions are available (``:126-134``), and evaluation masks row errors to
missing (``FeatureFunc.__call__`` ``:1227-1290``).

Spark mapping: instead of compiling to a Python lambda evaluated row-wise
(the reference's approach), the AST is TRANSLATED to a Column expression —
whole-stage codegen, pushdown-eligible, no Python at execution time.  The
same whitelist doubles as the sandbox: anything outside it is rejected (or,
for genuinely Python-only semantics, routed to an Arrow-batched pandas UDF
via ``compile_to_pandas_udf``).

Error masking: Spark's ANSI mode raises on div-by-zero etc.; `try_divide` /
NULL-propagation reproduce Orange's exception→NaN behavior declaratively.
"""

from __future__ import annotations

import ast
import math
import re
from typing import Mapping, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ALLOWED_NODES = (
    ast.Expression, ast.BinOp, ast.UnaryOp, ast.BoolOp, ast.Compare,
    ast.IfExp, ast.Call, ast.Name, ast.Load, ast.Constant, ast.Attribute,
    ast.Add, ast.Sub, ast.Mult, ast.Div, ast.FloorDiv, ast.Mod, ast.Pow,
    ast.USub, ast.UAdd, ast.Not, ast.And, ast.Or,
    ast.Eq, ast.NotEq, ast.Lt, ast.LtE, ast.Gt, ast.GtE, ast.In, ast.NotIn,
    ast.Tuple, ast.List,
)

# math.* / builtins the reference whitelists (owfeatureconstructor.py:126-134,
# :1177-1188) mapped to JVM-side functions
_FUNCTIONS: Mapping[str, object] = {
    "sqrt": F.sqrt, "exp": F.exp, "log": F.log, "log2": F.log2,
    "log10": F.log10, "sin": F.sin, "cos": F.cos, "tan": F.tan,
    "asin": F.asin, "acos": F.acos, "atan": F.atan, "sinh": F.sinh,
    "cosh": F.cosh, "tanh": F.tanh, "floor": F.floor, "ceil": F.ceil,
    "abs": F.abs, "fabs": F.abs, "round": F.round, "sign": F.signum,
    "atan2": F.atan2, "pow": F.pow, "hypot": F.hypot,
    "min": F.least, "max": F.greatest,
    "len": F.length, "upper": F.upper, "lower": F.lower, "strip": F.trim,
}

_CONSTANTS = {"pi": math.pi, "e": math.e, "inf": float("inf"),
              "nan": float("nan"), "True": True, "False": False, "None": None}


def sanitized_name(name: str) -> str:
    """Column name → identifier (``sanitized_name`` :1028-1033)."""
    out = re.sub(r"\W", "_", name)
    if out and out[0].isdigit():
        out = "_" + out
    return out


class ExpressionError(ValueError):
    pass


def validate_expression(source: str) -> ast.Expression:
    """Parse + whitelist-check (the sandbox, ``validate_exp`` :947-1013)."""
    try:
        tree = ast.parse(source, mode="eval")
    except SyntaxError as e:
        raise ExpressionError(f"syntax error: {e}") from e
    for node in ast.walk(tree):
        if not isinstance(node, _ALLOWED_NODES):
            raise ExpressionError(
                f"disallowed construct: {type(node).__name__}")
        if isinstance(node, ast.Call):
            fn = node.func
            name = fn.attr if isinstance(fn, ast.Attribute) else \
                getattr(fn, "id", None)
            if name not in _FUNCTIONS:
                raise ExpressionError(f"disallowed function: {name}")
        if isinstance(node, ast.Attribute) and node.attr not in _FUNCTIONS:
            raise ExpressionError(f"disallowed attribute: {node.attr}")
    return tree


def compile_expression(source: str, df: DataFrame,
                       env: Optional[Mapping[str, str]] = None) -> Column:
    """Translate a validated expression to a Column.

    ``env`` maps identifiers → actual column names; by default every column
    is bound under its sanitized name (``bind_variable`` :1035-1070).
    """
    tree = validate_expression(source)
    bind = {sanitized_name(c): c for c in df.columns}
    if env:
        bind.update(env)
    return _emit(tree.body, bind)


def _emit(node: ast.AST, bind: Mapping[str, str]) -> Column:
    if isinstance(node, ast.Constant):
        return F.lit(node.value)
    if isinstance(node, ast.Name):
        if node.id in _CONSTANTS:
            return F.lit(_CONSTANTS[node.id])
        if node.id in bind:
            return F.col(bind[node.id])
        raise ExpressionError(f"unknown name: {node.id}")
    if isinstance(node, ast.BinOp):
        le, r = _emit(node.left, bind), _emit(node.right, bind)
        op = type(node.op)
        if op is ast.Add:
            return le + r
        if op is ast.Sub:
            return le - r
        if op is ast.Mult:
            return le * r
        if op is ast.Div:
            # Orange masks ZeroDivisionError to NaN → NULL-safe try_divide
            return F.try_divide(le, r)
        if op is ast.FloorDiv:
            return F.floor(F.try_divide(le, r))
        if op is ast.Mod:
            return le % r
        if op is ast.Pow:
            return F.pow(le, r)
        raise ExpressionError(f"operator {op.__name__}")
    if isinstance(node, ast.UnaryOp):
        v = _emit(node.operand, bind)
        if isinstance(node.op, ast.USub):
            return -v
        if isinstance(node.op, ast.UAdd):
            return v
        if isinstance(node.op, ast.Not):
            return ~v.cast("boolean")
        raise ExpressionError("unary op")
    if isinstance(node, ast.BoolOp):
        vals = [_emit(v, bind).cast("boolean") for v in node.values]
        out = vals[0]
        for v in vals[1:]:
            out = (out & v) if isinstance(node.op, ast.And) else (out | v)
        return out
    if isinstance(node, ast.Compare):
        left = _emit(node.left, bind)
        out = None
        for op, comp in zip(node.ops, node.comparators):
            if isinstance(op, (ast.In, ast.NotIn)):
                if not isinstance(comp, (ast.Tuple, ast.List)) or not all(
                        isinstance(e, ast.Constant) for e in comp.elts):
                    raise ExpressionError("`in` needs a literal tuple/list")
                c = left.isin([e.value for e in comp.elts])
                if isinstance(op, ast.NotIn):
                    c = ~c
            else:
                right = _emit(comp, bind)
                c = {ast.Eq: left == right, ast.NotEq: left != right,
                     ast.Lt: left < right, ast.LtE: left <= right,
                     ast.Gt: left > right, ast.GtE: left >= right}[type(op)]
            out = c if out is None else out & c
            left = _emit(comp, bind) if not isinstance(op, (ast.In, ast.NotIn)) else left
        return out
    if isinstance(node, ast.IfExp):
        return F.when(_emit(node.test, bind).cast("boolean"),
                      _emit(node.body, bind)).otherwise(_emit(node.orelse, bind))
    if isinstance(node, ast.Call):
        fn = node.func
        name = fn.attr if isinstance(fn, ast.Attribute) else fn.id  # type: ignore
        args = [_emit(a, bind) for a in node.args]
        return _FUNCTIONS[name](*args)
    raise ExpressionError(f"cannot translate {type(node).__name__}")


def construct_feature(df: DataFrame, name: str, source: str,
                      env: Optional[Mapping[str, str]] = None) -> DataFrame:
    """Append a constructed column (the widget's output contract)."""
    return df.withColumn(name, compile_expression(source, df, env))


def compile_to_pandas_udf(source: str, df: DataFrame,
                          columns: list[str], out_type: str = "double"):
    """Escape hatch for true-Python semantics: the sandboxed expression runs
    as an Arrow-batched pandas UDF with Orange's error→missing masking.
    ~10-100× slower than the translated Column — use only when translation
    fails (reference evaluates EVERY expression this way, row-at-a-time)."""
    import builtins

    validate_expression(source)
    code = compile(source, "<feature>", "eval")
    allowed = {}
    for k in ("sqrt", "exp", "log", "floor", "ceil", "abs",
              "min", "max", "len", "round"):
        allowed[k] = getattr(math, k, None) or getattr(builtins, k)

    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf(out_type)
    def run(*cols):
        import pandas as pd
        out = []
        for row in zip(*cols):
            local = dict(zip(columns, row))
            try:
                out.append(eval(code, {"__builtins__": {}}, {**allowed, **local}))
            except Exception:
                out.append(None)   # error → missing (FeatureFunc :1227-1290)
        return pd.Series(out)

    return run(*[F.col(c) for c in columns])
