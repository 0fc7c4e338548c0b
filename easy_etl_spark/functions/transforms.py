"""Per-field value transforms, Spark-native.

Reference surface (exit99/easy-etl):
  - ``TransformPipeline`` stages arbitrary chained method calls per field
    (easy_etl/__init__.py:157-195): any attribute access stages
    ``(method, args, kwargs)``; at run time the method resolves to a
    method on the value itself, with builtin fallbacks ``default`` and
    ``func`` (easy_etl/__init__.py:145-154).

Spark-first design: common value methods are whitelisted to native
Column expressions (JVM-side, whole-stage-codegen — the fast path); the
"any Python method of the value's type" generality is preserved by a
row-level UDF *fallback only* (easy_etl/README.md:110,117 documents the
contract). ``default`` keeps the reference's falsy-coalesce semantics
(``data or default_value``, easy_etl/__init__.py:147), which is broader
than NULL-coalesce — see ``falsy_default``.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def falsy_default(df: DataFrame, field: str, default_value: Any) -> Column:
    """Replace *falsy* values (NULL, '', 0, 0.0, False) with ``default_value``.

    Matches ``data or default_value`` (easy_etl/__init__.py:147) — NOT a
    plain coalesce. The falsy test is type-aware so numeric columns
    don't get compared to '' (which would fail analysis on strict
    casting): we only compare against falsy literals valid for the
    column's type.
    """
    col = F.col(field)
    dtype = dict(df.dtypes).get(field)
    cond = col.isNull()
    if dtype in ("string",):
        cond = cond | (col == F.lit(""))
    elif dtype in ("boolean",):
        cond = cond | (~col)
    elif dtype is not None and dtype not in ("date", "timestamp", "binary"):
        # numeric family: int/bigint/smallint/tinyint/float/double/decimal
        cond = cond | (col == F.lit(0))
    return F.when(cond, F.lit(default_value)).otherwise(col)


def _replace(col: Column, old: str, new: str) -> Column:
    # str.replace semantics = literal (non-regex) replacement. The
    # 3-arg Python form (count) falls back to the UDF via the
    # TypeError guard in apply_transform.
    return F.replace(col, F.lit(old), F.lit(new))


def _round_col(col: Column, ndigits: int = 0) -> Column:
    return F.round(col, ndigits)


def _strip(col: Column) -> Column:
    # str.strip() removes ALL whitespace (\t\n\r\f\v + space), not just
    # spaces — F.trim would be wrong. Java \s covers the ASCII set.
    return F.regexp_replace(col.cast("string"), r"^\s+|\s+$", "")


def _lstrip(col: Column) -> Column:
    return F.regexp_replace(col.cast("string"), r"^\s+", "")


def _rstrip(col: Column) -> Column:
    return F.regexp_replace(col.cast("string"), r"\s+$", "")


def _zfill(col: Column, n: int) -> Column:
    # str.zfill: never truncates, pads after a leading sign
    s = col.cast("string")
    return (
        F.when(F.length(s) >= n, s)
        .when(
            s.startswith("-") | s.startswith("+"),
            F.concat(F.substring(s, 1, 1), F.lpad(F.substring(s, 2, 2_000_000_000), n - 1, "0")),
        )
        .otherwise(F.lpad(s, n, "0"))
    )


def _capitalize(col: Column) -> Column:
    s = col.cast("string")
    return F.concat(F.upper(F.substring(s, 1, 1)), F.lower(F.substring(s, 2, 2_000_000_000)))


#: method name -> Column builder taking (col, *args). Native = fast path.
#: NOT here on purpose: ``title`` — Python title() uppercases after any
#: non-cased char ('0a'.title() == '0A', "don't" → "Don'T") which
#: F.initcap (whitespace words + lowercased rest) does not replicate;
#: it takes the exact-semantics UDF fallback instead.
NATIVE_METHODS: dict[str, Callable[..., Column]] = {
    "upper": lambda c: F.upper(c),
    "lower": lambda c: F.lower(c),
    "strip": _strip,
    "lstrip": _lstrip,
    "rstrip": _rstrip,
    "capitalize": _capitalize,
    "replace": _replace,
    "zfill": _zfill,
    "round": _round_col,
}


def python_method_udf(
    method: str, args: tuple, kwargs: dict, returns: "T.DataType | str | None" = None
) -> Callable[[Column], Column]:
    """UDF fallback preserving 'any Python method of the value's type'
    (easy_etl/__init__.py:184-191). Slow path by design; only hit for
    methods outside NATIVE_METHODS.

    ``returns`` declares the method's Spark return type (like .func()
    does for scalar UDFs). Without it the result is coerced to str —
    an explicit, documented coercion rather than the silent nulling
    Spark does when a UDF's declared StringType mismatches the actual
    value (e.g. ``split`` → list, ``bit_length`` → int).
    """
    rt = returns or T.StringType()
    coerce = returns is None

    def apply(value: Any) -> Any:
        if value is None:
            return None
        out = getattr(value, method)(*args, **kwargs)
        if coerce and out is not None and not isinstance(out, str):
            out = str(out)
        return out

    return F.udf(apply, rt)


class TransformPipeline:
    """Fluent per-field transform stager.

    ``pipe.transform("a", "b").upper().replace("X", "Y")`` stages
    ``upper`` then ``replace`` against fields a and b; execution order
    is call order (reference test: ``.upper().lower()`` ⇒ lower wins,
    tests/test_etl_process.py:60-69).
    """

    def __init__(self, parent: "Any", fields: tuple[str, ...]):
        bad = [f for f in fields if not isinstance(f, str)]
        if bad:
            # transform() takes FIELD NAMES; methods chain on the result
            # (pipe.transform("a").lower()). Passing a callable here is
            # a likely misread of the API — without this check it would
            # be swallowed as a field name and every later chained call
            # (including .load()) staged as a fake string method.
            raise TypeError(
                f"transform() fields must be column-name strings, got "
                f"{bad!r}; chain methods on the returned pipeline, e.g. "
                f'.transform("col").lower()'
            )
        self._parent = parent
        self._fields = fields

    def __getattr__(self, method: str):
        if method.startswith("_"):
            raise AttributeError(method)

        def stage(*args, **kwargs):
            for f in self._fields:
                self._parent._staged_transforms.append((f, method, args, kwargs))
            return self

        return stage

    # Explicit builtins (reference builtin_methods, easy_etl/__init__.py:158-161)
    def default(self, value: Any) -> "TransformPipeline":
        for f in self._fields:
            self._parent._staged_transforms.append((f, "__default__", (value,), {}))
        return self

    def func(self, fn: Callable[[Any], Any], return_type: Any = T.StringType()) -> "TransformPipeline":
        for f in self._fields:
            self._parent._staged_transforms.append((f, "__func__", (fn, return_type), {}))
        return self


def apply_transform(df: DataFrame, field: str, method: str, args: tuple, kwargs: dict) -> DataFrame:
    """Apply one staged transform as a Column expression on ``df``."""
    if method == "__default__":
        return df.withColumn(field, falsy_default(df, field, args[0]))
    if method == "__func__":
        fn, rtype = args
        return df.withColumn(field, F.udf(fn, rtype)(F.col(field)))
    # reserved kwarg: declare the UDF fallback's Spark return type
    # (``.bit_length(returns="int")``); never passed to the method
    kwargs = dict(kwargs)
    returns = kwargs.pop("returns", None)
    native = NATIVE_METHODS.get(method)
    if native is not None:
        try:
            return df.withColumn(field, native(F.col(field), *args, **kwargs))
        except TypeError:
            # arg shape the native mapping doesn't cover (e.g.
            # replace(old, new, count), strip(chars)) → exact UDF path
            pass
    return df.withColumn(field, python_method_udf(method, args, kwargs, returns)(F.col(field)))
