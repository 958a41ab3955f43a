"""Arrow/pandas UDF construction helper.

Spark's pandas_udf infers the eval type from the function's type hints;
string annotations like ``s: "pd.Series"`` fail to resolve when ``pd`` is
imported inside an enclosing function (UNSUPPORTED_SIGNATURE). This helper
sets real class annotations explicitly so every module builds its UDFs the
same way instead of repeating the workaround.
"""

from __future__ import annotations

import types

import pandas as pd
from pyspark.sql.functions import pandas_udf


def series_udf(fn, return_type: str, agg: bool = False):
    """Wrap ``fn(Series, ...) -> Series`` (or ``-> scalar`` when ``agg``)
    as a pandas UDF with the given Spark return type. Annotations go on a
    lightweight CLONE of ``fn`` (same code/closure) so the caller's
    function object is never mutated."""
    clone = types.FunctionType(
        fn.__code__, fn.__globals__, fn.__name__, fn.__defaults__, fn.__closure__
    )
    n_args = fn.__code__.co_argcount
    ann = {name: pd.Series for name in fn.__code__.co_varnames[:n_args]}
    ann["return"] = float if agg else pd.Series
    clone.__annotations__ = ann
    return pandas_udf(clone, return_type)
