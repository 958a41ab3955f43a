"""Arrow/pandas UDF construction helper.

Spark's pandas_udf infers the eval type from the function's type hints;
string annotations like ``s: "pd.Series"`` fail to resolve when ``pd`` is
imported inside an enclosing function (UNSUPPORTED_SIGNATURE). This helper
sets real class annotations explicitly so every module builds its UDFs the
same way instead of repeating the workaround.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf


def series_udf(fn, return_type: str, agg: bool = False):
    """Wrap ``fn(Series, ...) -> Series`` (or ``-> scalar`` when ``agg``)
    as a pandas UDF with the given Spark return type."""
    n_args = fn.__code__.co_argcount
    ann = {name: pd.Series for name in fn.__code__.co_varnames[:n_args]}
    ann["return"] = float if agg else pd.Series
    fn.__annotations__ = ann
    return pandas_udf(fn, return_type)
