"""Arrow scalar-UDF declaration helper.

Spark 4 deprecates ``pandas_udf(fn, type, PandasUDFType.SCALAR)`` in
favor of type-hint inference — but this package compiles with ``from
__future__ import annotations``, which stringifies inline hints into
forms ``pandas_udf`` cannot introspect (UNSUPPORTED_SIGNATURE). The
fix is mechanical: attach REAL ``pd.Series`` objects to the function's
``__annotations__`` (bypassing the future-import stringification) and
call the recommended two-argument ``pandas_udf`` form. One helper so
every Arrow UDF in the package declares itself the same way and the
deprecated enum never appears in a plan-building path again.
"""

from __future__ import annotations

from typing import Callable


def arrow_udf(fn: Callable, return_type: str):
    """Declare ``fn`` as a Series-to-Series Arrow scalar UDF.

    Equivalent to the deprecated ``pandas_udf(fn, return_type,
    PandasUDFType.SCALAR)`` but through Spark's recommended type-hint
    signature: each positional parameter and the return are annotated
    ``pd.Series`` with live class objects, so ``typing.get_type_hints``
    resolves them regardless of the caller module's future imports.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    code = fn.__code__
    fn.__annotations__ = {
        **{
            code.co_varnames[i]: pd.Series
            for i in range(code.co_argcount)
        },
        "return": pd.Series,
    }
    return pandas_udf(fn, return_type)
