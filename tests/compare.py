"""Spark-vs-DuckDB result comparison, mirroring the driver's gate
(row-count + schema + order-insensitive value hash) as strictly as we
can locally: after dtype normalization, frames must match EXACTLY —
including float bits — because the declared queries are engineered to be
bit-deterministic (decimal sums, ordered double folds, explicit rounds).
"""

from __future__ import annotations

import pandas as pd
from pandas.api import types as ptypes


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Column-order/dtype normalization: sort columns by name, widen ints
    to int64 and floats to float64, timestamps to naive ns, then sort
    rows by every column (nulls first) for order-insensitive compare."""
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        s = out[c]
        if ptypes.is_bool_dtype(s):
            out[c] = s.astype("boolean")
        elif ptypes.is_integer_dtype(s):
            out[c] = s.astype("Int64")
        elif ptypes.is_float_dtype(s):
            out[c] = s.astype("float64")
        elif ptypes.is_datetime64_any_dtype(s):
            s = pd.to_datetime(s)
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            out[c] = s.astype("datetime64[ns]")
        elif s.dtype == object:
            non_null = s.dropna()
            if len(non_null) and all(isinstance(v, (bool,)) for v in non_null):
                # nullable bools arrive as object (None/bool) from one
                # engine and boolean from the other
                out[c] = s.astype("boolean")
            else:
                # decimal.Decimal or str; stringify canonically
                out[c] = s.map(lambda v: None if v is None else str(v))
    out = out.sort_values(by=list(out.columns), na_position="first", kind="mergesort")
    return out.reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count mismatch spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    a = normalize(spark_pdf)
    b = normalize(oracle_pdf)
    for c in a.columns:
        assert str(a[c].dtype) == str(b[c].dtype), (
            f"{name}: dtype mismatch on {c}: spark={a[c].dtype} oracle={b[c].dtype}"
        )
    pd.testing.assert_frame_equal(a, b, check_exact=True, obj=name)
