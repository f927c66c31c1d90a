"""Order-insensitive DataFrame comparison — local replica of the driver's
t2 differential check (row count + column set + value match)."""

from __future__ import annotations

import math

import pandas as pd


def _canon_cell(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<null>"
        return repr(v)
    if isinstance(v, (pd.Timestamp,)):
        if pd.isna(v):
            return "<null>"
        return v.isoformat()
    try:
        if pd.isna(v):
            return "<null>"
    except (TypeError, ValueError):
        pass
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def canonize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_cell(v) for v in rec) for rec in df[cols].itertuples(index=False, name=None)]
    return sorted(rows)


def assert_frames_match(spark_df, duck_df: pd.DataFrame, name: str = "") -> None:
    spark_pd = spark_df.toPandas()
    assert sorted(spark_pd.columns.str.lower()) == sorted(duck_df.columns.str.lower()), (
        f"{name}: column mismatch spark={sorted(spark_pd.columns)} duck={sorted(duck_df.columns)}"
    )
    spark_pd.columns = spark_pd.columns.str.lower()
    duck_df = duck_df.copy()
    duck_df.columns = duck_df.columns.str.lower()
    assert len(spark_pd) == len(duck_df), (
        f"{name}: row count spark={len(spark_pd)} duck={len(duck_df)}"
    )
    a, b = canonize(spark_pd), canonize(duck_df)
    for i, (ra, rb) in enumerate(zip(a, b)):
        assert ra == rb, f"{name}: first differing row #{i}:\n spark={ra}\n duck ={rb}"
