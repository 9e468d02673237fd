"""Driver-style comparison: Spark result vs DuckDB oracle.

Mirrors the documented driver check: row count + schema (column names)
+ order-insensitive value comparison. Values are compared exactly for
ints/strings/timestamps and to 1e-9 relative for floats (the catalog
rounds accumulation-order-dependent floats on both sides, so exact
equality is expected in practice; the tolerance only papers over
representation noise, not semantics).
"""

from __future__ import annotations

import math
import os

import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duck_connect(sf_dir: str):
    """DuckDB connection with every test table registered as a view —
    the one shared spelling of the oracle-side setup (conftest's duck
    fixture, tools/time_gate.py, tools/verify_rotation.py)."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: v.item() if hasattr(v, "item") else v, na_action="ignore"
            )
    sort_cols = list(df.columns)
    return df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs "
        f"{sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(oracle_pdf)}"
    )
    a = _normalize(spark_pdf)
    b = _normalize(oracle_pdf)
    for c in a.columns:
        ca, cb = a[c], b[c]
        if pd.api.types.is_float_dtype(ca):
            for i, (x, y) in enumerate(zip(ca, cb)):
                if pd.isna(x) and pd.isna(y):
                    continue
                assert not (pd.isna(x) or pd.isna(y)), (
                    f"{name}.{c}[{i}]: null mismatch {x!r} vs {y!r}"
                )
                assert math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9), (
                    f"{name}.{c}[{i}]: {x!r} vs {y!r}"
                )
        else:
            mism = ca.ne(cb) & ~(ca.isna() & cb.isna())
            assert not mism.any(), (
                f"{name}.{c}: {int(mism.sum())} mismatches, first at row "
                f"{mism.idxmax()}: {ca[mism.idxmax()]!r} vs {cb[mism.idxmax()]!r}"
            )
