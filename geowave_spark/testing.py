"""Shared correctness-compare helpers (used by pytest and tools/check_correctness)."""

from __future__ import annotations

import hashlib

import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_hash(df: pd.DataFrame) -> str:
    """Order-insensitive value hash: columns sorted by name, rows sorted."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(repr)
    rows = sorted(df.itertuples(index=False, name=None))
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def compare(sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    """Row count + column set + value hash; returns list of problems (empty = match)."""
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"rows {len(sdf)} != {len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
    elif norm_hash(sdf) != norm_hash(odf):
        problems.append("value-hash mismatch")
    return problems


def duckdb_conn(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con
