"""Shared Arrow-plane hash bucketing.

Every hash-bucket shuffle in the repo should attach its ``__bucket``
column HERE, on the Arrow block, instead of converting the block to
pandas first: pandas object-dtype blocks serialize ~3x larger through
an exchange, and ``pd.util.hash_pandas_object`` (including the
Arrow->pandas conversion it forces) measures ~40x slower than a
vectorized polars hash taken zero-copy off the Arrow column
(170 ms vs 4 ms per 250k strings on this hardware).

Determinism: polars' hash is stable within an environment (fixed
polars version + seed), which is all a shuffle key needs — every task
of a run computes the same bucket for the same key. Nothing persisted
depends on these values.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def hash_column(t: pa.Table, col: str, seed: int = 0) -> np.ndarray:
    """Vectorized uint64 hash of one column, zero-copy from Arrow."""
    import polars as pl

    return pl.from_arrow(t.column(col)).hash(seed=seed).to_numpy()


def add_bucket(t: pa.Table, col: str, num_buckets: int,
               out: str = "__bucket") -> pa.Table:
    """Append an int64 ``out`` column = hash(t[col]) % num_buckets."""
    if t.num_rows == 0:
        return t.append_column(out, pa.array([], pa.int64()))
    b = (hash_column(t, col) % np.uint64(num_buckets)).astype(np.int64)
    return t.append_column(out, pa.array(b, pa.int64()))
