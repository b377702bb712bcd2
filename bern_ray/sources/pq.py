"""Metadata-clean parquet reads.

The driver's testdata parquet files carry `pandas` schema metadata;
blocks that keep it have UNHASHABLE schemas, which disables Ray
Data's schema-deduplication fast path and floods worker logs with
"Failed to hash the schemas" warnings (observed through BENCH_r04).
Stripping at every EMISSION site (r4) missed the ReadParquet blocks
themselves, so the fix belongs at the read boundary: pass an explicit
metadata-free schema and every downstream stage inherits hashable
schemas for free.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data


def read_parquet_clean(
    path: str, *, columns: list[str] | None = None, **kw
) -> "ray.data.Dataset":
    """`ray.data.read_parquet` that strips pandas schema metadata AT
    THE READ. `path` must be a single parquet file (our sources are;
    a directory would need a fragment-level schema probe). When
    `columns` is given the explicit schema is subset to match — Ray
    applies the projection before schema unification."""
    sch = pq.read_schema(path).remove_metadata()
    if columns is not None:
        sch = pa.schema([sch.field(c) for c in columns])
    return ray.data.read_parquet(path, schema=sch, columns=columns, **kw)
