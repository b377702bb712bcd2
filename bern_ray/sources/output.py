"""Output projections — the reference's writer formats re-expressed.

- `denotations`: PubAnnotation-style per-document output
  (reference: convert.py:467-556 get_pub_annotation): one row per url
  with a list of {span, obj, ids} denotations sorted by
  (span.begin, obj) — the reference's double sort key
  (convert.py:549-556). The sort is WITHIN one document, so it runs
  inside the per-batch UDF (Arrow sort_indices per group), never as a
  global shuffle (SURVEY.md §2.6).
- `pubtator_lines`: PubTator-style mention lines
  (reference: convert.py:559-586 get_pubtator): url \\t start \\t end
  \\t surface \\t etype \\t ids with '|'-joined ids, mentions sorted
  by start within the document.

Both consume the clusters table (pipelines/linkage.py output) and are
plain `map_batches` + `write_parquet`/`write_json` sinks.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data


def denotations_batch(g: pd.DataFrame) -> pa.Table:
    """One url group -> single row with sorted denotation structs."""
    g = g.sort_values(["start", "cluster_id"], kind="mergesort")
    dens = [
        {
            "begin": int(r.start),
            "end": int(r.end),
            "obj": r.cluster_id,
            "ids": list(r.ids),
        }
        for r in g.itertuples()
    ]
    den_type = pa.struct(
        [
            ("begin", pa.int64()),
            ("end", pa.int64()),
            ("obj", pa.string()),
            ("ids", pa.list_(pa.string())),
        ]
    )
    return pa.table(
        {
            "url": pa.array([g["url"].iloc[0]], type=pa.string()),
            "n_denotations": pa.array([len(dens)], type=pa.int64()),
            "denotations": pa.array([dens], type=pa.list_(den_type)),
        }
    )


def to_denotations(clusters: "ray.data.Dataset") -> "ray.data.Dataset":
    return clusters.groupby("url").map_groups(
        denotations_batch, batch_format="pandas"
    )


def pubtator_batch(t: pa.Table) -> pa.Table:
    """Flat PubTator-ish mention lines; '|'-joined ids
    (reference joins multi-ids with '|', convert.py:577)."""
    df = t.to_pandas().sort_values(["url", "start"], kind="mergesort")
    lines = [
        f"{r.url}\t{r.start}\t{r.end}\t{r.surface}\t{r.etype}\t"
        + "|".join(r.ids)
        for r in df.itertuples()
    ]
    return pa.table(
        {
            "url": pa.array(df["url"].tolist(), type=pa.string()),
            "line": pa.array(lines, type=pa.string()),
        }
    )


def to_pubtator(clusters: "ray.data.Dataset") -> "ray.data.Dataset":
    return clusters.map_batches(pubtator_batch, batch_format="pyarrow")


def parse_pubtator_batch(t: pa.Table) -> pa.Table:
    """Inverse of `pubtator_batch`: PubTator-style mention lines back
    to a flat mentions table (the reference's line PARSER,
    convert.py:9-115 pubtator2dict_list, minus the title/abstract
    header rows our writer does not emit). Closes the write->read
    round-trip so PubTator files are a first-class source format.
    """
    urls, starts, ends, surfs, etypes, ids = [], [], [], [], [], []
    for line in t["line"].to_pylist():
        parts = line.split("\t")
        if len(parts) != 6:
            continue  # malformed / header row — reference skips too
        urls.append(parts[0])
        starts.append(int(parts[1]))
        ends.append(int(parts[2]))
        surfs.append(parts[3])
        etypes.append(parts[4])
        ids.append(parts[5].split("|") if parts[5] else [])
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "start": pa.array(starts, type=pa.int64()),
            "end": pa.array(ends, type=pa.int64()),
            "surface": pa.array(surfs, type=pa.string()),
            "etype": pa.array(etypes, type=pa.string()),
            "ids": pa.array(ids, type=pa.list_(pa.string())),
        }
    )


def from_pubtator(lines: "ray.data.Dataset") -> "ray.data.Dataset":
    """PubTator line Dataset (column `line`) -> mentions Dataset."""
    return lines.map_batches(parse_pubtator_batch, batch_format="pyarrow")


def write_outputs(
    clusters: "ray.data.Dataset",
    out_dir: str,
    fmt: str = "parquet",
    partition_by: str | None = None,
) -> None:
    """Sink: partitioned parquet (default) or json lines.

    Ray writes one file per block (natural input-shard partitioning);
    ``partition_by`` additionally hive-partitions by a column (e.g.
    'etype', or a precomputed key-range bucket) so a failed run can
    skip finished partitions and consumers can prune at the read —
    the brief's resumable-output requirement. Never one giant file.
    """
    dens = to_denotations(clusters)
    if fmt == "parquet":
        if partition_by is not None:
            clusters.write_parquet(
                f"{out_dir}/clusters", partition_cols=[partition_by]
            )
        dens.write_parquet(f"{out_dir}/denotations")
    else:
        dens.write_json(f"{out_dir}/denotations")
