"""Per-stage metrics rollup over checkpoint sidecars.

Reference analog: service_checker.py:174-182 aggregates per-stage
latency samples (mean/std/min/max) into an ops report; our equivalent
ops surface is the ``_MANIFEST.json`` sidecar each checkpointed stage
writes (state/checkpoint.py: rows, wall_sec, schema, lineage, content
key). This module rolls those sidecars up into a queryable table —
one row per completed stage — plus on-disk facts (bytes, file count)
read from the stage's Parquet partition directory.

Scale note: sidecars are O(#stages), never O(data) — the rollup is a
driver-side scan of a handful of small JSON files wrapped into a
Dataset for downstream composition.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

import ray.data


def stage_metrics_table(checkpoint_root: str) -> pa.Table:
    """Scan ``{root}/*/_MANIFEST.json`` into one row per stage."""
    rows = []
    if os.path.isdir(checkpoint_root):
        for name in sorted(os.listdir(checkpoint_root)):
            mpath = os.path.join(checkpoint_root, name, "_MANIFEST.json")
            if name.startswith(".tmp-") or not os.path.exists(mpath):
                continue
            try:
                with open(mpath) as f:
                    m = json.load(f)
            except (json.JSONDecodeError, OSError):
                continue
            stage_dir = os.path.join(checkpoint_root, name)
            files = [
                fn
                for fn in os.listdir(stage_dir)
                if fn.endswith(".parquet")
            ]
            nbytes = sum(
                os.path.getsize(os.path.join(stage_dir, fn))
                for fn in files
            )
            wall = float(m.get("wall_sec") or 0.0)
            n = int(m.get("rows") or 0)
            rows.append(
                {
                    "stage": m.get("stage", name),
                    "rows": n,
                    "wall_sec": wall,
                    "rows_per_sec": round(n / wall, 1) if wall > 0 else 0.0,
                    "bytes": nbytes,
                    "n_files": len(files),
                    "n_columns": len(m.get("schema") or []),
                    "lineage": list(m.get("lineage") or []),
                    "content_key": m.get("content_key"),
                }
            )
    return pa.table(
        {
            "stage": pa.array([r["stage"] for r in rows], pa.string()),
            "rows": pa.array([r["rows"] for r in rows], pa.int64()),
            "wall_sec": pa.array(
                [r["wall_sec"] for r in rows], pa.float64()
            ),
            "rows_per_sec": pa.array(
                [r["rows_per_sec"] for r in rows], pa.float64()
            ),
            "bytes": pa.array([r["bytes"] for r in rows], pa.int64()),
            "n_files": pa.array([r["n_files"] for r in rows], pa.int64()),
            "n_columns": pa.array(
                [r["n_columns"] for r in rows], pa.int64()
            ),
            "lineage": pa.array(
                [r["lineage"] for r in rows], pa.list_(pa.string())
            ),
            "content_key": pa.array(
                [r["content_key"] for r in rows], pa.string()
            ),
        }
    )


def cap_metrics_table() -> pa.Table:
    """Session cap/skew counters (state/counters.py) in the
    stage_metrics row shape: one `cap:<name>` row per counter with the
    count in `rows`. SURVEY §7.5's "log what was dropped" surface —
    band caps, per-block pair caps and hot-key salting report here."""
    from .counters import snapshot

    try:
        counts = snapshot()
    except Exception:  # no Ray session (pure-driver contexts)
        counts = {}
    names = sorted(counts)
    return pa.table(
        {
            "stage": pa.array([f"cap:{n}" for n in names], pa.string()),
            "rows": pa.array(
                [int(counts[n]) for n in names], pa.int64()
            ),
            "wall_sec": pa.array([0.0] * len(names), pa.float64()),
            "rows_per_sec": pa.array([0.0] * len(names), pa.float64()),
            "bytes": pa.array([0] * len(names), pa.int64()),
            "n_files": pa.array([0] * len(names), pa.int64()),
            "n_columns": pa.array([0] * len(names), pa.int64()),
            "lineage": pa.array(
                [[] for _ in names], pa.list_(pa.string())
            ),
            "content_key": pa.array([None] * len(names), pa.string()),
        }
    )


def stage_metrics(checkpoint_root: str) -> "ray.data.Dataset":
    t = stage_metrics_table(checkpoint_root)
    caps = cap_metrics_table()
    if caps.num_rows:
        t = pa.concat_tables([t, caps])
    return ray.data.from_arrow(t)
