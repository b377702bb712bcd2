"""Funnel depth: strictly-after gating on adversarial orderings."""

import pandas as pd

from bern_ray.pipelines.relational import q_event_funnel


def test_funnel_strictly_after(ray_session, tmp_path):
    rows = [
        # u1 full funnel, events arrive out of order
        (1, "2024-01-01 03:00", "purchase"),
        (1, "2024-01-01 01:00", "view"),
        (1, "2024-01-01 02:00", "click"),
        # u2: purchase BEFORE its click -> depth 2 (purchase must not count)
        (2, "2024-01-01 01:00", "view"),
        (2, "2024-01-01 01:30", "purchase"),
        (2, "2024-01-01 02:00", "click"),
        # u3: click with no prior view -> depth 0
        (3, "2024-01-01 01:00", "click"),
        (3, "2024-01-01 02:00", "purchase"),
        # u4: view only
        (4, "2024-01-01 01:00", "view"),
        # u5: click at EXACTLY the view ts -> strict > rejects it
        (5, "2024-01-01 01:00", "view"),
        (5, "2024-01-01 01:00", "click"),
        # u6: second, later view chain must not help once the first
        # view anchors (greedy-earliest is still maximal: the later
        # click satisfies "after first view" too)
        (6, "2024-01-01 01:00", "view"),
        (6, "2024-01-01 05:00", "view"),
        (6, "2024-01-01 06:00", "click"),
        (6, "2024-01-01 07:00", "purchase"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    df["ts"] = pd.to_datetime(df["ts"])
    df["event_id"] = range(len(df))
    df["value"] = 1.0
    df["props"] = "{}"
    df = df[["event_id", "ts", "user_id", "event_type", "value", "props"]]
    df.to_parquet(tmp_path / "events.parquet", index=False)
    out = (
        q_event_funnel(str(tmp_path))
        .to_pandas()
        .set_index("user_id")["depth"]
        .to_dict()
    )
    assert out == {1: 3, 2: 2, 3: 0, 4: 1, 5: 1, 6: 3}
