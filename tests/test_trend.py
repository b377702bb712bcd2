"""Per-group regression slope: planted exact linear data."""

import numpy as np
import pandas as pd

from bern_ray.pipelines.relational import q_segment_trend


def test_segment_trend_planted_slopes(ray_session, tmp_path):
    rng = np.random.default_rng(4)
    rows = []
    # segment A: exact slope 12.5 $/day; segment B: slope -3.25 with noise
    for seg, slope, noise in (("A", 12.5, 0.0), ("B", -3.25, 1.0)):
        days = rng.choice(np.arange(0, 400), size=300, replace=True)
        y = 250000.0 + slope * days + noise * rng.normal(size=300).round(2)
        for d, v in zip(days, y):
            rows.append((seg, d, round(float(v), 2)))
    cust = pd.DataFrame(
        {
            "c_custkey": [0, 1],
            "c_name": ["x", "y"],
            "c_nationkey": [0, 0],
            "c_mktsegment": ["A", "B"],
        }
    )
    seg_to_cust = {"A": 0, "B": 1}
    orders = pd.DataFrame(
        {
            "o_orderkey": range(len(rows)),
            "o_custkey": [seg_to_cust[s] for s, _, _ in rows],
            "o_orderstatus": "F",
            "o_totalprice": [v for _, _, v in rows],
            "o_orderdate": pd.to_datetime("2024-01-01")
            + pd.to_timedelta([int(d) for _, d, _ in rows], unit="D"),
            "o_orderpriority": "1",
        }
    )
    orders["o_orderdate"] = orders["o_orderdate"].astype("datetime64[us]")
    cust.to_parquet(tmp_path / "customer.parquet", index=False)
    orders.to_parquet(tmp_path / "orders.parquet", index=False)
    out = (
        q_segment_trend(str(tmp_path))
        .to_pandas()
        .set_index("c_mktsegment")
    )
    assert out.loc["A", "slope"] == 12.5
    # B: compare to the dense polyfit slope on the same data
    mask = orders["o_custkey"] == 1
    x = (
        orders.loc[mask, "o_orderdate"].astype("int64") / 86400e6
    ).to_numpy()
    y = orders.loc[mask, "o_totalprice"].to_numpy()
    exp = np.polyfit(x, y, 1)[0]
    assert abs(out.loc["B", "slope"] - exp) < 1e-6
    assert (out["n_orders"] == 300).all()
