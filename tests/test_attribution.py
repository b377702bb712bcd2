"""attribution: hand-built event sequences — last prior touch wins,
non-touch events (error) are transparent, purchases with no prior
touch fall to 'direct', and same-timestamp ties order by event_id."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bern_ray.pipelines.relational import q_attribution


@pytest.mark.usefixtures("ray_session")
def test_planted_sequences(tmp_path):
    # (event_id, user, type, ts_us, value)
    rows = [
        # user 1: click -> error -> purchase  => click credited
        (1, 1, "click", 100, 0.0),
        (2, 1, "error", 200, 0.0),
        (3, 1, "purchase", 300, 10.0),
        # user 2: purchase first => direct; then view -> purchase
        (4, 2, "purchase", 100, 5.0),
        (5, 2, "view", 200, 0.0),
        (6, 2, "purchase", 300, 7.0),
        # user 3: tie at ts=100 — event_id orders click(7) before
        # purchase(8) => click credited
        (7, 3, "click", 100, 0.0),
        (8, 3, "purchase", 100, 3.0),
        # user 4: signup long before => still credited (no window)
        (9, 4, "signup", 1, 0.0),
        (10, 4, "purchase", 99999, 2.0),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array(
                [r[3] for r in rows], type=pa.timestamp("us")
            ),
            "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "event_type": pa.array(
                [r[2] for r in rows], type=pa.string()
            ),
            "value": pa.array([r[4] for r in rows], type=pa.float64()),
            "props": pa.array(["{}"] * len(rows), type=pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet", row_group_size=3)

    got = (
        q_attribution(str(tmp_path))
        .to_pandas()
        .set_index("channel")
        .sort_index()
    )
    assert got.loc["click", "n_purchases"] == 2  # users 1 and 3
    assert got.loc["click", "revenue"] == pytest.approx(13.0)
    assert got.loc["direct", "n_purchases"] == 1
    assert got.loc["direct", "revenue"] == pytest.approx(5.0)
    assert got.loc["view", "revenue"] == pytest.approx(7.0)
    assert got.loc["signup", "revenue"] == pytest.approx(2.0)
