"""gap_fill: hand-built series — exact interpolated values across a
multi-day gap, same-day totals, no extrapolation beyond the observed
span, and single-observation users emitting one unfilled row."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bern_ray.pipelines.relational import q_gap_fill

DAY = 86_400_000_000


def _write(tmp_path, rows):
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), type=pa.int64()),
            "ts": pa.array(
                [r[2] for r in rows], type=pa.timestamp("us")
            ),
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "event_type": pa.array(
                [r[1] for r in rows], type=pa.string()
            ),
            "value": pa.array([r[3] for r in rows], type=pa.float64()),
            "props": pa.array(["{}"] * len(rows), type=pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet", row_group_size=3)


@pytest.mark.usefixtures("ray_session")
def test_interpolation_and_spans(tmp_path):
    rows = [
        # user 1: day 0 -> 10.0, day 3 -> 40.0; gap days 1, 2
        (1, "view", 0 * DAY + 5, 10.0),
        (1, "view", 3 * DAY + 7, 40.0),
        # user 1 day 0 has a second view: day TOTAL 10+20 = 30
        (1, "view", 0 * DAY + 9, 20.0),
        # user 2: single observation -> one row, no fill
        (2, "view", 5 * DAY, 7.0),
        # user 3: only non-view events -> absent entirely
        (3, "purchase", 1 * DAY, 99.0),
    ]
    _write(tmp_path, rows)

    got = (
        q_gap_fill(str(tmp_path))
        .to_pandas()
        .sort_values(["user_id", "day_idx"])
        .reset_index(drop=True)
    )
    u1 = got[got["user_id"] == 1]
    assert list(u1["day_idx"]) == [0, 1, 2, 3]
    # linear from 30 (day-0 total) to 40 (day 3)
    assert list(u1["value"]) == [
        pytest.approx(x, abs=1e-6)
        for x in (30.0, 33.333333, 36.666667, 40.0)
    ]
    assert list(u1["filled"]) == [False, True, True, False]

    u2 = got[got["user_id"] == 2]
    assert list(u2["day_idx"]) == [5]
    assert list(u2["filled"]) == [False]

    assert 3 not in set(got["user_id"])
