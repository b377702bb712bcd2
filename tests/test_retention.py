"""retention_cohorts: hand-built cohorts — two cohorts with known
week-activity sets produce the exact (cohort, offset) matrix; a user
active twice in one week counts once."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bern_ray.pipelines.relational import WEEK_US, q_retention_cohorts


@pytest.mark.usefixtures("ray_session")
def test_cohort_matrix(tmp_path):
    # cohort week 0: users 1, 2. user 1 active weeks 0,1,2; user 2
    # active weeks 0,2. cohort week 1: user 3 active weeks 1,3.
    acts = [
        (1, 0), (1, 0), (1, 1), (1, 2),  # duplicate week-0 row
        (2, 0), (2, 2),
        (3, 1), (3, 3),
    ]
    rows = [
        (i, u, w * WEEK_US + i * 1000) for i, (u, w) in enumerate(acts)
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array(
                [r[2] for r in rows], type=pa.timestamp("us")
            ),
            "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "event_type": pa.array(["view"] * len(rows)),
            "value": pa.array([0.0] * len(rows), type=pa.float64()),
            "props": pa.array(["{}"] * len(rows), type=pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet", row_group_size=3)

    got = (
        q_retention_cohorts(str(tmp_path))
        .to_pandas()
        .sort_values(["cohort_week", "week_offset"])
        .reset_index(drop=True)
    )
    want = {
        (0, 0): 2,  # users 1, 2 in week 0
        (0, 1): 1,  # user 1
        (0, 2): 2,  # users 1, 2
        (1, 0): 1,  # user 3
        (1, 2): 1,  # user 3 at week 3 = offset 2
    }
    assert {
        (c, o): n
        for c, o, n in zip(
            got["cohort_week"], got["week_offset"], got["n_active_users"]
        )
    } == want
