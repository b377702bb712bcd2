"""PMI collocations vs a brute-force per-doc-set reference."""

import math
import random
from collections import Counter

import pandas as pd

from bern_ray.functions.textstats import pmi_collocations


def _reference(texts, min_df_frac, min_pair_frac):
    import re

    n = len(texts)
    docsets = [set(re.findall("[0-9a-z]+", t.lower())) for t in texts]
    df = Counter()
    for s in docsets:
        df.update(s)
    el = {t for t, c in df.items() if c >= min_df_frac * n}
    cab = Counter()
    for s in docsets:
        toks = sorted(s & el)
        for i in range(len(toks)):
            for j in range(i + 1, len(toks)):
                cab[(toks[i], toks[j])] += 1
    rows = []
    for (a, b), c in cab.items():
        if c >= min_pair_frac * n:
            rows.append(
                {
                    "a": a,
                    "b": b,
                    "c_ab": c,
                    "pmi": round(math.log((c * n) / (df[a] * df[b])), 6),
                }
            )
    return (
        pd.DataFrame(rows)
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )


def test_pmi_planted_collocation(ray_session):
    import ray.data

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    texts = []
    for i in range(120):
        toks = rng.sample(vocab, 4)
        # 'alpha beta' co-occur far beyond chance in half the docs
        if i % 2 == 0:
            toks += ["alpha", "beta"]
        if i % 3 == 0:
            toks.append("alpha")  # alpha alone too -> pmi(alpha,beta) < max
        texts.append(" ".join(toks))
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = ray.data.from_pandas(df).map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    )
    got = (
        pmi_collocations(ds, 0.05, 0.02, num_buckets=8)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    exp = _reference(texts, 0.05, 0.02)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    planted = got[(got.a == "alpha") & (got.b == "beta")]
    assert len(planted) == 1 and planted.iloc[0].pmi > 0
