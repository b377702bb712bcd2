"""chi2_keywords: planted over-represented terms must surface as each
source's top keyword, with the chi-squared value matching a scalar
2x2-contingency reference."""

import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bern_ray.pipelines.relational import (
    CHI2_MIN_CT,
    q_chi2_keywords,
)


def _scalar_chi2(texts, sources, source, token):
    toks = [re.findall("[0-9a-zA-Z]+", t.lower()) for t in texts]
    a = float(
        sum(tk.count(token) for tk, s in zip(toks, sources) if s == source)
    )
    ct = float(sum(tk.count(token) for tk in toks))
    cs = float(sum(len(tk) for tk, s in zip(toks, sources) if s == source))
    n = float(sum(len(tk) for tk in toks))
    b, c, d = ct - a, cs - a, n - ct - cs + a
    return round(
        n * (a * d - b * c) * (a * d - b * c)
        / ((a + b) * (c + d) * (a + c) * (b + d)),
        6,
    )


@pytest.mark.usefixtures("ray_session")
def test_planted_keywords_rank_first(tmp_path):
    # two sources sharing a background vocabulary; each over-uses its
    # own marker far beyond CHI2_MIN_CT occurrences
    rows = []
    for i in range(60):
        src = "feedA" if i % 2 == 0 else "feedB"
        marker = "anchor" if src == "feedA" else "beacon"
        words = ["common", "filler", "words", "here"] * 3 + [marker] * 3
        rows.append((i, " ".join(words), src))
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows], type=pa.string()),
            "lang": pa.array(["en"] * len(rows), type=pa.string()),
            "source": pa.array([r[2] for r in rows], type=pa.string()),
            "n_chars": pa.array(
                [len(r[1]) for r in rows], type=pa.int64()
            ),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet", row_group_size=7)

    got = q_chi2_keywords(str(tmp_path)).to_pandas()
    texts = [r[1] for r in rows]
    sources = [r[2] for r in rows]
    for src, marker in (("feedA", "anchor"), ("feedB", "beacon")):
        first = got[(got["source"] == src) & (got["rk"] == 1)].iloc[0]
        assert first["token"] == marker
        assert first["chi2"] == pytest.approx(
            _scalar_chi2(texts, sources, src, marker), abs=1e-6
        )
    # markers occur 3 * 30 = 90 >= CHI2_MIN_CT, sanity on the constant
    assert 90 >= CHI2_MIN_CT
    # only positively associated terms appear: the other feed's marker
    # never shows up in a source's keyword list
    assert "beacon" not in set(got[got["source"] == "feedA"]["token"])
    assert "anchor" not in set(got[got["source"] == "feedB"]["token"])
