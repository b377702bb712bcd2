"""Webtext hygiene operators (functions/webtext.py) ground truth.

The oracle gate covers value equality vs DuckDB; these tests pin the
semantics directly: planted PII is found and redacted, keep-first
passage dedup keeps exactly one copy of each boilerplate variant,
contamination flags exactly the planted docs, and the benchmark side
of contamination stays broadcast-small."""

import pyarrow as pa
import pytest

from bern_ray.functions.webtext import (
    BENCH_MOD,
    BOILERPLATE,
    CONTAM_MOD,
    CONTAM_REM,
    PASSAGE_WORDS,
    plant_pii,
)


def test_boilerplate_is_exactly_one_passage():
    # the planted duplicates only work if every variant is exactly one
    # full window
    for b in BOILERPLATE:
        assert len(b.split()) == PASSAGE_WORDS


def test_plant_pii_deterministic():
    s = plant_pii(30, "base")
    # 30 hits all three mods
    assert "user30@mail2.example.com" in s
    assert "(555) 130-1030" in s
    assert "10.30.210.31" in s
    assert plant_pii(1, "base") == "base"


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data

    return ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )


def test_pii_redact(docs_ds):
    from bern_ray.functions.webtext import pii_redact

    out = pii_redact(docs_ds).to_pandas().set_index("doc_id")
    # planted counts are a pure function of doc_id
    assert out.loc[30, "n_emails"] == 1
    assert out.loc[30, "n_phones"] == 1
    assert out.loc[30, "n_ips"] == 1
    assert out.loc[1, ["n_emails", "n_phones", "n_ips"]].sum() == 0
    assert out["redacted_md5"].str.len().eq(32).all()


def _load_docs():
    import pyarrow.parquet as pq

    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"],
    )
    return list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def test_passage_dedup_keep_first(docs_ds):
    import re

    from bern_ray.functions.webtext import passage_dedup

    out = passage_dedup(docs_ds).to_pandas().set_index("doc_id")
    assert len(out) == docs_ds.count()

    # exact serial reference: global keep-first over (doc_id, pidx)
    word_re = re.compile(r"[0-9a-z]+")
    seen: set[str] = set()
    exp_pass: dict[int, int] = {}
    exp_kept: dict[int, int] = {}
    for doc_id, s in sorted(_load_docs()):
        words = word_re.findall(
            (BOILERPLATE[doc_id % 4] + " " + (s or "")).lower()
        )
        ps = [
            " ".join(words[i : i + PASSAGE_WORDS])
            for i in range(0, len(words), PASSAGE_WORDS)
        ]
        exp_pass[doc_id] = len(ps)
        kept = 0
        for p in ps:
            if p not in seen:
                seen.add(p)
                kept += 1
        exp_kept[doc_id] = kept
    assert out["n_passages"].to_dict() == exp_pass
    assert out["n_kept"].to_dict() == exp_kept
    # the planted duplicates actually exercised the keep-first path
    dropped = out["n_passages"] - out["n_kept"]
    assert dropped.sum() >= len(out) - 4


def test_contamination_flags_planted_docs(docs_ds):
    import re

    from bern_ray.functions.webtext import _contam_text, contamination

    out = contamination(docs_ds).to_pandas().set_index("doc_id")
    # benchmark docs are excluded from the output
    assert not any(i % BENCH_MOD == 0 for i in out.index)

    # exact serial reference
    word_re = re.compile(r"[0-9a-z]+")

    def grams(doc_id, s):
        ws = word_re.findall(_contam_text(doc_id, s).lower())
        return {
            " ".join(ws[i : i + 5]) for i in range(len(ws) - 4)
        }

    docs = _load_docs()
    bench = set()
    for doc_id, s in docs:
        if doc_id % BENCH_MOD == 0:
            bench |= grams(doc_id, s)
    for doc_id, s in docs:
        if doc_id % BENCH_MOD == 0:
            continue
        assert out.loc[doc_id, "n_shared"] == len(grams(doc_id, s) & bench)
    planted = [
        i
        for i in out.index
        if i % CONTAM_MOD == CONTAM_REM and i % BENCH_MOD != 0
    ]
    assert planted, "corpus should contain planted contaminated docs"
    assert out.loc[planted, "contaminated"].all()
    # 10-word phrase -> at least 6 interior 5-grams shared
    assert (out.loc[planted, "n_shared"] >= 6).all()


def test_domain_stats(ray_session):
    from bern_ray.functions.webtext import domain_stats
    from bern_ray.sources.pages import read_pages

    out = domain_stats(read_pages("/root/testdata/sf0.001")).to_pandas()
    assert len(out) == 50  # url_of: doc_id % 50 hosts
    assert out["n_pages"].sum() == 500
    row = out[out["host"] == "site7.example"].iloc[0]
    assert row["min_doc"] == 7
    assert row["max_doc"] == 457


def test_canonicalize_urls_rules(docs_ds):
    from bern_ray.functions.webtext import canonicalize_urls

    out = (
        canonicalize_urls(docs_ds).to_pandas().set_index("doc_id")
    )
    # doc 0: HTTPS://Site0.Example:443/Articles/p/0/?utm_source=feed0&id=0#section-2
    c0 = out.loc[0, "canonical_url"]
    assert c0 == "https://site0.example/articles/p/0?id=0".replace(
        "/articles/", "/Articles/"
    )  # path case is PRESERVED, host/scheme lowered
    # default port stripped, tracking param dropped, fragment gone
    assert ":443" not in c0 and "utm_" not in c0 and "#" not in c0
    # doc 1: http://Site1.Example/Articles/p/1 -> lowercased host only
    assert out.loc[1, "canonical_url"] == "http://site1.example/Articles/p/1"
    # doc 12 (%4==0, %3==0, %2==0, %6==0): trailing slash + :443 + fragment
    c12 = out.loc[12, "canonical_url"]
    assert c12.endswith("/Articles/p/12") and "#" not in c12
    # non-default port survives: none planted, so assert rule directly
    # via doc 2 (%5==2 -> ref=sidebar dropped; %2==0 -> https)
    c2 = out.loc[2, "canonical_url"]
    assert "ref=" not in c2 and c2.startswith("https://site2.example")


def test_langid_trigram_planted():
    """Trigram-cosine language ID labels planted de/es/fr/en snippets
    correctly — including words NOT in any seed list (sub-word
    generalization the stopword vote cannot do) — and reports 'und'
    on empty/no-letter docs."""
    import pyarrow as pa

    from bern_ray.functions.textstats import langid_trigram_batch

    docs = [
        ("the children were walking to school in the morning", "en"),
        ("die kinder gingen morgens zur schule und lernten dort", "de"),
        ("los niños caminaban a la escuela por la mañana", "es"),
        ("les enfants marchaient vers l'école le matin", "fr"),
        ("", "und"),
        ("12345 67890 !!!", "und"),
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), type=pa.int64()),
            "text": pa.array([d for d, _ in docs], type=pa.string()),
        }
    )
    out = langid_trigram_batch(t)
    assert out["pred_lang"].to_pylist() == [lang for _, lang in docs]
    conf = out["confidence"].to_pylist()
    assert all(c > 0.15 for c in conf[:4]) and conf[4] == 0.0
