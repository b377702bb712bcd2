"""Webtext corpus-hygiene operators (training-data pipeline family).

Four operators a Common-Crawl-scale pipeline runs between crawl and
training, each with a DuckDB-mirrorable contract (the oracle gate):

- `pii_redact` — regex redaction of emails / phones / IPv4 with
  per-type counts.  The synthetic corpus has no PII, so both sides
  plant deterministic PII (a pure function of doc_id) before
  redacting; the kernels under test are the shared RE2 patterns.
- `passage_dedup` — C4-style exact duplicate removal at passage
  granularity (non-overlapping 20-word windows), global keep-FIRST by
  (doc_id, passage_idx).  Scale shape: one shuffle keyed by the
  passage digest with a partial min-combine per batch; per-doc totals
  ride a tag-union into one tiny groupby — no join barrier.
- `domain_stats` — per-host rollup parsed from the pages URL
  (partial combine per batch -> tiny groupby; the reference never
  aggregates by site, this is the webtext-native equivalent of its
  per-doc count rollups, server.py:526-538).
- `contamination` — benchmark n-gram decontamination: distinct
  5-gram overlap between each corpus doc and a (small) benchmark
  subset.  The benchmark side is BROADCAST (ray.put once, set lookup
  per batch) — a test set is small by definition, so the main corpus
  pass is shuffle-free; the oracle mirrors it as an unnest + join.

All per-batch loops are per-DOCUMENT (token work is regex-kernel or
list slicing), matching the textstats family style.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Max, Min, Sum

from bern_ray.stages.broadcast import get_broadcast, put_broadcast

# ------------------------------------------------------------- pii

# RE2-compatible (no lookahead) — Arrow and DuckDB compile these
# verbatim, so the redaction is definitionally identical.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\(\d{3}\) \d{3}-\d{4}"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def plant_pii(doc_id: int, text: str) -> str:
    """Deterministic PII planting (pure function of doc_id); the SQL
    mirror constructs the identical string."""
    s = text
    if doc_id % 2 == 0:
        s += f" contact user{doc_id}@mail{doc_id % 7}.example.com"
    if doc_id % 3 == 0:
        s += f" call (555) {100 + doc_id % 900}-{1000 + doc_id % 9000}"
    if doc_id % 5 == 0:
        s += f" from 10.{doc_id % 256}.{(doc_id * 7) % 256}.{1 + doc_id % 100}"
    return s


def pii_plant_sql(text_expr: str = "text") -> str:
    return f"""{text_expr}
    || CASE WHEN doc_id % 2 = 0
         THEN ' contact user' || doc_id || '@mail' || (doc_id % 7) || '.example.com'
         ELSE '' END
    || CASE WHEN doc_id % 3 = 0
         THEN ' call (555) ' || (100 + doc_id % 900) || '-' || (1000 + doc_id % 9000)
         ELSE '' END
    || CASE WHEN doc_id % 5 = 0
         THEN ' from 10.' || (doc_id % 256) || '.' || ((doc_id * 7) % 256) || '.' || (1 + doc_id % 100)
         ELSE '' END"""


def pii_redact_batch(t: pa.Table) -> pa.Table:
    """Vectorized count + redact over one Arrow batch."""
    planted = pa.array(
        [
            plant_pii(d, s or "")
            for d, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
        ],
        type=pa.string(),
    )
    n_emails = pc.count_substring_regex(planted, EMAIL_RE)
    n_phones = pc.count_substring_regex(planted, PHONE_RE)
    n_ips = pc.count_substring_regex(planted, IP_RE)
    red = pc.replace_substring_regex(planted, EMAIL_RE, "[EMAIL]")
    red = pc.replace_substring_regex(red, PHONE_RE, "[PHONE]")
    red = pc.replace_substring_regex(red, IP_RE, "[IP]")
    md5 = [
        hashlib.md5(s.encode("utf-8")).hexdigest() for s in red.to_pylist()
    ]
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_emails": pc.cast(n_emails, pa.int64()),
            "n_phones": pc.cast(n_phones, pa.int64()),
            "n_ips": pc.cast(n_ips, pa.int64()),
            "redacted_md5": pa.array(md5, type=pa.string()),
        }
    )


def pii_redact(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    return docs.map_batches(pii_redact_batch, batch_format="pyarrow")


def pii_redact_sql() -> str:
    # DuckDB regexp_replace needs the 'g' flag for replace-all
    s = "(" + pii_plant_sql() + ")"
    red = f"regexp_replace({s}, '{EMAIL_RE}', '[EMAIL]', 'g')"
    red = f"regexp_replace({red}, '{PHONE_RE}', '[PHONE]', 'g')"
    red = f"regexp_replace({red}, '{IP_RE}', '[IP]', 'g')"
    return f"""
SELECT doc_id,
       len(regexp_extract_all({s}, '{EMAIL_RE}'))::BIGINT AS n_emails,
       len(regexp_extract_all({s}, '{PHONE_RE}'))::BIGINT AS n_phones,
       len(regexp_extract_all({s}, '{IP_RE}'))::BIGINT AS n_ips,
       md5({red}) AS redacted_md5
FROM documents
"""


# --------------------------------------------------- passage dedup

WORD_RE = r"[0-9a-z]+"
PASSAGE_WORDS = 20
_RANK_BASE = 1_000_000

# exactly PASSAGE_WORDS words each, so passage 0 of every doc sharing
# a variant is byte-identical — the planted cross-doc duplicates
BOILERPLATE = [
    "standard corpus header variant zero quality filter pipeline "
    "shared boilerplate text repeated across many documents for "
    "dedup testing coverage pass",
    "standard corpus header variant one quality filter pipeline "
    "shared boilerplate text repeated across many documents for "
    "dedup testing coverage pass",
    "standard corpus header variant two quality filter pipeline "
    "shared boilerplate text repeated across many documents for "
    "dedup testing coverage pass",
    "standard corpus header variant three quality filter pipeline "
    "shared boilerplate text repeated across many documents for "
    "dedup testing coverage pass",
]


def boilerplate_sql(text_expr: str = "text") -> str:
    cases = " ".join(
        f"WHEN {v} THEN '{b}'" for v, b in enumerate(BOILERPLATE)
    )
    return f"(CASE doc_id % 4 {cases} END || ' ' || {text_expr})"


def _passages(words: list[str]) -> list[str]:
    return [
        " ".join(words[i : i + PASSAGE_WORDS])
        for i in range(0, len(words), PASSAGE_WORDS)
    ]


def passage_dedup(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, n_passages, n_kept): keep-first exact passage dedup.

    One passage-keyed shuffle (digest + partial min-combine per
    batch); winner ranks decode back to doc_id arithmetically, so the
    per-doc totals need only a tag-union + one tiny groupby(doc_id).
    """
    import re

    word_re = re.compile(WORD_RE)

    def emit(t: pa.Table) -> pa.Table:
        # partial combine: one row per distinct passage per batch
        best: dict[str, int] = {}
        totals: list[tuple[int, int]] = []
        for doc_id, s in zip(
            t["doc_id"].to_pylist(), t["text"].to_pylist()
        ):
            s2 = BOILERPLATE[doc_id % 4] + " " + (s or "")
            ps = _passages(word_re.findall(s2.lower()))
            totals.append((doc_id, len(ps)))
            for pidx, p in enumerate(ps):
                d = hashlib.md5(p.encode("utf-8")).hexdigest()
                r = doc_id * _RANK_BASE + pidx
                if d not in best or r < best[d]:
                    best[d] = r
        return pa.table(
            {
                "digest": pa.array(list(best.keys()), type=pa.string()),
                "partial": pa.array(list(best.values()), type=pa.int64()),
            }
        )

    def emit_totals(t: pa.Table) -> pa.Table:
        rows = []
        for doc_id, s in zip(
            t["doc_id"].to_pylist(), t["text"].to_pylist()
        ):
            s2 = BOILERPLATE[doc_id % 4] + " " + (s or "")
            n = len(_passages(word_re.findall(s2.lower())))
            rows.append((doc_id, n))
        ids, ns = zip(*rows) if rows else ((), ())
        return pa.table(
            {
                "doc_id": pa.array(list(ids), type=pa.int64()),
                "n_passages": pa.array(list(ns), type=pa.int64()),
                "n_kept": pa.array([0] * len(rows), type=pa.int64()),
            }
        )

    winners = (
        docs.map_batches(emit, batch_format="pyarrow")
        .groupby("digest")
        .min("partial")
    )

    def kept_counts(t: pa.Table) -> pa.Table:
        # winner rank decodes to its keeper doc arithmetically
        doc = pc.divide(t["min(partial)"], _RANK_BASE)
        vc = pc.value_counts(doc.combine_chunks())
        n = len(vc)
        return pa.table(
            {
                "doc_id": pc.cast(vc.field("values"), pa.int64()),
                "n_passages": pa.array(
                    np.zeros(n, dtype=np.int64), type=pa.int64()
                ),
                "n_kept": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    kept = winners.map_batches(kept_counts, batch_format="pyarrow")
    totals = docs.map_batches(emit_totals, batch_format="pyarrow")
    return (
        totals.union(kept)
        .groupby("doc_id")
        .aggregate(
            Sum("n_passages", alias_name="n_passages"),
            Sum("n_kept", alias_name="n_kept"),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "doc_id": t["doc_id"],
                    "n_passages": pc.cast(t["n_passages"], pa.int64()),
                    "n_kept": pc.cast(t["n_kept"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def passage_dedup_sql() -> str:
    return f"""
WITH d2 AS (
  SELECT doc_id, {boilerplate_sql()} AS t FROM documents
),
w AS (
  SELECT doc_id, regexp_extract_all(lower(t), '{WORD_RE}') AS ws FROM d2
),
p AS (
  SELECT doc_id,
         (i - 1) // {PASSAGE_WORDS} AS pidx,
         array_to_string(ws[i:i + {PASSAGE_WORDS} - 1], ' ') AS passage
  FROM w, UNNEST(generate_series(1, len(ws), {PASSAGE_WORDS})) AS s(i)
),
r AS (
  SELECT doc_id, passage, doc_id * {_RANK_BASE} + pidx AS rank FROM p
),
k AS (SELECT passage, min(rank) AS mrank FROM r GROUP BY passage)
SELECT r.doc_id,
       count(*)::BIGINT AS n_passages,
       sum(CASE WHEN r.rank = k.mrank THEN 1 ELSE 0 END)::BIGINT AS n_kept
FROM r JOIN k USING (passage)
GROUP BY r.doc_id
"""


# --------------------------------------------------- domain stats

HOST_RE = r"^https?://([^/]+)/"
PATH_DOC_RE = r"/p/(\d+)$"


def domain_stats(pages: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-host page rollup parsed from the URL: n_pages + min/max doc
    number in the path.  Partial combine per batch, tiny groupby."""

    def partial(t: pa.Table) -> pa.Table:
        u = pd.Series(t["url"].to_pylist())
        df = pd.DataFrame(
            {
                "host": u.str.extract(r"^https?://([^/]+)/", expand=False),
                "doc": u.str.extract(r"/p/(\d+)$", expand=False).astype(
                    np.int64
                ),
            }
        )
        g = df.groupby("host", as_index=False).agg(
            n=("doc", "size"), mn=("doc", "min"), mx=("doc", "max")
        )
        return pa.table(
            {
                "host": pa.array(g["host"], type=pa.string()),
                "n": pa.array(g["n"].astype(np.int64), type=pa.int64()),
                "mn": pa.array(g["mn"], type=pa.int64()),
                "mx": pa.array(g["mx"], type=pa.int64()),
            }
        )

    agg = (
        pages.map_batches(partial, batch_format="pyarrow")
        .groupby("host")
        .aggregate(
            Sum("n", alias_name="n_pages"),
            Min("mn", alias_name="min_doc"),
            Max("mx", alias_name="max_doc"),
        )
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "host": t["host"],
                "n_pages": pc.cast(t["n_pages"], pa.int64()),
                "min_doc": pc.cast(t["min_doc"], pa.int64()),
                "max_doc": pc.cast(t["max_doc"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def domain_stats_sql() -> str:
    # the oracle reconstructs the deterministic pages URL from
    # documents (sources/pages.py url_of) and parses it back the same
    # way the Ray side parses the real pages column
    return """
WITH pages AS (
  SELECT 'https://site' || (doc_id % 50) || '.example/p/' || doc_id AS url
  FROM documents
)
SELECT regexp_extract(url, '^https?://([^/]+)/', 1) AS host,
       count(*)::BIGINT AS n_pages,
       min(regexp_extract(url, '/p/(\\d+)$', 1)::BIGINT) AS min_doc,
       max(regexp_extract(url, '/p/(\\d+)$', 1)::BIGINT) AS max_doc
FROM pages
GROUP BY 1
"""


# -------------------------------------------------- contamination

NGRAM_N = 5
BENCH_MOD = 53
CONTAM_PHRASE = (
    "shared benchmark evaluation passage leaks into training corpus "
    "verbatim today"
)
CONTAM_MOD = 7
CONTAM_REM = 3


def contam_text_sql(text_expr: str = "text") -> str:
    return (
        f"({text_expr} || CASE WHEN doc_id % {CONTAM_MOD} = {CONTAM_REM} "
        f"OR doc_id % {BENCH_MOD} = 0 THEN ' {CONTAM_PHRASE}' ELSE '' END)"
    )


def _contam_text(doc_id: int, text: str) -> str:
    if doc_id % CONTAM_MOD == CONTAM_REM or doc_id % BENCH_MOD == 0:
        return (text or "") + " " + CONTAM_PHRASE
    return text or ""


def _grams(words: list[str]) -> list[str]:
    n = NGRAM_N
    return [
        " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
    ]


def contamination(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Distinct 5-gram overlap of each corpus doc vs the benchmark
    subset (doc_id % BENCH_MOD == 0).  Benchmark grams are collected
    once (small by definition) and broadcast; the corpus pass is
    shuffle-free set membership."""
    import re

    word_re = re.compile(WORD_RE)

    def bench_grams(t: pa.Table) -> pa.Table:
        out: set[str] = set()
        for doc_id, s in zip(
            t["doc_id"].to_pylist(), t["text"].to_pylist()
        ):
            if doc_id % BENCH_MOD != 0:
                continue
            out.update(
                _grams(word_re.findall(_contam_text(doc_id, s).lower()))
            )
        return pa.table({"gram": pa.array(sorted(out), type=pa.string())})

    bench = set(
        docs.map_batches(bench_grams, batch_format="pyarrow").unique("gram")
    )
    bench_ref = put_broadcast(bench)

    def score(t: pa.Table) -> pa.Table:
        bg = get_broadcast(bench_ref)
        ids, shared = [], []
        for doc_id, s in zip(
            t["doc_id"].to_pylist(), t["text"].to_pylist()
        ):
            if doc_id % BENCH_MOD == 0:
                continue  # benchmark rows are not scored
            gs = set(
                _grams(word_re.findall(_contam_text(doc_id, s).lower()))
            )
            ids.append(doc_id)
            shared.append(len(gs & bg))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_shared": pa.array(shared, type=pa.int64()),
                "contaminated": pa.array(
                    [n > 0 for n in shared], type=pa.bool_()
                ),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def contamination_sql() -> str:
    t2 = contam_text_sql()
    return f"""
WITH d2 AS (SELECT doc_id, {t2} AS t FROM documents),
w AS (SELECT doc_id, regexp_extract_all(lower(t), '{WORD_RE}') AS ws FROM d2),
g AS (
  SELECT DISTINCT doc_id,
         array_to_string(ws[i:i + {NGRAM_N} - 1], ' ') AS gram
  FROM w, UNNEST(generate_series(1, len(ws) - {NGRAM_N} + 1)) AS s(i)
),
bench AS (
  SELECT DISTINCT gram FROM g WHERE doc_id % {BENCH_MOD} = 0
),
hits AS (
  SELECT g.doc_id, count(*)::BIGINT AS n_shared
  FROM g JOIN bench USING (gram)
  WHERE g.doc_id % {BENCH_MOD} <> 0
  GROUP BY g.doc_id
)
SELECT d.doc_id,
       coalesce(h.n_shared, 0)::BIGINT AS n_shared,
       coalesce(h.n_shared, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE d.doc_id % {BENCH_MOD} <> 0
"""


# ----------------------------------------------- url canonicalization

# Messy-URL planting: a pure function of doc_id exercising every rule
# (scheme case, host case, default port, tracking params, fragment,
# trailing slash). The corpus pages URL is clean by construction, so
# both sides plant the same mess and the kernels are the surface under
# test — same pattern as pii_redact.
_TRACK_PARAMS = ("utm_source", "utm_medium", "utm_campaign", "ref")


def plant_url(doc_id: int) -> str:
    host = f"Site{doc_id % 50}.Example"
    url = f"{'HTTPS' if doc_id % 2 == 0 else 'http'}://{host}"
    if doc_id % 3 == 0:
        url += ":443" if doc_id % 2 == 0 else ":80"
    url += f"/Articles/p/{doc_id}"
    if doc_id % 4 == 0:
        url += "/"
    q = []
    if doc_id % 5 == 0:
        q.append(f"utm_source=feed{doc_id % 3}")
    if doc_id % 7 == 0:
        q.append(f"id={doc_id}")
    if doc_id % 5 == 2:
        q.append("ref=sidebar")
    if q:
        url += "?" + "&".join(q)
    if doc_id % 6 == 0:
        url += "#section-2"
    return url


def plant_url_sql() -> str:
    return """(
      CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'http' END
      || '://Site' || (doc_id % 50) || '.Example'
      || CASE WHEN doc_id % 3 = 0
              THEN CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE ':80' END
              ELSE '' END
      || '/Articles/p/' || doc_id
      || CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END
      || CASE WHEN len(concat_ws('&',
              CASE WHEN doc_id % 5 = 0 THEN 'utm_source=feed' || (doc_id % 3) END,
              CASE WHEN doc_id % 7 = 0 THEN 'id=' || doc_id END,
              CASE WHEN doc_id % 5 = 2 THEN 'ref=sidebar' END)) > 0
           THEN '?' || concat_ws('&',
              CASE WHEN doc_id % 5 = 0 THEN 'utm_source=feed' || (doc_id % 3) END,
              CASE WHEN doc_id % 7 = 0 THEN 'id=' || doc_id END,
              CASE WHEN doc_id % 5 = 2 THEN 'ref=sidebar' END)
           ELSE '' END
      || CASE WHEN doc_id % 6 = 0 THEN '#section-2' ELSE '' END
    )"""


def canonicalize_urls(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Canonical URL per doc: lowercase scheme+host, strip default
    ports (:80 http / :443 https), drop tracking query params
    (utm_*, ref), strip fragments and trailing slashes. Stateless
    shuffle-free map_batches — the dedup-key step that precedes any
    URL-level dedup in a crawl pipeline."""
    import re

    split_re = re.compile(
        r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<host>[^/?#:]+)"
        r"(?::(?P<port>\d+))?(?P<path>[^?#]*)"
        r"(?:\?(?P<query>[^#]*))?(?:#.*)?$"
    )

    def canon_one(u: str) -> str:
        m = split_re.match(u)
        if m is None:
            return u
        scheme = m.group("scheme").lower()
        host = m.group("host").lower()
        port = m.group("port")
        path = m.group("path") or ""
        query = m.group("query")
        if port and not (
            (scheme == "http" and port == "80")
            or (scheme == "https" and port == "443")
        ):
            host += ":" + port
        path = path.rstrip("/")
        out = f"{scheme}://{host}{path}"
        if query:
            kept = [
                p
                for p in query.split("&")
                if p and p.split("=", 1)[0] not in _TRACK_PARAMS
            ]
            if kept:
                out += "?" + "&".join(kept)
        return out

    def batch(t: pa.Table) -> pa.Table:
        urls = [plant_url(d) for d in t["doc_id"].to_pylist()]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "url": pa.array(urls, type=pa.string()),
                "canonical_url": pa.array(
                    [canon_one(u) for u in urls], type=pa.string()
                ),
            }
        )

    return docs.map_batches(batch, batch_format="pyarrow")


def canonicalize_urls_sql() -> str:
    u = plant_url_sql()
    return f"""
WITH raw AS (SELECT doc_id, {u} AS url FROM documents),
parts AS (
  SELECT doc_id, url,
         lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
         lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)', 1)) AS host,
         regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#:]+:(\\d+)', 1) AS port,
         rtrim(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1), '/') AS path,
         regexp_extract(url, '\\?([^#]*)', 1) AS query
  FROM raw
),
q AS (
  SELECT doc_id, url, scheme, host, port, path,
         array_to_string(list_filter(
           string_split(query, '&'),
           p -> len(p) > 0 AND NOT list_contains(
             ['utm_source','utm_medium','utm_campaign','ref'],
             string_split(p, '=')[1])
         ), '&') AS kept
  FROM parts
)
SELECT doc_id, url,
       scheme || '://' || host
       || CASE WHEN len(port) > 0
               AND NOT (scheme = 'http' AND port = '80')
               AND NOT (scheme = 'https' AND port = '443')
               THEN ':' || port ELSE '' END
       || path
       || CASE WHEN len(kept) > 0 THEN '?' || kept ELSE '' END
       AS canonical_url
FROM q
"""
