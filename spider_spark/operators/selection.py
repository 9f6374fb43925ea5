"""Data-selection operators for the training-corpus pipeline: DSIR-style
importance scoring (Xie et al., "Data Selection for Language Models via
Importance Resampling", NeurIPS 2023 — arXiv:2302.03169), Unicode-script
profiling (the writing-system counterpart of t2's stopword language ID),
and URL-canonicalization dedup — the registered-query twin of the crawl
engine's frontier normalizer (spider_spark/urlnorm.py:147
``canonicalize_url``: lowercase scheme+host, strip fragment and default
port, empty path → ``/``; the reference crawls literal ID URLs and never
needs this, a web-scale frontier always does).

Float discipline: everything here is integer-exact — DSIR's importance
ratio is computed as a scaled integer division (``(tgt+1)·10^6 div
(raw+1)``) rather than a log-probability difference, so JVM and DuckDB
agree bit-for-bit with no rounding margin to defend.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spider_spark.operators import load, query, sqlmurmur

# ---------------------------------------------------------------------------
# t25 — DSIR importance scores over hashed unigram buckets
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 256
_DSIR_SCALE = 1_000_000

_T25_ORACLE = f"""
WITH occ AS (
  SELECT doc_id, lang, ((mm % {_DSIR_BUCKETS}) + {_DSIR_BUCKETS}) % {_DSIR_BUCKETS} AS bucket
  FROM (SELECT doc_id, lang, {sqlmurmur.murmur32_string_aliases("tok", "mm", "t25")}
        FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
              FROM documents))
), stats AS (
  SELECT bucket,
         count(*) AS raw_cnt,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tgt_cnt
  FROM occ GROUP BY bucket
), ratio AS (
  SELECT bucket, ((tgt_cnt + 1) * {_DSIR_SCALE}) // (raw_cnt + 1) AS r
  FROM stats
)
SELECT o.doc_id, CAST(sum(r.r) AS BIGINT) AS dsir_score
FROM occ o JOIN ratio r USING (bucket)
GROUP BY o.doc_id
"""


@query("t25_dsir_weights", _T25_ORACLE)
def t25_dsir_weights(spark, sf_dir):
    """DSIR importance scoring (arXiv:2302.03169): hashed-unigram bag
    features, one bucket table for the raw corpus and one for the target
    domain (here lang='en'), per-document importance = sum over token
    occurrences of the per-bucket target/raw ratio. The paper's
    log-probability difference is replaced by an exact scaled integer
    ratio (``(tgt+1)·10^6 div (raw+1)``) so both engines agree bit-for-bit
    — rank order within a document set is preserved under any monotone
    transform, which is all resampling needs.

    Scale shape: the bucket-stats aggregate is map-side combinable down to
    ≤256 partial rows per task; the ratio table is ≤256 rows and broadcast
    back onto the exploded occurrences (no shuffle of the corpus on the
    bucket key); the only corpus-sized exchange is the final per-doc sum on
    doc_id — partial-aggregated before it moves. Two corpus scans total
    (stats pass + scoring pass), never materializing more than
    (doc_id, bucket) pairs."""
    d = load(spark, sf_dir, "documents")
    occ = d.select(
        "doc_id",
        "lang",
        F.explode(F.split("text", " ")).alias("tok"),
    ).select(
        "doc_id",
        "lang",
        F.pmod(F.hash("tok"), F.lit(_DSIR_BUCKETS)).alias("bucket"),
    )
    stats = occ.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("raw_cnt"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("tgt_cnt"),
    )
    ratio = stats.select(
        "bucket",
        F.expr(f"((tgt_cnt + 1) * {_DSIR_SCALE}L) div (raw_cnt + 1)").alias("r"),
    )
    return (
        occ.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(F.sum("r").cast("long").alias("dsir_score"))
    )


# ---------------------------------------------------------------------------
# t26 — Unicode-script profile (writing-system mix + dominant script)
# ---------------------------------------------------------------------------

# Literal-character ranges so Java regex and RE2 see identical codepoints
# (no \\uXXXX vs \\x{XXXX} dialect split). BMP-only, so UTF-16 code units
# (Java) and codepoints (RE2) count identically.
_LATIN = "[A-Za-z]"
_CJK = "[一-龥]"  # U+4E00..U+9FA5
_CYRILLIC = "[А-я]"  # U+0410..U+044F
_ARABIC = "[ء-ي]"  # U+0621..U+064A

_T26_ORACLE = f"""
WITH mixed AS (
  SELECT doc_id,
         text || CASE doc_id % 4
           WHEN 1 THEN ' ' || repeat('中文网页 ', 30 * (1 + (doc_id % 3)::INT))
           WHEN 2 THEN ' ' || repeat('русский текст ', 30 * (1 + (doc_id % 3)::INT))
           WHEN 3 THEN ' ' || repeat('نص عربي ', 30 * (1 + (doc_id % 3)::INT))
           ELSE ''
         END AS t
  FROM documents
), counted AS (
  SELECT doc_id,
         len(regexp_extract_all(t, '{_LATIN}')) AS latin_n,
         len(regexp_extract_all(t, '{_CJK}')) AS cjk_n,
         len(regexp_extract_all(t, '{_CYRILLIC}')) AS cyr_n,
         len(regexp_extract_all(t, '{_ARABIC}')) AS arab_n
  FROM mixed
)
SELECT doc_id,
       CAST(latin_n AS BIGINT) AS latin_n, CAST(cjk_n AS BIGINT) AS cjk_n,
       CAST(cyr_n AS BIGINT) AS cyr_n, CAST(arab_n AS BIGINT) AS arab_n,
       CASE WHEN latin_n >= cjk_n AND latin_n >= cyr_n AND latin_n >= arab_n
              THEN 'latin'
            WHEN cjk_n >= cyr_n AND cjk_n >= arab_n THEN 'cjk'
            WHEN cyr_n >= arab_n THEN 'cyrillic'
            ELSE 'arabic' END AS script
FROM counted
"""


@query("t26_script_profile", _T26_ORACLE)
def t26_script_profile(spark, sf_dir):
    """Writing-system profile: per-script character counts + dominant
    script, the script-level complement to t2's stopword language ID (a
    real crawl triages pages by script before picking a per-language
    pipeline). The ASCII fixture corpus carries no non-Latin text, so CJK /
    Cyrillic / Arabic snippets are appended deterministically from
    doc_id % 4 — identically in both engines, the same mix-in convention
    t12 uses for PII.

    Scale shape: four regexp_count column expressions over the scan —
    whole-stage codegen, no UDF, no exchange (per-row map). Tie-break
    precedence latin > cjk > cyrillic > arabic is written as the same
    CASE chain in both engines."""
    d = load(spark, sf_dir, "documents")
    # 30× multiplier so injected mass rivals the Latin body and the
    # dominant-script verdict genuinely varies across the fixture
    n = (30 * (1 + F.col("doc_id") % 3)).cast("int")
    mixed = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 4 == 1, F.concat(F.lit(" "), F.repeat(F.lit("中文网页 "), n)))
        .when(F.col("doc_id") % 4 == 2, F.concat(F.lit(" "), F.repeat(F.lit("русский текст "), n)))
        .when(F.col("doc_id") % 4 == 3, F.concat(F.lit(" "), F.repeat(F.lit("نص عربي "), n)))
        .otherwise(F.lit("")),
    )
    counted = d.select(
        "doc_id",
        F.regexp_count(mixed, F.lit(_LATIN)).cast("long").alias("latin_n"),
        F.regexp_count(mixed, F.lit(_CJK)).cast("long").alias("cjk_n"),
        F.regexp_count(mixed, F.lit(_CYRILLIC)).cast("long").alias("cyr_n"),
        F.regexp_count(mixed, F.lit(_ARABIC)).cast("long").alias("arab_n"),
    )
    latin, cjk, cyr, arab = (F.col(c) for c in ("latin_n", "cjk_n", "cyr_n", "arab_n"))
    return counted.select(
        "doc_id",
        "latin_n",
        "cjk_n",
        "cyr_n",
        "arab_n",
        F.when((latin >= cjk) & (latin >= cyr) & (latin >= arab), F.lit("latin"))
        .when((cjk >= cyr) & (cjk >= arab), F.lit("cjk"))
        .when(cyr >= arab, F.lit("cyrillic"))
        .otherwise(F.lit("arabic"))
        .alias("script"),
    )


# ---------------------------------------------------------------------------
# d12 — URL-canonicalization dedup (the frontier normalizer as a query)
# ---------------------------------------------------------------------------

# ^scheme://host[:port][path-without-fragment] — fragment excluded by [^#]*.
_URL_RE = "^([A-Za-z]+)://([^/:#]+)(:[0-9]+)?([^#]*)"


def _messy_url_sql() -> str:
    """Deterministic messy-URL synthesis from (source, doc_id): scheme-case
    noise, default and non-default explicit ports, fragments, and empty
    paths — every distortion class ``canonicalize_url`` must normalize."""
    return """
  SELECT doc_id,
         (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END)
         || '://'
         || (CASE WHEN doc_id % 3 = 0 THEN upper(source) || '.EXAMPLE.COM'
                  ELSE source || '.example.com' END)
         || (CASE WHEN doc_id % 4 = 0
                    THEN (CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END)
                  WHEN doc_id % 11 = 0 THEN ':8080'
                  ELSE '' END)
         || (CASE WHEN doc_id % 5 = 0 THEN ''
                  ELSE '/p/' || (doc_id % 7)::VARCHAR END)
         || (CASE WHEN doc_id % 2 = 1 THEN '#sec' || (doc_id % 3)::VARCHAR
                  ELSE '' END) AS url
  FROM documents"""


_D12_ORACLE = f"""
WITH raw AS ({_messy_url_sql()}
), parts AS (
  SELECT doc_id,
         lower(regexp_extract(url, '{_URL_RE}', 1)) AS scheme,
         lower(regexp_extract(url, '{_URL_RE}', 2)) AS host,
         regexp_extract(url, '{_URL_RE}', 3) AS port,
         regexp_extract(url, '{_URL_RE}', 4) AS path
  FROM raw
), canon AS (
  SELECT doc_id,
         scheme || '://' || host
         || (CASE WHEN (scheme = 'http' AND port = ':80')
                    OR (scheme = 'https' AND port = ':443')
                  THEN '' ELSE port END)
         || (CASE WHEN path = '' THEN '/' ELSE path END) AS canonical_url
  FROM parts
)
SELECT canonical_url,
       CAST(min(doc_id) AS BIGINT) AS rep_doc,
       CAST(count(*) AS BIGINT) AS n_variants
FROM canon GROUP BY canonical_url
"""


@query("d12_url_dedup", _D12_ORACLE)
def d12_url_dedup(spark, sf_dir):
    """URL-canonicalization dedup — the registered-query twin of the crawl
    frontier's normalizer (spider_spark/urlnorm.py:147 ``canonicalize_url``):
    lowercase scheme + host, strip the fragment, strip the default port
    (http:80 / https:443, non-default ports kept), empty path → ``/``; then
    first-occurrence per canonical form (min doc_id) plus the collapsed
    variant count. Messy URLs are synthesized deterministically from
    (source, doc_id) — same mix-in convention as t12/t26 — covering every
    distortion class the normalizer handles.

    Scale shape: parse + rebuild is four regexp_extract / CASE column
    expressions in whole-stage codegen (no UDF, no exchange); the dedup is
    one map-side-combinable groupBy on the canonical key — exactly the
    shape the engine's frontier link-dedup uses, minus the bloom
    pre-filter."""
    d = load(spark, sf_dir, "documents")
    host_base = F.concat(F.col("source"), F.lit(".example.com"))
    url = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("HTTP")).otherwise(F.lit("https")),
        F.lit("://"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.upper(F.col("source")), F.lit(".EXAMPLE.COM")),
        ).otherwise(host_base),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.when(F.col("doc_id") % 2 == 0, F.lit(":80")).otherwise(F.lit(":443")),
        )
        .when(F.col("doc_id") % 11 == 0, F.lit(":8080"))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0, F.lit("")).otherwise(
            F.concat(F.lit("/p/"), (F.col("doc_id") % 7).cast("string"))
        ),
        F.when(
            F.col("doc_id") % 2 == 1,
            F.concat(F.lit("#sec"), (F.col("doc_id") % 3).cast("string")),
        ).otherwise(F.lit("")),
    )
    parts = d.select(
        "doc_id",
        F.lower(F.regexp_extract(url, _URL_RE, 1)).alias("scheme"),
        F.lower(F.regexp_extract(url, _URL_RE, 2)).alias("host"),
        F.regexp_extract(url, _URL_RE, 3).alias("port"),
        F.regexp_extract(url, _URL_RE, 4).alias("path"),
    )
    canon = parts.select(
        "doc_id",
        F.concat(
            F.col("scheme"),
            F.lit("://"),
            F.col("host"),
            F.when(
                ((F.col("scheme") == "http") & (F.col("port") == ":80"))
                | ((F.col("scheme") == "https") & (F.col("port") == ":443")),
                F.lit(""),
            ).otherwise(F.col("port")),
            F.when(F.col("path") == "", F.lit("/")).otherwise(F.col("path")),
        ).alias("canonical_url"),
    )
    return canon.groupBy("canonical_url").agg(
        F.min("doc_id").cast("long").alias("rep_doc"),
        F.count(F.lit(1)).cast("long").alias("n_variants"),
    )


# ---------------------------------------------------------------------------
# t28 — corpus mixture drift: per-source token-distribution L1 distance
# from the corpus-wide distribution, in exact ppm integers
# ---------------------------------------------------------------------------

_T28_BUCKETS = 64
_T28_PPM = 1_000_000

_T28_ORACLE = f"""
WITH occ AS (
  SELECT source,
         ((mm % {_T28_BUCKETS}) + {_T28_BUCKETS}) % {_T28_BUCKETS} AS bucket
  FROM (SELECT source, {sqlmurmur.murmur32_string_aliases("tok", "mm", "t28")}
        FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
              FROM documents))
), per AS (
  SELECT source, bucket, count(*) AS c FROM occ GROUP BY source, bucket
), stot AS (
  SELECT source, sum(c) AS s FROM per GROUP BY source
), gmarg AS (
  SELECT bucket, sum(c) AS g FROM per GROUP BY bucket
), gtot AS (
  SELECT sum(c) AS gt FROM per
), grid AS (
  SELECT st.source, r.range AS bucket FROM stot st
  CROSS JOIN range(0, {_T28_BUCKETS}) r
), ppm AS (
  SELECT grid.source,
         CAST(({_T28_PPM} * COALESCE(p.c, 0)) // st.s AS BIGINT) AS sppm,
         CAST(({_T28_PPM} * COALESCE(g.g, 0)) // gt.gt AS BIGINT) AS gppm
  FROM grid
  LEFT JOIN per p ON p.source = grid.source AND p.bucket = grid.bucket
  LEFT JOIN gmarg g ON g.bucket = grid.bucket
  JOIN stot st ON st.source = grid.source
  CROSS JOIN gtot gt
)
SELECT ppm.source,
       CAST(sum(abs(sppm - gppm)) AS BIGINT) AS drift_ppm,
       CAST(max(st.s) AS BIGINT) AS n_tokens
FROM ppm JOIN stot st ON st.source = ppm.source
GROUP BY ppm.source
"""


@query("t28_source_drift", _T28_ORACLE)
def t28_source_drift(spark, sf_dir):
    """Corpus mixture drift: each source's hashed-token distribution vs
    the corpus-wide distribution, as an L1 distance over 64 hash buckets
    in exact ppm integers (2·10^6 = total variation ×2 upper bound) — the
    monitoring statistic a training-mix pipeline tracks to catch a source
    whose content shifted between crawls (the distribution-shift alarm
    DSIR-style reweighting (t25) would then correct).

    Scale shape: the only corpus-sized work is the token explode feeding a
    groupBy(source, bucket) that partial-aggregates to ≤ |sources|·64 rows
    before the exchange. Everything after — per-source totals, the global
    marginal, the dense source×bucket grid with COALESCE-0 for absent
    buckets — is column math over that tiny aggregate. Integer ppm floors
    on both engines, so the hash check has no float margin."""
    d = load(spark, sf_dir, "documents")
    occ = d.select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    ).select(
        "source", F.pmod(F.hash("tok"), F.lit(_T28_BUCKETS)).alias("bucket")
    )
    per = occ.groupBy("source", "bucket").agg(F.count(F.lit(1)).alias("c"))
    stot = per.groupBy("source").agg(F.sum("c").alias("s"))
    glob = per.groupBy("bucket").agg(F.sum("c").alias("g"))
    gt = per.agg(F.sum("c").alias("gt"))
    grid = stot.crossJoin(
        F.broadcast(
            per.sparkSession.range(_T28_BUCKETS).select(
                F.col("id").alias("bucket")
            )
        )
    )
    ppm = (
        grid.join(per, ["source", "bucket"], "left")
        .join(F.broadcast(glob), "bucket", "left")
        .crossJoin(F.broadcast(gt))
        .select(
            "source",
            "s",
            F.expr(
                f"CAST(({_T28_PPM} * COALESCE(c, 0L)) div s AS BIGINT)"
            ).alias("sppm"),
            F.expr(
                f"CAST(({_T28_PPM} * COALESCE(g, 0L)) div gt AS BIGINT)"
            ).alias("gppm"),
        )
    )
    return ppm.groupBy("source").agg(
        F.sum(F.abs(F.col("sppm") - F.col("gppm")))
        .cast("long")
        .alias("drift_ppm"),
        F.max("s").cast("long").alias("n_tokens"),
    )
