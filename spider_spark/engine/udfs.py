"""Vectorized (Arrow-batched) pandas UDFs — the ONLY per-row Python in the
engine (BASELINE.json input_hint: "no per-row Python" outside these).

Each wraps a shared pure function from spider_spark.extract / urlnorm so the
oracle and the engine literally execute the same bytes-in → bytes-out logic
(north-rule byte-identity).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from spider_spark.extract import extract_links, extract_text, extract_text_and_links
from spider_spark.urlnorm import canonicalize_url


@pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """HTML binary → extracted text; byte-identical to the golden column
    (F20 in SURVEY.md §2.8; reference walk /root/reference/getRJWData.py:73-97)."""
    return html.map(lambda b: extract_text(b) if b is not None else None)


@pandas_udf(T.ArrayType(T.StringType()))
def extract_links_udf(html: pd.Series, base_url: pd.Series) -> pd.Series:
    """HTML binary + base url → canonical out-links in document order
    (href harvest /root/reference/zjj_sz_gov_cn.py:166,201)."""
    out = []
    for b, u in zip(html, base_url):
        out.append(extract_links(b, u) if b is not None and u is not None else [])
    return pd.Series(out)


_TEXT_LINKS_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("links", T.ArrayType(T.StringType())),
    ]
)


@pandas_udf(_TEXT_LINKS_SCHEMA)
def extract_text_links_udf(html: pd.Series, base_url: pd.Series) -> pd.DataFrame:
    """Single-pass text+links — the crawl hot path (half the parse cost of
    calling the two UDFs separately; value-identical, tested)."""
    texts, links = [], []
    for b, u in zip(html, base_url):
        if b is None or u is None:
            texts.append(None)
            links.append([])
        else:
            t, ls = extract_text_and_links(b, u)
            texts.append(t)
            links.append(ls)
    return pd.DataFrame({"text": texts, "links": links})


@pandas_udf(T.StringType())
def canonicalize_udf(url: pd.Series) -> pd.Series:
    return url.map(lambda u: canonicalize_url(u) if u is not None else None)


def host_col(url):
    """Host of a canonical URL as a JVM-side column expression — stays in
    whole-stage codegen (engine analog of the reference's URL split,
    /root/reference/suplicmap_vector2.py:63-66)."""
    c = url if not isinstance(url, str) else F.col(url)
    rest = F.regexp_replace(c, r"^[a-z+.-]+://", "")
    auth = F.split(rest, "/").getItem(0)
    no_user = F.element_at(F.split(auth, "@"), -1)
    return F.lower(F.split(no_user, ":").getItem(0))


def path_col(url):
    """Path (leading slash) of a canonical URL, JVM-side."""
    c = url if not isinstance(url, str) else F.col(url)
    rest = F.regexp_replace(c, r"^[a-z+.-]+://[^/]*", "")
    return F.when(rest == "", F.lit("/")).otherwise(F.split(rest, r"\?").getItem(0))


def host_hash_col(url):
    """Murmur3-32 of the host — Spark's hash() IS Murmur3 x86_32 seed 42,
    bit-identical to spider_spark.urlnorm.murmur3_32 (tested)."""
    return F.hash(host_col(url))
