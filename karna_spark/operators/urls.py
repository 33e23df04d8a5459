"""URL normalization and domain-level curation (F29).

Web-crawl pretraining pipelines filter and weigh documents at the
DOMAIN level before the text is ever scored (URL/domain filtering is
the first gate in public pipeline descriptions such as RefinedWeb and
C4): normalize the source URL, reduce it to its registered domain,
aggregate per-domain statistics, and gate documents on their domain's
reputation. Reference scope: the reference declares generic
query/data-processing over document corpora (`/root/reference/
README.md:2`); domain curation is a NORTH-STAR extension of that
surface for the 100 TB crawl use case.

Everything here is composed from built-in JVM string/array expressions
(split_part / lower / element_at / slice / concat_ws) — whole-stage
codegen end to end, zero Python in the hot path, embarrassingly
parallel (row-local until the final per-domain aggregate, which
map-combines). The registered-domain suffix rules ride as literals in
the plan, the same broadcast-free pattern as the k-means centroid
literals (operators/kmeans.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Multi-label public suffixes handled by the -lite rule (the full
# public-suffix list is thousands of entries and updates monthly; at
# 100 TB you'd broadcast the real list as a small join table — the
# composition below is unchanged, only the membership test widens).
MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.nz",
)


def url_scheme(url: Column) -> Column:
    """Lower-cased scheme ('' when the URL has none)."""
    has = F.instr(url, "://") > 0
    return F.when(has, F.lower(F.split_part(url, F.lit("://"), F.lit(1)))).otherwise(
        F.lit("")
    )


def _authority(url: Column) -> Column:
    """host[:port] — the part after ``scheme://`` up to the first
    ``/``, ``?`` or ``#`` (userinfo is rejected upstream by crawl
    frontiers; kept out of scope here)."""
    rest = F.when(
        F.instr(url, "://") > 0, F.split_part(url, F.lit("://"), F.lit(2))
    ).otherwise(url)
    for sep in ("/", "?", "#"):
        rest = F.split_part(rest, F.lit(sep), F.lit(1))
    return rest


def url_host(url: Column) -> Column:
    """Lower-cased host with any port and trailing dot stripped."""
    host = F.lower(F.split_part(_authority(url), F.lit(":"), F.lit(1)))
    return F.regexp_replace(host, r"\.$", "")


def _port(url: Column) -> Column:
    a = _authority(url)
    return F.when(
        F.instr(a, ":") > 0, F.split_part(a, F.lit(":"), F.lit(2))
    ).otherwise(F.lit(""))


def url_normalize(url: Column) -> Column:
    """Canonical form: lower-cased scheme and host, default port
    (http:80 / https:443) stripped, fragment stripped, path/query
    byte-preserved (they are case-sensitive). Two crawl records of the
    same page that differ only in case/port/fragment noise normalize
    to the same string — the dedup key crawl frontiers use."""
    scheme = url_scheme(url)
    host = url_host(url)
    port = _port(url)
    keep_port = (port != "") & ~(
        ((scheme == "https") & (port == "443"))
        | ((scheme == "http") & (port == "80"))
    )
    nofrag = F.split_part(url, F.lit("#"), F.lit(1))
    # Take the tail by POSITION of the first '://', not split_part:
    # split_part splits at EVERY occurrence, so a URL embedding another
    # absolute URL ('https://h/r?u=https://b.com', the redirect /
    # web-archive shape) would be silently truncated at the second
    # '://' and distinct pages would collide on one canonical string.
    rest = F.when(
        F.instr(nofrag, "://") > 0,
        nofrag.substr(F.instr(nofrag, "://") + 3, F.length(nofrag)),
    ).otherwise(nofrag)
    auth = _authority(url)
    tail = rest.substr(F.length(auth) + 1, F.length(rest))
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        tail,
    )


def registered_domain(host: Column) -> Column:
    """The registrable domain of a host: the public suffix plus one
    label — ``a.b.example.co.uk`` → ``example.co.uk``,
    ``sub.example.com`` → ``example.com``. A bare suffix or a
    single-label host returns itself (nothing registrable below it)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # greatest(…, 1): slice() rejects a 0 start, and a 1-label host
    # can't match a 2-label suffix anyway.
    last2 = F.concat_ws(".", F.slice(labels, F.greatest(n - 1, F.lit(1)), 2))
    take = F.when(
        (n >= 3) & last2.isin(*MULTI_SUFFIXES), F.lit(3)
    ).otherwise(F.least(F.lit(2), n))
    return F.concat_ws(".", F.slice(labels, n - take + 1, take))


def domain_stats(
    df: DataFrame, url_col: str, id_col: str, quality_col: str
) -> DataFrame:
    """Per-registered-domain curation statistics: URL count, distinct
    document count, mean of ``quality_col`` (rounded to 4 dp). One
    map-combinable aggregate keyed on the domain — the shuffle carries
    |domains| rows, never |urls|."""
    dom = registered_domain(url_host(F.col(url_col)))
    return (
        df.withColumn("domain", dom)
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct(id_col).alias("n_docs"),
            F.round(F.avg(quality_col), 4).alias("avg_quality"),
        )
    )
