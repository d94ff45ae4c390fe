"""URL canonicalization for web-corpus dedup and per-domain accounting.

Web-scale training pipelines key nearly everything on the URL — exact-dup
removal across crawls, per-domain quotas (``domain_caps``), blocklist
joins — and raw crawl URLs differ in scheme/host case, ``www.`` prefixes,
default ports, fragments, tracking parameters, parameter order, and
trailing slashes while naming the same resource.  ``canonicalize_url``
folds all of those, as pure Column expressions (regex + array HOFs — one
fused projection, no UDF, no shuffle), deliberately RE2-portable patterns
(no backreferences/lookaround) so the DuckDB oracle replays them verbatim.

Scope notes: percent-decoding is NOT applied (decoding can change
semantics and differs per component); the public-suffix list is not
bundled, so ``domain`` is the full registered host (minus ``www.``), not
eTLD+1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# query parameters that never identify the resource (analytics trackers);
# (?i) because sites emit tracker names in any case — valid in Java regex
# and RE2 alike
TRACKING_PARAM_RE = r"(?i)^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|mc_eid)($|=)"

_SCHEME_RE = r"^(https?)://"


def _base(url: Column) -> Column:
    # fragment is client-side only — strip before anything else
    return F.regexp_replace(F.trim(url), r"#.*$", "")


def _host(base: Column) -> Column:
    """Lowercased host with userinfo stripped and ``www.`` folded — the
    single definition shared by :func:`canonicalize_url` and
    :func:`url_domain` (keep punycode/IPv6 handling, if ever added, here)."""
    rest = F.regexp_replace(base, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    authority = F.regexp_extract(rest, r"^([^/?]*)", 1)
    hostport = F.element_at(F.split(authority, "@"), -1)
    return F.regexp_replace(
        F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1)), r"^www\.", ""
    )


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an http(s) URL (see module docstring for the
    exact folds).  NULL or non-http(s) input → NULL."""
    base = _base(url)
    scheme = F.lower(F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(base, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    authority = F.regexp_extract(rest, r"^([^/?]*)", 1)
    hostport = F.element_at(F.split(authority, "@"), -1)
    host = _host(base)
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    default_port = F.when(scheme == "http", F.lit("80")).otherwise(F.lit("443"))
    port_part = F.when(
        (port == "") | (port == default_port), F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_extract(rest, r"^[^/?]*([^?]*)", 1)
    # ALL trailing slashes fold (idempotent: '/p//'≡'/p/'≡'/p'; '/' → "")
    path = F.regexp_replace(path, r"/+$", "")
    query = F.regexp_extract(base, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    query_part = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    canon = F.concat(scheme, F.lit("://"), host, port_part, path, query_part)
    return F.when(_is_web(base), canon)


def _is_web(base: Column) -> Column:
    return F.lower(base).rlike(_SCHEME_RE)


def url_domain(url: Column) -> Column:
    """Lowercased host with ``www.`` folded — the ``domain_caps`` /
    blocklist join key.  NULL for non-http(s) input."""
    base = _base(url)
    return F.when(_is_web(base), _host(base))


def canonical_urls(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """``(doc_id, url_canon, domain, is_web)`` per row — one fused
    projection; feed ``url_canon`` to exact dedup and ``domain`` to
    ``domain_caps``."""
    u = F.col("`%s`" % url_col)
    return df.select(
        F.col("`%s`" % id_col).alias("doc_id"),
        canonicalize_url(u).alias("url_canon"),
        url_domain(u).alias("domain"),
        F.when(u.isNotNull(), _is_web(_base(u))).alias("is_web"),
    )
