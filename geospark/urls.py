"""URL canonicalization — the crawl-side normalizer that makes
url-keyed dedup / re-crawl / frontier joins see through cosmetic
variation (case, default ports, fragments, tracking params, duplicate
slashes, index.html, trailing slashes).

Reference analogue: the reference library keys nothing on URLs (it is
a pure GIS core), but the north-star pipeline it grafts onto keys
EVERYTHING on the page url (keep-latest crawl dedup, host stats, the
byte-identical-text-per-url invariant), so a canonical url is the
join key under all of them. Without it, `https://A.example.com:443/x/`
and `https://a.example.com/x` count as two pages.

Design: the whole normalizer is ONE Column expression tree — scheme /
authority / path / query are regexp-extracted, each canonicalized with
regexp_replace / array ops, and reassembled with concat. Pure JVM
codegen: no UDF, no shuffle, linear in the input; at 10^12 rows it is
a free map stage fused into whatever scan feeds it. The independent
oracle twin (goldens.url_normalize_py) is built on urllib.parse — a
different parser family — so agreement certifies the regex grammar,
not the plan.

Normalization rules (deliberately the safe, loss-free subset):
  1. scheme and host lowercased (RFC 3986 §6.2.2.1);
  2. default ports stripped (http:80, https:443) (§6.2.3);
  3. fragment dropped (never sent to the server);
  4. tracking query params dropped (utm_*, gclid, fbclid, msclkid);
  5. remaining query params sorted (param order is almost never
     semantic; sorting makes the key order-insensitive);
  6. duplicate path slashes collapsed; trailing `/index.html` and
     trailing slashes dropped; empty path -> `/`.
Percent-encoding re-normalization is intentionally OUT of scope: it
is lossy without charset knowledge and the synthetic corpus never
emits it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# params that never change the resource (analytics/campaign tags)
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid)="

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"^[^#?]*\?([^#]*)"


def url_normalize(url: Column | str) -> Column:
    """Canonical form of an absolute http(s) URL as a pure Column
    expression (rules in the module docstring). Non-URL strings (no
    scheme://) normalize to themselves lowercased-scheme-free, which
    keeps the expression total — callers filter if they care."""
    url = F.col(url) if isinstance(url, str) else url

    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(url, _AUTH_RE, 1))
    # default-port strip is scheme-conditional
    auth = (
        F.when(scheme == "http", F.regexp_replace(auth, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    )

    path = F.regexp_extract(url, _PATH_RE, 1)
    path = F.regexp_replace(path, "/{2,}", "/")
    path = F.regexp_replace(path, r"/index\.html$", "/")
    path = F.regexp_replace(path, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)

    query = F.regexp_extract(url, _QUERY_RE, 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qtail = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))

    return F.when(
        scheme == "", F.lower(url)  # total fallback for non-URLs
    ).otherwise(F.concat(scheme, F.lit("://"), auth, path, qtail))


def messy_variant(url: Column | str, branch: Column) -> Column:
    """Deterministic cosmetic messification of a canonical synthetic
    url (``https://siteN.example.com/page/I``), for exercising
    `url_normalize` on realistic crawl noise without external data.
    ``branch`` selects the noise (int column, used mod 6):

      0: SCHEME/HOST upper-cased + ``:443`` + ``#frag``
      1: tracking-only query params (all dropped)
      2: duplicated path slashes
      3: trailing ``/index.html``
      4: trailing slash
      5: scheme downgrade to ``http://…:80`` with real params —
         canonicalizes to a DIFFERENT url than the input (scheme is
         semantic): the non-collapsing control case.

    Twin: goldens._messy_variant_py (same branch table in plain
    Python) — both are pure functions of (url, branch)."""
    url = F.col(url) if isinstance(url, str) else url
    host = F.regexp_extract(url, _AUTH_RE, 1)
    path = F.regexp_extract(url, _PATH_RE, 1)
    b = branch % 6
    return (
        F.when(b == 0, F.concat(F.lit("HTTPS://"), F.upper(host),
                                F.lit(":443"), path, F.lit("#frag")))
        .when(b == 1, F.concat(F.lit("https://"), host, path,
                               F.lit("?utm_source=feed&utm_medium=rss&gclid=xyz")))
        .when(b == 2, F.concat(F.lit("https://"), host,
                               F.regexp_replace(path, "/", "//")))
        .when(b == 3, F.concat(F.lit("https://"), host, path,
                               F.lit("/index.html")))
        .when(b == 4, F.concat(F.lit("https://"), host, path, F.lit("/")))
        .otherwise(F.concat(F.lit("http://"), host, F.lit(":80"), path,
                            F.lit("?b=2&a=1")))
    )
