"""URL operators for crawl-scale pipelines: canonicalization, host/domain
extraction, blocklist tagging.

Not in the reference (north-star additions): every web-crawl corpus keys
its dedup, mixing, and filtering on canonical URLs and registered domains
(Common Crawl dedups fetches by canonical URL; C4/RefinedWeb filter by
domain blocklists).  All pure column expressions — JVM-side, whole-stage
codegen, zero shuffle for the per-row law — using a Java/RE2-portable
regex subset so the DuckDB oracle replays the exact chain.

Canonicalization law (the usual crawl-normalizer core):
  1. split scheme://authority/rest (authority = up to first / ? #)
  2. lowercase scheme + authority
  3. strip a leading "www." label
  4. strip explicit default ports (:443 https, :80 http)
  5. drop the #fragment
  6. drop utm_* tracking params (tidying separators; a query left empty
     drops its "?")
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_URL_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)(.*)$"


def url_scheme(url: Column | str) -> Column:
    return F.lower(F.regexp_extract(url, _URL_RE, 1))


def url_authority(url: Column | str) -> Column:
    """Lowercased authority with www. and default ports stripped."""
    auth = F.lower(F.regexp_extract(url, _URL_RE, 2))
    auth = F.regexp_replace(auth, "^www\\.", "")
    return F.regexp_replace(auth, ":(443|80)$", "")


def url_host(url: Column | str) -> Column:
    """Canonical host: authority minus any :port and userinfo@."""
    auth = url_authority(url)
    auth = F.regexp_replace(auth, "^[^@]*@", "")
    return F.regexp_replace(auth, ":[0-9]+$", "")


def registered_domain(host: Column | str) -> Column:
    """Last two DNS labels — the eTLD+1 approximation every quick-pass
    crawl filter uses (a full public-suffix list is a broadcast join away;
    the column shape is identical)."""
    return F.regexp_extract(host, "([^.]+\\.[^.]+)$", 1)


def canonicalize(url: Column | str) -> Column:
    """Apply the module's canonicalization law; see module docstring.
    DuckDB replays the same regexp chain verbatim (RE2 ∩ Java syntax)."""
    if isinstance(url, str):
        url = F.col(url)
    scheme = url_scheme(url)
    auth = url_authority(url)
    rest = F.regexp_extract(url, _URL_RE, 3)
    rest = F.regexp_replace(rest, "#.*$", "")           # 5. fragment
    rest = F.regexp_replace(rest, "utm_[^&#]*&", "")    # 6. utm_ not last
    rest = F.regexp_replace(rest, "[?&]utm_[^&#]*$", "")  # 6. utm_ last
    return F.concat(scheme, F.lit("://"), auth, rest)
