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


# ── robots.txt (Robots Exclusion Protocol) ────────────────────────────────


def parse_robots_rules(
    robots: DataFrame, text_col: str = "robots_txt", group_col: str = "source"
) -> DataFrame:
    """Parse robots.txt TEXT into (group, directive, path) rule rows —
    expression-only (explode lines → trim/lower → regexp), so a crawl
    frontier parses millions of robots files without a Python worker.
    Implements the original REP line grammar: `Directive: value` with
    optional whitespace, `#` comment lines and blank lines skipped,
    directives case-insensitive.  Only allow/disallow rows with a
    non-empty path survive (an empty `Disallow:` means allow-all in REP
    — dropping it leaves the default-allow decision path, which is the
    same semantics).  Wildcards (`*`, `$`) are the Google extension, NOT
    parsed here — prefix matching only, per the 1994 REP."""
    lines = robots.select(
        group_col, F.explode(F.split(F.col(text_col), "\n")).alias("line")
    ).filter(~F.trim("line").startswith("#"))
    rules = lines.select(
        group_col,
        F.lower(F.trim(F.regexp_extract("line", r"^\s*([A-Za-z-]+)\s*:", 1)))
        .alias("directive"),
        F.trim(F.regexp_extract("line", r"^[^:]+:\s*(\S*)", 1)).alias("path"),
    )
    return rules.filter(
        F.col("directive").isin("allow", "disallow") & (F.col("path") != "")
    )


def robots_decisions(
    urls: DataFrame,
    rules: DataFrame,
    id_col: str = "doc_id",
    path_col: str = "path",
    group_col: str = "source",
) -> DataFrame:
    """Longest-match REP decision per URL: among the group's rules whose
    path is a PREFIX of the URL path, the longest wins; equal lengths →
    Allow wins (the REP tie rule, 'allow' < 'disallow' makes that one
    ASC sort key); no matching rule → allowed.  One broadcast join (a
    site's robots rules are KBs) + one per-URL window — URLs never
    shuffle except on their own id for the window."""
    from pyspark.sql import Window as W

    j = urls.join(
        F.broadcast(rules),
        (urls[group_col] == rules[group_col])
        & urls[path_col].startswith(rules["path"]),
        "left",
    ).select(
        urls["*"],
        rules["directive"],
        rules["path"].alias("rule_path"),
    )
    w = W.partitionBy(id_col).orderBy(
        F.length("rule_path").desc(), F.col("directive").asc()
    )
    best = (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return best.select(
        *[urls[c] for c in urls.columns],
        F.coalesce("rule_path", F.lit("")).alias("matched_rule"),
        F.when(F.col("directive") == "disallow", F.lit("deny"))
        .otherwise(F.lit("allow"))
        .alias("decision"),
    )
