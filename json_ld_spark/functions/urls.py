"""URL canonicalization + registrable-domain extraction as pure JVM
column expressions — the web-pipeline primitives that gate URL-level
dedup and domain-level corpus mixing.

Canonical form (the standard crawl-dedup recipe — RFC 3986 syntax
normalization plus the usual tracking-param scrub):

  1. scheme and host lowercase (RFC 3986 §6.2.2.1);
  2. default port stripped (http:80 / https:443), explicit
     non-default ports kept;
  3. fragment dropped (never sent to the server);
  4. query params: ``utm_*`` tracking params dropped, the rest
     sorted bytewise (param order is almost never semantic; sorting
     canonicalizes ``?b=2&a=1`` == ``?a=1&b=2``), ``?`` dropped when
     nothing survives;
  5. empty path → ``/``; trailing slashes stripped except the root.
     Path CASE is preserved — paths are case-sensitive per RFC.

Registrable domain (eTLD+1): last two host labels, or last three
when the two-label tail is a vendored public-suffix subset (the full
Mozilla PSL is a data-file swap — the expression shape is the same).

Everything is split/filter/array_sort/concat over one string column:
no Python, no shuffle, RE2-safe regexes (no lookbehind) so the SQL
oracle replays each rule with the same semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# two-level public suffixes (vendored subset; swap in the full PSL as
# a data file at production scale — same expression shape)
TWO_LEVEL_SUFFIXES = (
    "co.uk", "ac.uk", "gov.uk", "com.au", "net.au", "com.br",
    "co.jp", "co.in", "github.io",
)

_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#:]+)(?::([0-9]+))?([^?#]*)(?:\?([^#]*))?(?:#.*)?$"


def url_parts(url: Column) -> "dict[str, Column]":
    """scheme/host/port/path/query as lowercased-where-appropriate
    columns; unparseable URLs yield empty strings throughout."""
    return {
        "scheme": F.lower(F.regexp_extract(url, _URL_RE, 1)),
        "host": F.lower(F.regexp_extract(url, _URL_RE, 2)),
        "port": F.regexp_extract(url, _URL_RE, 3),
        "path": F.regexp_extract(url, _URL_RE, 4),
        "query": F.regexp_extract(url, _URL_RE, 5),
    }


def canonicalize_url(url: Column) -> Column:
    """The canonical URL string (rules in the module docstring);
    empty string for unparseable input."""
    p = url_parts(url)
    scheme, host, port = p["scheme"], p["host"], p["port"]
    is_default = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    port_part = F.when(
        (port == "") | is_default, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    stripped = F.regexp_replace(p["path"], "/+$", "")
    path_part = F.when(stripped == "", F.lit("/")).otherwise(stripped)
    params = F.array_sort(
        F.filter(
            F.split(p["query"], "&"),
            lambda kv: (kv != "") & ~kv.startswith("utm_"),
        )
    )
    query_part = F.when(
        F.size(params) == 0, F.lit("")
    ).otherwise(F.concat(F.lit("?"), F.array_join(params, "&")))
    return F.when(scheme == "", F.lit("")).otherwise(
        F.concat(scheme, F.lit("://"), host, port_part, path_part, query_part)
    )


def registrable_domain(host: Column) -> Column:
    """eTLD+1 from an already-lowercased host column."""
    labels = F.split(host, "\\.")
    n = F.size(labels)
    last2 = F.concat(
        F.element_at(labels, -2), F.lit("."), F.element_at(labels, -1)
    )
    last3 = F.concat(F.element_at(labels, -3), F.lit("."), last2)
    return (
        F.when(n <= 2, host)
        .when(last2.isin(*TWO_LEVEL_SUFFIXES), last3)
        .otherwise(last2)
    )
