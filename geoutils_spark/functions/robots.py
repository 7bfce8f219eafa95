"""robots.txt evaluation — the crawl-politeness gate (REP, RFC 9309).

C4-class corpora are built from robots-respecting crawls; when a pipeline
re-filters pages retroactively (license takedowns, opt-out sweeps), the
gate has to run INSIDE the engine over (host, robots_txt) x url. Both
parse and match are row-local array programs (zero UDF, zero exchange):
the only join in a full sweep is pages ⋈ broadcast robots-dim by host.

Subset implemented (documented, like the PII tier's RE2-safe subset):

* ``User-agent`` / ``Allow`` / ``Disallow`` lines; everything else
  (Sitemap, Crawl-delay, comments, blanks) ignored; ``#`` comments
  stripped; first 200 significant lines considered.
* GROUP semantics per RFC 9309: consecutive ``User-agent`` lines share
  the rule block that follows; a ``User-agent`` line after a rule line
  starts a new group. A rule is active for agent ``a`` iff its group
  names ``a`` (exact, case-insensitive).
* matching is LITERAL-PREFIX (no ``*``/``$`` wildcards — they match
  themselves); LONGEST match wins; ``Allow`` beats ``Disallow`` on ties
  (the Google REP rule); empty ``Disallow:`` blocks nothing; no rule
  matched => allowed.

The group scan is quadratic-ish in significant lines (a rule's governing
group = the run of User-agent lines reached by scanning back over rule
lines; expressed as index-array quantifiers so Spark and DuckDB evaluate
the identical program). Real robots files are tens of lines — per-row
cost is bounded and the expression TREE is constant-size (higher-order
loops are data-driven, not unrolled)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MAX_LINES = 200
_PATH_MAX = 1 << 20


# ---------------------------------------------------------------------------
# parse: robots text -> significant lines 'U:<agent>' / 'A:<path>' / 'D:<path>'
# ---------------------------------------------------------------------------

def _sig_lines_col(robots: Column) -> Column:
    lines = F.transform(
        F.split(robots, "\n"),
        lambda x: F.regexp_replace(F.trim(x), r"#.*$", ""))

    def norm(x):
        low = F.lower(x)
        val = F.trim(F.regexp_replace(x, "^[^:]*:", ""))
        return (F.when(low.startswith("user-agent:"),
                       F.concat(F.lit("U:"), F.lower(val)))
                .when(low.startswith("allow:"), F.concat(F.lit("A:"), val))
                .when(low.startswith("disallow:"), F.concat(F.lit("D:"), val))
                .otherwise(F.lit(None)))

    return F.slice(F.filter(F.transform(lines, norm),
                            lambda s: s.isNotNull()), 1, _MAX_LINES)


def sig_lines_sql(robots: str) -> str:
    return f"""
      list_filter(
        list_transform(string_split({robots}, chr(10)), x ->
          CASE WHEN lower(trim(regexp_replace(trim(x), '#.*$', '')))
                    LIKE 'user-agent:%'
               THEN 'U:' || lower(trim(regexp_replace(
                      regexp_replace(trim(x), '#.*$', ''), '^[^:]*:', '')))
               WHEN lower(trim(regexp_replace(trim(x), '#.*$', '')))
                    LIKE 'allow:%'
               THEN 'A:' || trim(regexp_replace(
                      regexp_replace(trim(x), '#.*$', ''), '^[^:]*:', ''))
               WHEN lower(trim(regexp_replace(trim(x), '#.*$', '')))
                    LIKE 'disallow:%'
               THEN 'D:' || trim(regexp_replace(
                      regexp_replace(trim(x), '#.*$', ''), '^[^:]*:', ''))
               ELSE NULL END),
        s -> s IS NOT NULL)[1:{_MAX_LINES}]"""


# ---------------------------------------------------------------------------
# group resolution: the rules governing one agent
# ---------------------------------------------------------------------------

def rules_for_agent_col(robots: Column, agent: str = "*") -> Column:
    """array<string> of 'A:<path>'/'D:<path>' rules whose group names
    ``agent``. Governing group of a rule line i = the User-agent lines j
    reached by scanning back over rule lines only: is_ua(j), j < i, and
    no rule line between j and i is itself followed (before i) by a
    User-agent line (that would start a newer group)."""
    l = _sig_lines_col(robots)
    n = F.size(l)
    idx = F.when(n >= 1, F.sequence(F.lit(1), n)) \
        .otherwise(F.array().cast("array<int>"))

    def at(i):
        return F.element_at(l, i)

    def is_ua(s):
        return s.startswith("U:")

    ua_lit = F.lit("U:" + agent.lower())

    def active(i):
        return F.exists(idx, lambda j: (j < i) & is_ua(at(j)) & (at(j) == ua_lit)
                        & ~F.exists(idx, lambda k: (k > j) & (k < i)
                                    & ~is_ua(at(k))
                                    & F.exists(idx, lambda m: (m > k) & (m < i)
                                               & is_ua(at(m)))))

    return F.filter(
        F.transform(idx, lambda i: F.when(~is_ua(at(i)) & active(i), at(i))),
        lambda s: s.isNotNull())


def rules_for_agent_sql(lines_col: str, agent: str = "*") -> str:
    """DuckDB twin over a PRE-PARSED lines column (``_sig_lines_sql``
    aliased in an upstream CTE — the parse is referenced O(n^3) times by
    the group scan, so it must be a column, not an inlined expression;
    the Spark side gets the same materialization from the broadcast join
    boundary when rules are computed on the robots dim table)."""
    ua = "U:" + agent.lower()
    ln = lines_col
    return f"""
      list_filter(
        list_transform(range(1, len({ln}) + 1), i ->
          CASE WHEN {ln}[i] NOT LIKE 'U:%'
                AND len(list_filter(range(1, len({ln}) + 1), j ->
                      j < i AND {ln}[j] = '{ua}'
                      AND len(list_filter(range(1, len({ln}) + 1), k ->
                            k > j AND k < i AND {ln}[k] NOT LIKE 'U:%'
                            AND len(list_filter(range(1, len({ln}) + 1), m ->
                                  m > k AND m < i AND {ln}[m] LIKE 'U:%')) > 0
                          )) = 0)) > 0
               THEN {ln}[i] ELSE NULL END),
        s -> s IS NOT NULL)"""


# ---------------------------------------------------------------------------
# match: longest literal prefix, Allow wins ties, no match = allowed
# ---------------------------------------------------------------------------

def is_allowed_col(rules: Column, path: Column) -> Column:
    m = F.filter(rules, lambda r: (F.length(r) > 2)
                 & path.startswith(F.substring(r, 3, _PATH_MAX)))
    best = F.array_max(F.transform(m, lambda r: F.length(r) - 2))
    return F.when(F.size(m) == 0, F.lit(True)).otherwise(
        F.exists(m, lambda r: (F.length(r) - 2 == best)
                 & r.startswith("A:")))


def is_allowed_sql(rules: str, path: str) -> str:
    m = (f"list_filter({rules}, r -> len(r) > 2 "
         f"AND starts_with({path}, r[3:]))")
    return f"""
      (CASE WHEN len({m}) = 0 THEN TRUE ELSE
         len(list_filter({m}, r ->
           len(r) - 2 = list_max(list_transform({m}, q -> len(q) - 2))
           AND r LIKE 'A:%')) > 0 END)"""


def url_path_col(url: Column) -> Column:
    """Path component for robots matching ('' and bare hosts -> '/')."""
    p = F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def url_path_sql(url: str) -> str:
    p = f"regexp_extract({url}, '^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)', 1)"
    return f"(CASE WHEN {p} = '' THEN '/' ELSE {p} END)"


# ---------------------------------------------------------------------------
# corpus gate
# ---------------------------------------------------------------------------

def robots_filter(docs, robots, url_col: str = "url", agent: str = "*",
                  host_col: str = "host", robots_col: str = "robots_txt",
                  invert: bool = False):
    """Keep docs whose ``url_col`` the host's robots.txt allows for
    ``agent``; hosts absent from the robots table allow everything (no
    robots = no restrictions, the crawler convention). The robots table
    is a dim (one row per host): rules resolve once per HOST, the
    resolved arrays broadcast, and each doc pays one hash probe + a
    row-local match — the corpus payload never shuffles (the blocklist
    gate's shape). Host equality is exact on ``urls.url_host_col``
    output (lowercased registered host), so build the robots table with
    the same key. ``invert=True`` returns the blocked docs (audit)."""
    from geoutils_spark.functions import urls as U

    ruled = robots.select(
        F.col(host_col).alias("__rb_host"),
        rules_for_agent_col(F.col(robots_col), agent).alias("__rb_rules"))
    j = (docs.withColumn("__rb_h", U.url_host_col(F.col(url_col)))
         .join(F.broadcast(ruled),
               F.col("__rb_h") == F.col("__rb_host"), "left"))
    ok = (F.col("__rb_rules").isNull()
          | is_allowed_col(F.col("__rb_rules"),
                           url_path_col(F.col(url_col))))
    return (j.filter(~ok if invert else ok)
            .drop("__rb_h", "__rb_host", "__rb_rules"))
