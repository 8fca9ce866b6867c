"""Web-corpus URL operators: normalization, host/domain extraction,
and per-domain document caps.

Every large crawl pipeline runs these before (and after) dedup:

* **url_normalize** — canonicalize urls so trivially-distinct spellings
  of the same resource collapse BEFORE content dedup ever runs:
  lowercase scheme/host, strip default ports, drop fragments, drop
  tracking query parameters (utm_*, fbclid, gclid, ...), sort the
  surviving query parameters, trim trailing slashes on non-root paths.
  Pure per-row JVM expressions (regexp/split/filter/array_sort) — zero
  shuffle, zero Python, linear scan at any corpus size.

* **host / registered domain** — `parse_url`-free extraction with the
  same regex family on both engines.  Registered domain here is the
  last two host labels (last three when the 2nd-level label is a known
  public-suffix second level like co/com/ac/gov/net/org/edu — the
  closed subset that covers the common ccTLD patterns; a full Public
  Suffix List lookup is a broadcast-join against the PSL table and
  slots in behind the same column contract).

* **domain_topk** — keep at most k documents per registered domain,
  best-first by a caller-supplied score (the standard anti-SEO-farm /
  anti-boilerplate volume cap, e.g. RefinedWeb's per-domain limits).
  THE scale hazard here is the hot domain: one spam host can carry
  10^8 pages, and a naive ``row_number() OVER (PARTITION BY domain)``
  funnels them through ONE window task.  This implementation is the
  classic two-phase top-k:

    1. salt each row into ``n_salts`` subgroups per domain; rank
       inside (domain, salt) — parallelism ``n_salts`` per domain —
       and keep only k rows per subgroup;
    2. rank the survivors (<= k * n_salts rows per domain, bounded
       and tiny) inside domain and keep k.

  Phase-2's window IS partitioned by domain, but its input is capped
  by construction, so the hot key holds <= k * n_salts skinny rows —
  never the domain's raw volume.  Results are identical to the naive
  single-window form because per-subgroup top-k is a superset of the
  global top-k members (any global top-k row is top-k within its
  subgroup too).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["TRACKING_PARAMS", "url_normalize", "url_host",
           "registered_domain", "domain_topk", "outlinks", "pagerank", "hits",
           "parse_robots", "robots_allowed", "robots_filter",
           "parse_crawl_delay", "crawl_delay_hosts",
           "surt_key", "anchor_text_agg", "domain_quality", "sitemap_urls", "feed_entries",
           "canonical_collapse", "url_path", "url_templates", "url_blocklist_filter",
           "crawl_schedule", "resolve_redirects", "stitch_series",
           "host_lang_profile", "reciprocal_links", "triangle_count",
           "label_propagation", "kcore", "anchor_classify"]

# the closed, documented drop-set; extend per deployment.  Matched on
# the parameter NAME (the part left of '='), utm_ by prefix.
TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "mc_eid", "igshid",
                   "ref", "ref_src", "spm")

# second-level labels that act as public-suffix extensions (closed
# common subset: example.co.uk -> example.co.uk, not co.uk)
_SECOND_LEVEL = ("co", "com", "ac", "gov", "net", "org", "edu")


def url_host(col: str | Column) -> Column:
    """Lowercased host (no scheme, no credentials, no port, no path)."""
    c = F.col(col) if isinstance(col, str) else col
    no_scheme = F.regexp_replace(c, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    no_cred = F.regexp_replace(no_scheme, r"^[^/@?#]*@", "")
    host = F.regexp_extract(no_cred, r"^([^/:?#]*)", 1)
    return F.lower(host)


def registered_domain(col: str | Column) -> Column:
    """Registered (pay-level) domain from a url: last 2 host labels,
    or last 3 when the middle one is a common public-suffix second
    level (co/com/ac/gov/net/org/edu) — so a.b.example.com ->
    example.com and news.bbc.co.uk -> bbc.co.uk."""
    host = url_host(col)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    second = F.element_at(parts, -2)
    take3 = (n >= 3) & second.isin(*_SECOND_LEVEL)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(".", F.element_at(parts, -3), F.element_at(parts, -2),
                        F.element_at(parts, -1))
    return F.when(n <= 1, host).when(take3, last3).otherwise(last2)


def url_normalize(col: str | Column) -> Column:
    """Canonical url form; the steps and their order are the contract:

    1. lowercase the scheme and host (path/query stay case-sensitive);
    2. strip ``#fragment``;
    3. strip default ports ``:80`` (http) / ``:443`` (https);
    4. drop tracking query parameters: any name starting ``utm_`` plus
       the literal TRACKING_PARAMS set;
    5. sort surviving query parameters byte-wise (param order is not
       semantic for the overwhelming majority of endpoints — and a
       canonical order is what makes url dedup an equality test);
    6. drop the trailing ``/`` of non-root paths and a trailing ``?``.

    All built-in string/array expressions — per-row, no shuffle."""
    c = F.col(col) if isinstance(col, str) else col
    no_frag = F.regexp_extract(c, r"^([^#]*)", 1)
    scheme = F.lower(F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    after_scheme = F.regexp_replace(no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    authority = F.regexp_extract(after_scheme, r"^([^/?]*)", 1)
    rest = F.substring(after_scheme, F.length(authority) + 1, 1 << 30)
    authority = F.lower(authority)
    authority = F.when(
        (scheme == "http") & authority.endswith(":80"),
        F.regexp_replace(authority, r":80$", ""),
    ).when(
        (scheme == "https") & authority.endswith(":443"),
        F.regexp_replace(authority, r":443$", ""),
    ).otherwise(authority)
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.when(
        F.instr(rest, "?") > 0,
        F.substring(rest, F.instr(rest, "?") + 1, 1 << 30),
    ).otherwise(F.lit(""))
    # param filter + sort
    params = F.filter(
        F.split(query, "&"),
        lambda p: (F.length(p) > 0)
        & ~F.regexp_extract(p, r"^([^=]*)", 1).startswith("utm_")
        & ~F.regexp_extract(p, r"^([^=]*)", 1).isin(*TRACKING_PARAMS),
    )
    sorted_q = F.array_join(F.array_sort(params), "&")
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.regexp_replace(path, r"/$", ""),
    ).otherwise(path)
    base = F.when(scheme != "", F.concat(scheme, F.lit("://"), authority)) \
        .otherwise(authority)
    return F.concat(
        base, path,
        F.when(F.length(sorted_q) > 0, F.concat(F.lit("?"), sorted_q))
        .otherwise(F.lit("")),
    )


def domain_topk(df: DataFrame, k: int, score_col: str,
                url_col: str = "url", key_col: str | None = None,
                n_salts: int = 16) -> DataFrame:
    """Keep the best ``k`` rows per registered domain (score desc, then
    url asc for a deterministic total order).  Two-phase top-k — see
    module docstring for why the naive single window melts on a hot
    spam domain.  Adds a ``domain`` column; otherwise returns the input
    columns unchanged."""
    tie = key_col or url_col
    with_dom = df.withColumn("domain", registered_domain(url_col))
    salted = with_dom.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(tie)), F.lit(n_salts))
    )
    w1 = Window.partitionBy("domain", "_salt").orderBy(
        F.col(score_col).desc(), F.col(tie).asc()
    )
    survivors = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_r1")
    )
    w2 = Window.partitionBy("domain").orderBy(
        F.col(score_col).desc(), F.col(tie).asc()
    )
    return (
        survivors.withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= k)
        .drop("_r2", "_salt")
    )


def outlinks(df: DataFrame, html_col: str = "html", url_col: str = "url",
             passthrough: tuple[str, ...] = (),
             normalize: bool = True,
             with_anchor_text: bool = False) -> DataFrame:
    """Page -> outlink edges: parse ``<a href>`` from the html column
    (same stdlib parser stack as extraction, honoring ``<base href>``
    and charset sniffing — ``extractor.core.extract_links``), resolve
    relative hrefs against the page url, drop non-navigational schemes
    and fragments, and explode to one ``(src, dst)`` row per distinct
    link.  ``normalize=True`` additionally canonicalizes ``dst`` with
    :func:`url_normalize` and re-distincts (two spellings of one
    resource collapse to one edge).

    ``with_anchor_text=True`` adds the flattened anchor text per link
    (first anchor wins for duplicate targets inside a page) — the
    anchor-text corpus shape (anchor text is the classic external
    relevance/label signal for the linked page).

    Scale shape: one Arrow-batched kernel pass over the pages (the html
    column never shuffles), output is the skinny edge list — the web
    graph's standard construction.  The reference has no link stage (it
    processes single uploaded files, services/file_processor.py); this
    is the corpus-level capability a crawl pipeline needs for PageRank /
    spam-prior signals."""
    from ocr_spark.extractor.core import extract_links_texts

    cols = [url_col, html_col, *passthrough]
    extra = ([T.StructField("dst", T.StringType())]
             + ([T.StructField("anchor", T.StringType())]
                if with_anchor_text else []))
    out_schema = T.StructType(
        [df.schema[url_col]]
        + [df.schema[c] for c in passthrough]
        + extra
    )

    def kernel(batches):
        import pyarrow as pa  # executor-side import

        for batch in batches:
            urls = batch.column(0).to_pylist()
            htmls = batch.column(1).to_pylist()
            idx, dsts, anchors = [], [], []
            for i, (u, h) in enumerate(zip(urls, htmls)):
                if h is None or u is None:
                    continue
                for link, text in extract_links_texts(h, u):
                    idx.append(i)
                    dsts.append(link)
                    anchors.append(text)
            take = pa.array(idx, pa.int64())
            arrays = [batch.column(0).take(take)]
            names = [url_col]
            for j, c in enumerate(passthrough):
                arrays.append(batch.column(2 + j).take(take))
                names.append(c)
            arrays.append(pa.array(dsts, pa.string()))
            names.append("dst")
            if with_anchor_text:
                arrays.append(pa.array(anchors, pa.string()))
                names.append("anchor")
            yield pa.RecordBatch.from_arrays(arrays, names)

    edges = df.select(*cols).mapInArrow(kernel, schema=out_schema)
    if normalize:
        edges = edges.withColumn("dst", url_normalize("dst"))
        if with_anchor_text:
            # two raw spellings can canonicalize to one dst with
            # different anchors: keep the lexicographically-smallest
            # anchor (deterministic, oracle-able)
            others = [c for c in edges.columns if c != "anchor"]
            edges = edges.groupBy(*others).agg(
                F.min("anchor").alias("anchor"))
        else:
            edges = edges.distinct()
    return edges


def pagerank(edges: DataFrame, n_iter: int = 3, damping: float = 0.85,
             src: str = "src", dst: str = "dst") -> DataFrame:
    """Fixed-iteration PageRank over an edge list -> ``(node, rank)``.

    Convention: the original un-normalized form (Page et al. 1999),
    ``rank = (1-d) + d * sum(rank_in / out_degree)`` from an all-ones
    start; dangling nodes contribute nothing (their mass is not
    redistributed) — the variant whose fixed-iteration unrolling is
    exactly expressible as chained SQL aggregates, so the driver oracle
    can recompute it.  Ranks are raw doubles; callers hash-comparing
    results should round (summation order across partitions differs in
    the last ulps).

    Scale shape per iteration: one equi-join of the skinny rank table to
    the edge list (shuffle keyed by node id), one hash aggregate on
    ``dst``, one left join back to the node set — no windows, no
    collects.  ``localCheckpoint`` after each round truncates lineage,
    the same iterative-Spark discipline as the connected-components
    clustering (operators/dedup.py); skew at a mega-in-degree node is
    absorbed by partial (map-side) aggregation of the contribution sum."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")) \
        .distinct()
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint())
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    ranks = nodes.select("node", F.lit(1.0).alias("rank"))
    for _ in range(n_iter):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(F.col("dst").alias("node"),
                    (F.col("rank") / F.col("deg")).alias("c"))
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(sums, "node", "left")
            .select(
                "node",
                (F.lit(1.0 - damping)
                 + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                 ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


def trust_rank(edges: DataFrame, seeds: DataFrame, n_iter: int = 3,
               damping: float = 0.85, src: str = "src",
               dst: str = "dst", seed_col: str = "node") -> DataFrame:
    """Fixed-iteration TrustRank (Gyöngyi, Garcia-Molina & Pedersen,
    "Combating web spam with TrustRank", VLDB 2004) -> ``(node,
    trust)``: PageRank with the uniform teleport replaced by a
    trusted-seed vector, so trust flows OUT of hand-verified good pages
    and decays with link distance — pages reachable only through spam
    neighborhoods get near-zero trust even when their raw PageRank is
    inflated by a link farm.

    Convention mirrors :func:`pagerank`'s un-normalized Page-et-al.
    form so the two scores are directly comparable on the same graph:
    ``trust = (1-d)*t + d * Σ(trust_in / out_degree)`` from ``t`` as
    the start vector, where ``t(v) = 1.0`` for seed nodes and ``0``
    otherwise (un-normalized teleport — the 1/|S| scaling of the paper
    is a presentation constant; dividing the output by |S| recovers
    it).  With d having two decimals and out-degrees small integers,
    k iterations stay on an exact decimal grid just like
    :func:`pagerank`, which is what lets a SQL oracle re-derive the
    scores bit-comparably after round(., 9).

    Spam mass (Gyöngyi et al., "Link spam detection based on mass
    estimation", VLDB 2006) is the downstream composition: ``mass =
    pr - trust`` (absolute) or ``(pr - trust)/pr`` (relative) — the
    rank a page gets from NON-trusted sources; callers compute it by
    joining this output to :func:`pagerank`'s on the same edge list.

    Scale shape per iteration: identical to :func:`pagerank` — one
    equi-join of the skinny trust table to the edge list, one hash
    aggregate on ``dst`` (map-side partials absorb hot in-degrees),
    one left join back to the node set, ``localCheckpoint`` lineage
    truncation; the seed table is joined once up front (broadcast-able
    when the seed list is small, the common case)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")) \
        .distinct()
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint())
    t = (nodes.join(seeds.select(F.col(seed_col).alias("node"))
                    .distinct(), "node", "left_semi")
         .select("node", F.lit(1.0).alias("t")))
    tvec = (nodes.join(t, "node", "left")
            .select("node", F.coalesce(F.col("t"), F.lit(0.0)).alias("t"))
            .localCheckpoint())
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    trust = tvec.select("node", F.col("t").alias("trust"))
    for _ in range(n_iter):
        contrib = (
            e.join(trust.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(F.col("dst").alias("node"),
                    (F.col("trust") / F.col("deg")).alias("c"))
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        trust = (
            tvec.join(sums, "node", "left")
            .select(
                "node",
                (F.lit(1.0 - damping) * F.col("t")
                 + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                 ).alias("trust"),
            )
            .localCheckpoint()
        )
    return trust


def hits(edges: DataFrame, n_iter: int = 2,
         src: str = "src", dst: str = "dst") -> DataFrame:
    """Fixed-iteration HITS (Kleinberg, JACM 1999) over an edge list ->
    ``(node, hub, auth)``.

    Convention: the UN-normalized power iteration from an all-ones hub
    start — ``auth_k(v) = Σ_{(u,v)∈E} hub_{k-1}(u)``, ``hub_k(u) =
    Σ_{(u,v)∈E} auth_k(v)``.  Without the usual L2 normalization the
    scores after k rounds are exact INTEGERS: auth_k(v) counts the
    alternating forward/backward paths of length 2k-1 ending at v, and
    hub_k(u) the length-2k paths starting at u.  Integers cross engines
    bit-exactly, so the driver oracle can unroll the same iterations as
    chained SQL aggregates with zero float-rounding hazard — the same
    exactness discipline as the HLL/CMS sketches.  (Normalizing is a
    presentation step: divide by max or L2 downstream if ranks are
    published; the ORDER is identical.)

    Scale shape per half-iteration: one equi-join of the skinny score
    table to the edge list + one hash aggregate — shuffles keyed by
    node id, hot in-degree nodes absorbed by map-side partial sums, no
    windows, no collects.  ``localCheckpoint`` per round truncates the
    lineage exactly like :func:`pagerank` and the connected-components
    clusterer.  Score magnitude grows ~(max degree)^2 per round — at
    web scale keep ``n_iter`` small (2-3) or renormalize between
    rounds; BIGINT overflow is the caller's contract to watch."""
    if n_iter < 1:
        raise ValueError("hits needs n_iter >= 1")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")) \
        .distinct()
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint())
    hub = nodes.select("node", F.lit(1).cast("long").alias("hub"))
    auth = None
    for _ in range(n_iter):
        a_sums = (
            e.join(hub.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("s"))
        )
        auth = (
            nodes.join(a_sums, "node", "left")
            .select("node",
                    F.coalesce(F.col("s"), F.lit(0)).cast("long").alias("auth"))
            .localCheckpoint()
        )
        h_sums = (
            e.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth").alias("s"))
        )
        hub = (
            nodes.join(h_sums, "node", "left")
            .select("node",
                    F.coalesce(F.col("s"), F.lit(0)).cast("long").alias("hub"))
            .localCheckpoint()
        )
    return nodes.join(hub, "node").join(auth, "node") \
        .select("node", "hub", "auth")


# -- robots.txt (RFC 9309 Robots Exclusion Protocol) -------------------------

def parse_robots(txt: str, agent: str = "*") -> list[tuple[str, bool]]:
    """Parse robots.txt into ``[(pattern, allow)]`` rules for ``agent``.

    RFC 9309 semantics, restricted to the parts crawl pipelines
    actually key on: user-agent groups (consecutive ``User-agent``
    lines share the following rule block; groups for the same agent
    merge), ``Allow``/``Disallow`` with ``*`` wildcards and the ``$``
    end anchor; empty-valued rules are no-ops per the spec; unknown
    directives (Crawl-delay, Sitemap, ...) are ignored.  Agent matching
    is the case-insensitive product-token match, falling back to the
    ``*`` group; no group -> no rules -> everything allowed."""
    groups: dict[str, list[tuple[str, bool]]] = {}
    current_agents: list[str] = []
    in_rules = False
    for raw in (txt or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_rules:          # a new group header starts
                current_agents = []
                in_rules = False
            current_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_rules = True
            if not val:           # empty value = no restriction (spec)
                continue
            for a in current_agents:
                groups.setdefault(a, []).append((val, key == "allow"))
    return groups.get(agent.lower(), groups.get("*", []))


def _robots_rule_matches(pattern: str, path: str) -> bool:
    """``*`` wildcards anywhere, ``$`` anchors the end; patterns match
    from the start of the path (RFC 9309 §2.2.2/2.2.3)."""
    end_anchor = pattern.endswith("$")
    core = pattern[:-1] if end_anchor else pattern
    parts = core.split("*")
    if not path.startswith(parts[0]):
        return False
    pos = len(parts[0])
    for part in parts[1:]:
        if part == "":
            continue              # consecutive '*' collapse
        idx = path.find(part, pos)
        if idx < 0:
            return False
        pos = idx + len(part)
    if end_anchor:
        return pos == len(path) or core.endswith("*")
    return True


def robots_allowed(rules: list[tuple[str, bool]], path: str) -> bool:
    """Longest-match verdict over parsed rules: the most specific
    (longest) matching pattern decides; an allow/disallow tie at equal
    length resolves to allow; no matching rule allows (RFC 9309
    §2.2.2)."""
    best_len, best_allow = -1, True
    for pattern, allow in rules:
        if _robots_rule_matches(pattern, path):
            ln = len(pattern)
            if ln > best_len or (ln == best_len and allow):
                best_len, best_allow = ln, allow
    return best_allow


def robots_filter(pages: DataFrame, robots: DataFrame,
                  url_col: str = "url", host_col: str = "host",
                  txt_col: str = "robots_txt",
                  agent: str = "*") -> DataFrame:
    """Annotate pages with the RFC 9309 crawl-permission verdict of
    their host's robots.txt: output = input columns + ``allowed``
    (int 0/1; hosts absent from ``robots`` allow everything).

    Scale shape: the robots table is one small row per host —
    broadcast-joined to the pages (the page side never shuffles) —
    and the verdict is an Arrow-batched kernel that parses each
    distinct robots.txt once per batch (memoized; batches arrive
    host-clustered after the broadcast join's scan order, so the parse
    cost is ~once per host).  The path matched is path+query, per the
    spec."""
    from urllib.parse import urlsplit

    with_host = pages.withColumn("_rf_host", url_host(url_col))
    rob = robots.select(F.col(host_col).alias("_rf_host"),
                        F.col(txt_col).alias("_rf_txt"))
    joined = with_host.join(F.broadcast(rob), "_rf_host", "left")
    in_cols = [c for c in joined.columns if c not in ("_rf_host", "_rf_txt")]
    sel = joined.select(*in_cols, "_rf_txt")
    out_schema = T.StructType(
        [sel.schema[c] for c in in_cols]
        + [T.StructField("allowed", T.IntegerType(), True)]
    )
    url_idx = in_cols.index(url_col)

    def kernel(batches):
        import pyarrow as pa  # executor-side import

        cache: dict[str, list] = {}
        for batch in batches:
            urls = batch.column(url_idx).to_pylist()
            txts = batch.column(batch.num_columns - 1).to_pylist()
            allowed = []
            for u, t in zip(urls, txts):
                if t is None or u is None:
                    allowed.append(1)
                    continue
                rules = cache.get(t)
                if rules is None:
                    rules = cache[t] = parse_robots(t, agent)
                # scheme-less urls (host0.com/plain) still split: add //
                target = u if "://" in u else "//" + u
                sp = urlsplit(target)
                path = sp.path or "/"
                if sp.query:
                    path += "?" + sp.query
                allowed.append(int(robots_allowed(rules, path)))
            arrays = [batch.column(i) for i in range(len(in_cols))]
            arrays.append(pa.array(allowed, pa.int32()))
            yield pa.RecordBatch.from_arrays(arrays, in_cols + ["allowed"])

    return sel.mapInArrow(kernel, schema=out_schema)


def surt_key(col: str | Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key of an
    ALREADY-NORMALIZED url — the CDX index key convention
    (``com,example)/path?q=1``): host labels reversed and comma-joined
    (leading ``www.`` dropped, non-default port kept after the host),
    then ``)`` and the path+query.  Computed over ``url_normalize``'s
    output so equal resources share a key; the reversed-host prefix
    makes a lexicographic sort cluster a domain's pages together —
    which is exactly why CDX shards by SURT range at crawl scale.
    Pure per-row JVM expressions, zero shuffle."""
    u = F.col(col) if isinstance(col, str) else col
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?]*)", 1)
    host = F.split_part(hostport, F.lit(":"), F.lit(1))
    port = F.regexp_extract(hostport, r":[0-9]+$", 0)
    hn = F.regexp_replace(host, r"^www\.", "")
    revd = F.array_join(F.reverse(F.split(hn, r"\.")), ",")
    pathq = F.regexp_replace(rest, r"^[^/?]*", "")
    pathq = F.when(F.length(pathq) == 0, F.lit("/")).otherwise(pathq)
    return F.concat(revd, port, F.lit(")"), pathq)


def anchor_text_agg(edges: DataFrame, dst_col: str = "dst",
                    anchor_col: str = "anchor") -> DataFrame:
    """Incoming-anchor-text aggregation per link target — how web
    corpora mine page descriptions the page itself doesn't contain
    (anchor corpora; the classic ranking/labeling signal).  Returns one
    row per target: ``(dst, n_inlinks, n_distinct_anchors, top_anchor,
    top_anchor_count)`` where ``top_anchor`` is the most frequent
    anchor string, ties broken to the lexicographically LAST (a total
    order both engines share).

    Scale shape: two hash aggregates and nothing else.  The first
    groups the skinny (dst, anchor) pairs — map-side partial
    aggregation absorbs the hot target ("click here" pointing at a
    popular page) before the shuffle; the second reduces per-dst with
    an order-free struct-max, so there is NO window over the hot key
    (the naive ``row_number() OVER (PARTITION BY dst)`` twin is what
    the oracle runs — identical output, single-task hazard avoided)."""
    per = edges.groupBy(dst_col, anchor_col).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        per.groupBy(dst_col)
        .agg(
            F.sum("cnt").alias("n_inlinks"),
            F.count(F.lit(1)).alias("n_distinct_anchors"),
            F.max(F.struct(F.col("cnt"), F.col(anchor_col))).alias("_m"),
        )
        .select(
            dst_col, "n_inlinks", "n_distinct_anchors",
            F.col(f"_m.{anchor_col}").alias("top_anchor"),
            F.col("_m.cnt").alias("top_anchor_count"),
        )
    )


def domain_quality(pages: DataFrame, url_col: str = "url",
                   text_col: str = "text") -> DataFrame:
    """Per-registered-domain quality profile: page count, quality-
    filter keep rate, mean token count — the host-reputation signal
    curation pipelines threshold on (a domain whose pages mostly fail
    the quality filter is boilerplate/spam and gets dropped wholesale,
    the C4-blocklist move computed from the corpus itself instead of a
    hand list).

    Scale shape: the per-page quality verdict is zero-shuffle row
    expressions (functions/quality.py); the only exchange is the final
    skinny (domain, keep, n_tokens) aggregate with map-side combine —
    hot domains are absorbed before the shuffle."""
    from ocr_spark.functions.quality import with_quality_filter

    q = with_quality_filter(
        pages.select(url_col, text_col), text_col)
    d = q.select(
        registered_domain(url_col).alias("domain"),
        "keep", "n_tokens",
    )
    return d.groupBy("domain").agg(
        F.count("*").alias("n_pages"),
        F.round(F.avg("keep"), 6).alias("keep_rate"),
        F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
    )


def sitemap_urls(df: DataFrame, xml_col: str = "xml",
                 source_col: str = "sitemap_url",
                 normalize: bool = False) -> DataFrame:
    """Sitemap XML -> one row per ``<loc>`` entry (sitemaps.org
    protocol; the crawl-frontier seeding companion to the robots
    filter).  Pure built-ins: regexp group extraction + posexplode —
    no XML parser needed for the flat loc-list shape, and the RE2-safe
    pattern runs identically in the SQL oracle.  Entity-encoded
    ampersands (the protocol requires escaping) are decoded.

    Returns ``(sitemap_url, seq, url)``; ``normalize=True`` also
    canonicalizes with :func:`url_normalize`."""
    locs = F.regexp_extract_all(
        F.col(xml_col), F.lit("<loc>([^<]*)</loc>"), 1)
    out = df.select(
        F.col(source_col).alias("sitemap_url"),
        F.posexplode(
            F.filter(
                F.transform(locs, lambda s: F.replace(
                    F.trim(s), F.lit("&amp;"), F.lit("&"))),
                lambda s: F.length(s) > 0,
            )
        ).alias("seq", "url"),
    )
    if normalize:
        out = out.withColumn("url", url_normalize("url"))
    return out


def canonical_collapse(df: DataFrame, url_col: str = "url",
                       canonical_col: str = "canonical",
                       normalize: bool = True) -> DataFrame:
    """Collapse capture urls by their declared ``<link rel=canonical>``
    target — the content-level url grouping a crawl runs BEFORE exact
    dedup (mirror/AMP/tracking spellings of one resource all declare
    the same canonical, so collapsing here removes duplicates that no
    url-string normalization can see).  Pages without a canonical
    group under themselves.

    Returns ``(canonical_url, n_pages, representative)`` with the
    lexicographically-smallest member url as the deterministic
    representative.  ``normalize=True`` canonicalizes the group key
    with :func:`url_normalize` first (two spellings of the canonical
    itself must not split a group).

    Scale shape: one skinny (group_key, url) aggregate with map-side
    combine; the html/meta extraction that produced ``canonical_col``
    already ran in its own narrow pass."""
    key = F.coalesce(F.col(canonical_col), F.col(url_col))
    if normalize:
        key = url_normalize(key)
    return (
        df.select(key.alias("canonical_url"), F.col(url_col).alias("_u"))
        .groupBy("canonical_url")
        .agg(F.count("*").alias("n_pages"),
             F.min("_u").alias("representative"))
    )


def url_path(col: str | Column) -> Column:
    """Path component of a url, ``'/'`` when absent: fragment stripped,
    scheme + authority stripped (scheme-less urls supported — the
    authority is the leading token either way), query stripped.
    Case preserved (paths are case-sensitive, unlike hosts)."""
    c = F.col(col) if isinstance(col, str) else col
    no_frag = F.regexp_extract(c, r"^([^#]*)", 1)
    after_scheme = F.regexp_replace(
        no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    rest = F.regexp_replace(after_scheme, r"^[^/?#]*", "")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    return F.when(path == "", F.lit("/")).otherwise(path)


def url_blocklist_filter(df: DataFrame, blocklist: DataFrame,
                         url_col: str = "url",
                         domain_col: str = "domain",
                         prefix_col: str = "path_prefix") -> DataFrame:
    """UT1/RefinedWeb-style URL blocklist: ``blocklist`` rows are
    (registered domain, path prefix); a NULL prefix blocks the whole
    domain, otherwise any url whose path starts with the prefix is
    blocked.  Domain matching is on the REGISTERED domain (subdomains
    of a blocked domain are blocked — the standard blocklist
    semantics; adult/malware lists name pay-level domains).

    Returns the input plus ``(domain, blocked)`` — attribute-style, so
    callers filter ``~blocked`` or audit the decisions.

    Scale shape: the blocklist is first aggregated to ONE row per
    domain (whole-domain flag + prefix array) then broadcast — UT1-
    scale lists are a few million rows / tens of MB, squarely
    broadcastable — so the corpus side is a narrow per-row pass with a
    broadcast hash join and never shuffles; multi-entry domains cannot
    fan out corpus rows because the join side is pre-aggregated to
    unique keys."""
    agg = blocklist.groupBy(
        F.lower(F.col(domain_col)).alias("_bd")
    ).agg(
        F.max(F.col(prefix_col).isNull()).alias("_whole"),
        # collect_list skips NULLs: only real prefixes remain
        F.collect_list(prefix_col).alias("_prefixes"),
    )
    out = (
        df.withColumn("domain", registered_domain(url_col))
        .withColumn("_path", url_path(url_col))
        .join(F.broadcast(agg), F.col("domain") == F.col("_bd"), "left")
    )
    blocked = (
        F.coalesce(F.col("_whole"), F.lit(False))
        | F.coalesce(
            F.exists("_prefixes",
                     lambda p: F.col("_path").startswith(p)),
            F.lit(False),
        )
    )
    return out.withColumn("blocked", blocked).drop(
        "_bd", "_whole", "_prefixes", "_path")


def crawl_schedule(df: DataFrame, per_round: int,
                   url_col: str = "url", key_col: str = "doc_id",
                   salt: str = "crawl", n_buckets: int = 16,
                   broadcast_offsets: bool = True) -> DataFrame:
    """Politeness-constrained fetch scheduling: a crawler may fetch at
    most ``per_round`` urls per host per scheduling round (the
    classic frontier rule — per-host rate limits dominate crawl
    makespan, cf. Common Crawl / Heritrix frontier design).  Every url
    gets ``(fetch_round, fetch_slot)``: its host-local rank — ordered
    by (salted 60-bit hash, key), a deterministic spread — divided /
    modulo ``per_round``.

    Scale shape: the naive form is one window over host, which
    funnels a hot host (the million-page domain every crawl has)
    through ONE task.  Here the rank is the same two-pass prefix sum
    as corpus.epoch_shuffle, partitioned by (host, top-bit hash
    bucket): per-bucket counts -> per-host offsets via a window over
    the tiny (host, bucket, n) partials frame -> per-bucket
    row_number + offset.  The bucket id is a PREFIX of the sort key,
    so per-bucket ranks + offsets compose to the exact host-local
    rank; hot-host parallelism is ``n_buckets``.  Set
    ``broadcast_offsets=False`` when hosts number in the hundreds of
    millions (the offsets frame is n_hosts x n_buckets skinny rows) —
    the join then co-partitions with the rank exchange instead."""
    from ocr_spark.operators.corpus import _md5_60

    if n_buckets & (n_buckets - 1) or n_buckets <= 0:
        raise ValueError("n_buckets must be a power of two")
    shift = 60 - (n_buckets.bit_length() - 1)
    base = (
        df.withColumn("host", url_host(url_col))
        .withColumn("_h", _md5_60(key_col, salt))
        .withColumn("_hb", F.shiftright(F.col("_h"), shift))
    )
    partials = base.groupBy("host", "_hb").agg(F.count("*").alias("n"))
    w_off = (
        Window.partitionBy("host").orderBy("_hb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = partials.select(
        "host", "_hb",
        F.coalesce(F.sum("n").over(w_off), F.lit(0)).alias("_off"))
    if broadcast_offsets:
        offsets = F.broadcast(offsets)
    w_rn = Window.partitionBy("host", "_hb").orderBy("_h", key_col)
    rank = F.col("_off") + F.row_number().over(w_rn) - 1
    return (
        base.join(offsets, ["host", "_hb"])
        .withColumn("_rank", rank)
        .withColumn("fetch_round",
                    (F.col("_rank") / per_round).cast("long"))
        .withColumn("fetch_slot",
                    F.pmod(F.col("_rank"), F.lit(per_round)).cast("int"))
        .drop("_h", "_hb", "_off", "_rank")
    )


def parse_http_headers(col: str | Column) -> dict[str, Column]:
    """Parse a raw HTTP response-header block (the WARC response
    record prefix) into typed fields — status, media type, charset
    parameter, content length, redirect flag.  WAT/CDX builders and
    fetch-pipeline triage run exactly this projection before any body
    work.  Pure JVM regexes ((?im) inline flags are RE2-compatible so
    the DuckDB oracle runs the identical patterns); zero shuffle.

    Returns {status, content_type, charset, content_length,
    is_redirect}; absent headers come back NULL (empty-string regex
    miss cast to a numeric is NULL on both engines — spelled with
    nullif in the oracle)."""
    c = F.col(col) if isinstance(col, str) else col
    status = F.regexp_extract(c, r"^HTTP/\d\.\d (\d{3})", 1).cast("int")
    ct_raw = F.regexp_extract(c, r"(?im)^Content-Type:\s*([^\r\n]+)", 1)
    content_type = F.when(
        ct_raw == "", F.lit(None).cast("string")
    ).otherwise(F.lower(F.trim(F.regexp_extract(ct_raw, r"^([^;]+)", 1))))
    charset = F.when(
        F.regexp_extract(ct_raw, r"(?i)charset=([A-Za-z0-9_\-]+)", 1) == "",
        F.lit(None).cast("string"),
    ).otherwise(F.lower(
        F.regexp_extract(ct_raw, r"(?i)charset=([A-Za-z0-9_\-]+)", 1)))
    content_length = F.nullif(
        F.regexp_extract(c, r"(?im)^Content-Length:\s*(\d+)", 1),
        F.lit("")).cast("long")
    return {
        "status": status,
        "content_type": content_type,
        "charset": charset,
        "content_length": content_length,
        "is_redirect": status.isin(301, 302, 307, 308),
    }


def robots_sitemaps(df: DataFrame, robots_col: str = "robots_txt",
                    host_col: str = "host") -> DataFrame:
    """Sitemap discovery from robots.txt: per RFC 9309 §2.3 the
    ``Sitemap:`` directive is GLOBAL (not scoped to a user-agent
    group), so extraction is a stateless case-insensitive line regex —
    no stateful group parse needed (unlike allow/disallow, which
    operators/web.py:robots_filter handles with the full parser).
    One row per (host, sitemap_url); hosts with no directive drop out.
    Per-row regex + explode — zero shuffle."""
    c = F.col(robots_col)
    urls = F.regexp_extract_all(c, F.lit(r"(?im)^sitemap:\s*(\S+)"), 1)
    return (df.select(host_col, F.explode(urls).alias("sitemap_url")))


def feed_entries(df: DataFrame, xml_col: str = "xml",
                 source_col: str = "feed_url") -> DataFrame:
    """RSS 2.0 / Atom feed XML -> one row per item/entry — the
    discovery companion to :func:`sitemap_urls` (feeds are how fresh
    content announces itself between sitemap rebuilds).

    Same implementation discipline as sitemap_urls: pure JVM regexp
    group extraction + posexplode — item blocks via a dotall
    ``<item>…</item>`` / ``<entry>…</entry>`` scan, per-block field
    extraction (RSS: title/link/guid/pubDate; Atom: title, ``<link
    href>``, id, updated), RE2-safe patterns that run identically in
    the SQL oracle, ``&amp;`` decoded, absent fields NULL.  Zero
    Python, zero shuffle: a per-row generate/projection.

    Returns ``(feed_url, kind, seq, title, link, entry_id,
    published)`` with ``kind in ('rss', 'atom')``; a payload with no
    items yields no rows (absence is the signal, as with outlinks)."""
    def field(block, pat):
        return F.nullif(
            F.replace(F.trim(F.regexp_extract(block, pat, 1)),
                      F.lit("&amp;"), F.lit("&")),
            F.lit(""))

    def shape(kind, block_pat, link_pat, id_pat, date_pat):
        blocks = F.regexp_extract_all(F.col(xml_col), F.lit(block_pat), 1)
        out = df.select(
            F.col(source_col).alias("feed_url"),
            F.posexplode(blocks).alias("seq", "_b"),
        )
        b = F.col("_b")
        return out.select(
            "feed_url", F.lit(kind).alias("kind"), "seq",
            field(b, r"(?s)<title>([^<]*)</title>").alias("title"),
            field(b, link_pat).alias("link"),
            field(b, id_pat).alias("entry_id"),
            field(b, date_pat).alias("published"),
        )

    rss = shape("rss", r"(?s)<item>(.*?)</item>",
                r"(?s)<link>([^<]*)</link>",
                r"(?s)<guid[^>]*>([^<]*)</guid>",
                r"(?s)<pubDate>([^<]*)</pubDate>")
    atom = shape("atom", r"(?s)<entry>(.*?)</entry>",
                 r'(?s)<link[^>]*href="([^"]*)"',
                 r"(?s)<id>([^<]*)</id>",
                 r"(?s)<updated>([^<]*)</updated>")
    return rss.unionByName(atom)


def parse_crawl_delay(txt: str, agent: str = "*") -> float | None:
    """Crawl-delay for ``agent`` from robots.txt (the de-facto
    directive Bing/Yandex honor; not in RFC 9309, hence parsed
    SEPARATELY from :func:`parse_robots`'s allow/disallow groups —
    same group semantics: the agent's own group wins over ``*``,
    consecutive User-agent lines share a block, first value in the
    winning group applies).  Non-numeric or negative values are
    ignored (treated as absent); returns None when no group sets one
    — the CALLER owns the default, crawl policy is not a parser
    decision."""
    groups: dict[str, float] = {}
    current_agents: list[str] = []
    in_rules = False
    for raw in (txt or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_rules:
                current_agents = []
                in_rules = False
            current_agents.append(val.lower())
        elif key in ("allow", "disallow", "crawl-delay"):
            in_rules = True
            if key == "crawl-delay":
                try:
                    delay = float(val)
                except ValueError:
                    continue
                if delay < 0:
                    continue
                for a in current_agents:
                    groups.setdefault(a, delay)
    agent = agent.lower()
    if agent in groups:
        return groups[agent]
    return groups.get("*")


def crawl_delay_hosts(robots: DataFrame, agent: str = "*",
                      default_delay: float = 1.0,
                      host_col: str = "host",
                      txt_col: str = "robots_txt") -> DataFrame:
    """Per-host crawl-delay table: ``(host, crawl_delay,
    max_per_minute)`` — the politeness input :func:`crawl_schedule`'s
    round pacing consumes (fetch wall-clock ≈ fetch_round x delay).
    Arrow-batched parse of the tiny robots corpus (one row per host —
    robots.txt is per-authority, so this table is always orders of
    magnitude smaller than the page corpus and broadcasts into any
    join that needs it)."""
    def kernel(batches):
        import math

        import pandas as pd

        for pdf in batches:
            delays = []
            for txt in pdf[txt_col]:
                d = parse_crawl_delay(txt if txt is not None else "", agent)
                delays.append(default_delay if d is None else d)
            yield pd.DataFrame({
                "host": pdf[host_col],
                "crawl_delay": delays,
                "max_per_minute": [
                    int(math.floor(60.0 / d)) if d > 0 else 60
                    for d in delays],
            })

    return robots.select(host_col, txt_col).mapInPandas(
        kernel,
        schema="host string, crawl_delay double, max_per_minute int",
    )


def url_templates(df: DataFrame, url_col: str = "url",
                  min_pages: int = 2) -> DataFrame:
    """URL path-template mining: collapse every digit run in the path
    to ``N`` and count pages per (registered domain, template) — the
    standard detector for mass-produced page families (``/tag/N``,
    ``/page/N``, ``/story/N/``, calendar archives) that inflate a
    crawl with near-content-free permutations.  Frontier schedulers
    down-prioritize flagged templates; curation pipelines cap them the
    way domain_topk caps domains.

    Returns ``(domain, path_template, n_pages, mass_produced)`` with
    the flag at ``n_pages >= min_pages``.  One skinny hash aggregate
    over per-row (domain, template) projections — map-side partials
    absorb the hot template, no windows, no explode."""
    return (
        df.select(
            registered_domain(url_col).alias("domain"),
            F.regexp_replace(url_path(url_col), "[0-9]+", "N")
            .alias("path_template"),
        )
        .groupBy("domain", "path_template")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .withColumn("mass_produced", F.col("n_pages") >= min_pages)
    )


def resolve_redirects(edges: DataFrame, src: str = "src", dst: str = "dst",
                      max_hops: int = 16) -> DataFrame:
    """Resolve redirect CHAINS to their final landing page by pointer
    jumping (path doubling) -> ``(src, final_url, hops, resolved)``.

    Crawls see single-hop redirects (HTTP 301/302 Location, meta
    refresh, rel=canonical), but the page a url actually denotes is the
    END of the chain: A -> B -> C -> D means A's content lives at D.
    Dedup/canonicalization must collapse A,B,C onto D, and frontier
    schedulers must not re-fetch interior hops.  ``canonical_collapse``
    (above) is the single-hop special case; this operator closes the
    transitive chain.

    Semantics (shared with the SQL oracle):

    * the edge list is made FUNCTIONAL first — ``min(dst)`` per src —
      so a url with conflicting recorded redirects resolves
      deterministically;
    * ``resolved`` is true iff following edges from ``src`` reaches a
      TERMINAL url (one with no outgoing edge) within ``max_hops``
      hops; then ``final_url`` is that terminal and ``hops`` the exact
      chain length;
    * redirect LOOPS (A -> B -> A) and chains longer than ``max_hops``
      come back ``resolved = false`` with NULL final_url/hops — the
      mid-cycle position after 2^r hops is an implementation detail and
      is deliberately not exposed.

    ``max_hops`` must be a power of two: the loop runs exactly
    ``log2(max_hops)`` pointer-doubling rounds, after which every
    pointer has advanced min(2^r, chain length) hops.  Real redirect
    chains are short (browsers cap around 20), so the default 16 covers
    them in 4 rounds.

    Scale shape: per-round state is the skinny ``(src, ptr, hops)``
    projection — three columns regardless of page width; each round is
    ONE self equi-join on the pointer key plus a ``localCheckpoint`` to
    truncate lineage (the same iterative discipline as pagerank above
    and the connected-components clustering, operators/dedup.py).
    O(log max_hops) rounds total vs O(max_hops) for naive per-hop
    walking — at web scale the chain table is billions of rows and 4
    joins beat 16.  The hot key is a mega-target (one landing page that
    millions of urls redirect to): it appears as the JOIN key on the
    probe side, which AQE skew-join splits; the terminal-detection join
    against the distinct src-key set is a semi-join-shaped lookup that
    broadcasts when the chain table is small."""
    if max_hops < 2 or (max_hops & (max_hops - 1)) != 0:
        raise ValueError(f"max_hops must be a power of two >= 2, "
                         f"got {max_hops}")
    # ONE eager materialization of the skinny functional edge list:
    # srcs and the round-0 pointer table both derive from it, so a
    # heavy upstream producer (e.g. an Arrow markup kernel) runs
    # exactly once however many times the loop re-reads the state
    # (round-4 bench: redirect_graph 12.6s -> ~3s from this alone)
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .groupBy("src").agg(F.min("dst").alias("ptr"))
         .localCheckpoint())
    srcs = e.select("src")
    ptr = e.select("src", "ptr", F.lit(1).alias("hops"))
    rounds = max_hops.bit_length() - 1  # log2 of a power of two
    for _ in range(rounds):
        nxt = ptr.select(F.col("src").alias("ptr"),
                         F.col("ptr").alias("_ptr2"),
                         F.col("hops").alias("_hops2"))
        ptr = (
            ptr.join(nxt, "ptr", "left")
            .select(
                "src",
                F.coalesce("_ptr2", F.col("ptr")).alias("ptr"),
                (F.col("hops")
                 + F.coalesce("_hops2", F.lit(0))).alias("hops"),
            )
            .localCheckpoint()
        )
    is_src = srcs.select(F.col("src").alias("ptr"),
                         F.lit(True).alias("_is_src"))
    return (
        ptr.join(is_src, "ptr", "left")
        .select(
            "src",
            F.when(F.col("_is_src").isNull(), F.col("ptr"))
            .alias("final_url"),
            F.when(F.col("_is_src").isNull(), F.col("hops")).alias("hops"),
            F.col("_is_src").isNull().alias("resolved"),
        )
    )


def stitch_series(pages: DataFrame, edges: DataFrame,
                  key_col: str = "url", text_col: str = "text",
                  src: str = "src", dst: str = "dst",
                  max_hops: int = 16, sep: str = "\n") -> DataFrame:
    """Reassemble multi-page articles (rel=next pagination chains) into
    single documents -> ``(series_id, n_pages, text)``.

    Publishers split articles across /page/1../page/N urls; a corpus
    that keeps them as separate documents fragments the text (bad for
    LM training: truncated context, per-page boilerplate ratios) and
    triple-counts the article in per-domain stats.  Given the pages
    table and the rel=next edge list (from ``rel_links_pages``), every
    chain collapses to ONE row keyed by its LAST page (the chain
    terminal — the only member every page can reach), with page texts
    concatenated in reading order.

    Built on :func:`resolve_redirects` (same pointer doubling, same
    ``max_hops`` power-of-two contract): each member resolves to the
    terminal in O(log max_hops) joins, reading-order position is
    ``max(hops in series) - hops``, and the concat is one grouped
    ``array_sort(collect_list(struct(position, text)))`` — a series is
    at most pagination-deep (browsers cap redirect/pagination chains
    ~20), so the per-group state is small by construction, never a
    skew hazard.  Standalone pages (no rel=next in or out) pass
    through as 1-page series of themselves.  Contract notes: pages
    trapped in a rel=next LOOP are malformed markup and fall back to
    1-page series of themselves (stitching identity, nothing dropped);
    in-branching (two pages pointing to the same next) merges into one
    series — position ties order by text, deterministically."""
    # eager-materialize the skinny edge list once: it feeds the
    # resolver's pointer loop AND the non-source/loop membership
    # passes below, and upstream it is typically a full markup-kernel
    # scan (rel_links_pages) that must not re-run per consumer
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .localCheckpoint())
    res = resolve_redirects(e, max_hops=max_hops)
    members = res.filter(F.col("resolved")).select(
        F.col("src").alias(key_col),
        F.col("final_url").alias("series_id"),
        F.col("hops"),
    )
    # non-members: never a rel=next source (terminals + standalone
    # pages), plus loop-trapped pages (unresolved) — all 1-page series
    # of themselves at hops 0
    non_src = (pages.select(key_col)
               .join(e.select(F.col("src").alias(key_col)).distinct(),
                     key_col, "left_anti"))
    loops = res.filter(~F.col("resolved")).select(F.col("src").alias(key_col))
    selves = non_src.union(loops).select(
        F.col(key_col),
        F.col(key_col).alias("series_id"),
        F.lit(0).alias("hops"),
    )
    placed = members.union(selves)
    depth = placed.groupBy("series_id").agg(
        F.max("hops").alias("chain_len"))
    return (
        placed.join(depth, "series_id")
        .withColumn("position", F.col("chain_len") - F.col("hops"))
        .join(pages.select(key_col, text_col), key_col)
        .groupBy("series_id")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct(F.col("position"),
                                 F.col(text_col).alias("t")))),
                    lambda s: s["t"],
                ),
                sep,
            ).alias("text"),
        )
    )


def host_lang_profile(df: DataFrame, url_col: str = "url",
                      lang_col: str = "lang") -> DataFrame:
    """Per-registered-domain language profile ->
    ``(domain, n_docs, n_langs, top_share, lang_entropy)``.

    Legitimate sites are overwhelmingly monolingual (or cleanly split
    by subdomain/path); machine-generated spam farms and scraped-
    content mills serve MANY languages from one domain.  High
    ``lang_entropy`` (Shannon, nats) with low ``top_share`` is the
    standard domain-level red flag next to domain_quality's
    blocklist-hit rate — both feed the same per-domain keep/cap
    decision (RefinedWeb/C4-style curation).

    Shape: two chained hash aggregates — per (domain, lang) counts,
    then per domain — so a mega-domain is absorbed map-side by partial
    aggregation of the skinny count rows; the entropy sum runs over at
    most |languages| rows per domain.  No windows, no explode, text
    never moves."""
    d = df.select(registered_domain(url_col).alias("domain"),
                  F.col(lang_col).alias("lang"))
    per = d.groupBy("domain", "lang").agg(F.count(F.lit(1)).alias("n"))
    tot = per.groupBy("domain").agg(
        F.sum("n").alias("total"),
        F.count(F.lit(1)).alias("n_langs"),
        F.max("n").alias("top_n"),
    )
    p = F.col("n") / F.col("total")
    return (
        per.join(tot, "domain")
        .groupBy("domain")
        .agg(
            F.max("total").alias("n_docs"),
            F.max("n_langs").alias("n_langs"),
            F.round(F.max(F.col("top_n") / F.col("total")), 6)
            .alias("top_share"),
            F.round(-F.sum(p * F.log(p)), 6).alias("lang_entropy"),
        )
    )


def reciprocal_links(edges: DataFrame, src: str = "src",
                     dst: str = "dst") -> DataFrame:
    """Link-exchange (reciprocal-link) detection over the site graph ->
    ``(node, out_degree, n_mutual, reciprocity)``.

    Organic linking is overwhelmingly one-directional (a page cites a
    source; the source does not cite back); link farms and paid
    link-exchange rings produce dense MUTUAL edges.  High
    ``reciprocity`` (mutual / out-degree) is a classic link-spam
    signal (TrustRank-era heuristics) that composes with the
    PageRank/HITS authority priors: authority earned through
    reciprocal rings gets discounted before graph_prior feeds the
    keep decision.

    Shape: the mutual set is ONE self equi-join of the deduped edge
    list on the reversed key — an equi-join, never a cartesian — and
    both counts are hash aggregates with map-side partials absorbing
    hub nodes.  Nodes with no outgoing edges do not appear (they can
    have no reciprocity)."""
    e = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
         .filter(F.col("a") != F.col("b")).distinct())
    rev = e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    mutual = e.join(rev, ["a", "b"])
    deg = e.groupBy("a").agg(F.count(F.lit(1)).alias("out_degree"))
    mut = mutual.groupBy("a").agg(F.count(F.lit(1)).alias("n_mutual"))
    return (
        deg.join(mut, "a", "left")
        .select(
            F.col("a").alias("node"),
            "out_degree",
            F.coalesce("n_mutual", F.lit(0)).alias("n_mutual"),
            F.round(F.coalesce("n_mutual", F.lit(0))
                    / F.col("out_degree"), 6).alias("reciprocity"),
        )
    )


def triangle_count(edges: DataFrame, src: str = "src",
                   dst: str = "dst") -> DataFrame:
    """Per-node triangle counts + clustering coefficient over the
    (undirected view of the) link graph ->
    ``(node, degree, triangles, coef_num, coef_den)``.

    Triangles are the backbone of web-graph community/spam analysis:
    link farms are triangle-dense, organic citation graphs are
    triangle-sparse, and the local clustering coefficient
    ``2T(v) / (deg(v) * (deg(v)-1))`` separates the two.  The
    coefficient is published as an exact INTEGER numerator/denominator
    pair (``coef_num = 2*T``, ``coef_den = deg*(deg-1)``) so the
    oracle gate has zero float hazard; production callers divide
    downstream.

    Shape — degree-ordered orientation (Suri & Vassilvitskii, WWW'11;
    the standard distributed-triangle trick):

    1. symmetrize + dedup to an undirected edge set (one equi-join
       free pass: least/greatest + distinct);
    2. orient every undirected edge from the endpoint with the LOWER
       (degree, node) total-order key to the higher one.  Every node's
       out-degree in the oriented graph is O(sqrt(m)) regardless of
       its raw degree, so
    3. the wedge self-join on the oriented source — the only
       quadratic-risk step — is bounded per node by that sqrt(m) cap
       even for a 10^8-degree hub, and
    4. each wedge closes against the oriented edge list with ONE
       equi-join on the (v1, v2) pair key; each triangle is produced
       exactly once.

    All joins are equi-joins; counts are hash aggregates with map-side
    partials.  Nodes in the edge set with no triangle come back with
    ``triangles = 0``; degree-1 nodes get ``coef_den = 0`` (undefined
    coefficient, the caller's convention)."""
    und = (edges.select(F.least(F.col(src), F.col(dst)).alias("a"),
                        F.greatest(F.col(src), F.col(dst)).alias("b"))
           .filter(F.col("a") != F.col("b")).distinct())
    deg = (und.select(F.col("a").alias("node"))
           .unionAll(und.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("degree")))
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("dga"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("dgb"))
    # least/greatest gave a < b, so on a degree tie (a, b) is already
    # the low->high orientation; flip only when deg(b) < deg(a).
    keyed = und.join(da, "a").join(db, "b")
    o = keyed.select(
        F.when(F.col("dgb") < F.col("dga"), F.col("b"))
         .otherwise(F.col("a")).alias("u"),
        F.when(F.col("dgb") < F.col("dga"), F.col("a"))
         .otherwise(F.col("b")).alias("v"),
        F.when(F.col("dgb") < F.col("dga"), F.col("dga"))
         .otherwise(F.col("dgb")).alias("dgv"),
    ).localCheckpoint()  # reused 3x (two wedge legs + close); tiny (3 ints/edge)
    w1 = o.select("u", F.col("v").alias("v1"), F.col("dgv").alias("d1"))
    w2 = o.select("u", F.col("v").alias("v2"), F.col("dgv").alias("d2"))
    # keep each unordered wedge once, ordered by the SAME total order
    # used for orientation, so the closing edge is exactly (v1 -> v2)
    wedges = (w1.join(w2, "u")
              .filter((F.col("d1") < F.col("d2")) |
                      ((F.col("d1") == F.col("d2")) &
                       (F.col("v1") < F.col("v2")))))
    close = o.select(F.col("u").alias("v1"), F.col("v").alias("v2"))
    tris = wedges.join(close, ["v1", "v2"]).select("u", "v1", "v2")
    per_node = (tris.select(F.explode(F.array("u", "v1", "v2")).alias("node"))
                .groupBy("node").agg(F.count(F.lit(1)).alias("triangles")))
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node", "degree",
            F.coalesce("triangles", F.lit(0)).alias("triangles"),
            (F.lit(2) * F.coalesce("triangles", F.lit(0))).alias("coef_num"),
            (F.col("degree") * (F.col("degree") - 1)).alias("coef_den"),
        )
    )


def label_propagation(edges: DataFrame, seeds: DataFrame, n_iter: int = 3,
                      src: str = "src", dst: str = "dst",
                      node_col: str = "node",
                      label_col: str = "label") -> DataFrame:
    """Semi-supervised label propagation over an undirected link graph
    (Zhu & Ghahramani 2002; the web-scale topic/spam labeling move:
    a few thousand human-labeled hosts, everything else inferred from
    link structure).  Each round, every NON-seed node takes the
    majority label among its labeled neighbors from the previous
    round; seeds are clamped; ties break to the SMALLEST label and
    nodes with no labeled neighbor stay unlabeled — both rules
    deterministic so a SQL oracle can unroll the identical rounds.

    Returns ``(node, label, is_seed)`` for every node in the graph
    (label NULL if propagation never reached it).

    Scale shape per round: one equi-join of the skinny (node, label)
    table against the symmetrized edge list, one (node, label) hash
    aggregate (map-side partials absorb hub nodes), one argmax via
    struct max — no windows over the full graph, no collects;
    ``localCheckpoint`` truncates iterative lineage exactly like
    pagerank/connected_components."""
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    nodes = e.select(F.col("u").alias("node")).distinct()
    sd = seeds.select(F.col(node_col).alias("node"),
                      F.col(label_col).alias("seed_label")).distinct()
    base = nodes.join(sd, "node", "left").localCheckpoint()
    labels = base.select("node", F.col("seed_label").alias("label"))
    for _ in range(n_iter):
        neigh = (
            e.join(labels.withColumnRenamed("node", "v"), "v")
            .where(F.col("label").isNotNull())
            .groupBy(F.col("u").alias("node"), "label")
            .agg(F.count("*").alias("cnt"))
        )
        # majority with min-label tie-break: max of (cnt, -label)
        vote = (
            neigh.groupBy("node")
            .agg(F.max(F.struct(F.col("cnt"),
                                (-F.col("label")).alias("nl"))).alias("m"))
            .select("node", (-F.col("m.nl")).alias("vote_label"))
        )
        labels = (
            base.join(vote, "node", "left")
            .select("node",
                    F.coalesce("seed_label", "vote_label").alias("label"))
            .localCheckpoint()
        )
    return (
        base.join(labels, "node")
        .select("node", "label",
                F.col("seed_label").isNotNull().alias("is_seed"))
    )


def hreflang_groups(links: DataFrame, url_col: str = "url",
                    lang_col: str = "hreflang",
                    href_col: str = "href") -> DataFrame:
    """Multilingual translation-group alignment from hreflang
    alternate declarations (one input row per ``<link rel=alternate
    hreflang>`` as emitted by ``extract.hreflang_pages``): per page,
    the group identity, its declared language, and how well-formed its
    declarations are.

    Under the hreflang convention every member of a translation
    cluster declares the FULL member set including itself, so group
    identity is a per-page-local reduction — ``min(href)`` over the
    page's own non-x-default alternates — and needs NO graph
    traversal: pages with identical (well-formed) declarations land in
    the same group by construction, and a page whose declaration
    deviates (missing members) fractures out visibly instead of
    corrupting its neighbours.  Deviations are additionally surfaced
    as ``n_nonreciprocal``: the page's outgoing alternates (to other
    urls, x-default excluded) that no page declares back.

    Output per page: (url, page_lang, group_id, n_langs,
    has_x_default, n_nonreciprocal).  ``page_lang`` is the hreflang of
    the self-referencing alternate (NULL if the page omits itself).

    Scale: rows are skinny (url, lang, href) strings; ONE groupBy on
    url for the per-page reduction plus one distinct + anti-join on
    (src, dst) for reciprocity — no component iteration, no html.  At
    10^12 pages the anti-join is the only O(edges) exchange and both
    sides are the same deduplicated projection (AQE handles the skew
    of hub-less hreflang sets; clusters are bounded by the language
    count, so no hot keys by construction)."""
    is_alt = F.col(lang_col) != "x-default"
    per_page = links.groupBy(url_col).agg(
        F.min(F.when(is_alt, F.col(href_col))).alias("group_id"),
        F.countDistinct(F.when(is_alt, F.col(lang_col))).alias("n_langs"),
        F.max(F.when(is_alt & (F.col(href_col) == F.col(url_col)),
                     F.col(lang_col))).alias("page_lang"),
        F.max((~is_alt).cast("int")).cast("boolean")
         .alias("has_x_default"),
    )
    out_edges = (links.filter(is_alt
                              & (F.col(href_col) != F.col(url_col)))
                 .select(F.col(url_col).alias("src"),
                         F.col(href_col).alias("dst"))
                 .distinct())
    rev = out_edges.select(F.col("dst").alias("src"),
                           F.col("src").alias("dst"))
    nonrecip = (out_edges.join(rev, ["src", "dst"], "left_anti")
                .groupBy("src").agg(F.count("*").alias("n_nonreciprocal")))
    return (per_page
            .join(nonrecip, per_page[url_col] == nonrecip["src"], "left")
            .drop("src")
            .withColumn("n_nonreciprocal",
                        F.coalesce("n_nonreciprocal", F.lit(0)))
            .select(url_col, "page_lang", "group_id", "n_langs",
                    "has_x_default", "n_nonreciprocal"))


def amp_collapse(pages: DataFrame, links: DataFrame,
                 url_col: str = "url") -> DataFrame:
    """AMP-variant collapse over a page population: pair canonical
    pages with their AMP variants via MUTUAL declarations (the
    canonical's ``<link rel=amphtml>`` must point at the AMP page AND
    the AMP page's ``<link rel=canonical>`` must point back — one-way
    declarations stay unpaired, exactly like hreflang reciprocity),
    then classify every page: ``canonical`` (has a mutual AMP
    variant, partner = its amp url), ``amp_variant`` (the mutual
    duplicate a curation pass drops, partner = its canonical), or
    ``plain`` (everything else, including dangling one-way
    declarations).  ``links`` is ``extract.rel_links_pages`` output
    (url, rel, href).

    Scale: the pair join and both classification joins are on skinny
    deduplicated (url, url) projections; the html never shuffles; at
    CommonCrawl scale AMP variants are ~1:1 with canonicals so no
    skew by construction."""
    amp_decl = (links.filter(F.col("rel") == "amphtml")
                .select(F.col(url_col).alias("canon_url"),
                        F.col("href").alias("amp_url")).distinct())
    canon_decl = (links.filter(F.col("rel") == "canonical")
                  .select(F.col("href").alias("canon_url"),
                          F.col(url_col).alias("amp_url")).distinct())
    pairs = amp_decl.join(canon_decl, ["canon_url", "amp_url"])
    as_canon = pairs.select(F.col("canon_url").alias(url_col),
                            F.col("amp_url").alias("amp_partner"))
    as_amp = pairs.select(F.col("amp_url").alias(url_col),
                          F.col("canon_url").alias("canon_partner"))
    return (pages.select(url_col)
            .join(as_canon, url_col, "left")
            .join(as_amp, url_col, "left")
            .select(
                url_col,
                F.when(F.col("amp_partner").isNotNull(),
                       F.lit("canonical"))
                 .when(F.col("canon_partner").isNotNull(),
                       F.lit("amp_variant"))
                 .otherwise(F.lit("plain")).alias("role"),
                F.coalesce("amp_partner", "canon_partner")
                 .alias("partner")))


def cocitation_pairs(edges: DataFrame, src: str = "src",
                     dst: str = "dst", max_out: int = 64,
                     min_count: int = 2) -> DataFrame:
    """Co-citation related-page mining (Small 1973, the web form):
    two pages are related when the same source links to both; the
    signal is the number of distinct co-citing sources.  Output one
    row per unordered pair (dst_a < dst_b) with ``n_cocite >=
    min_count``.

    Skew guard: the self-join expands each source's out-set
    quadratically, so hub sources (portals, sitemaps boilerplate)
    with out-degree > ``max_out`` are EXCLUDED up front by a skinny
    degree aggregate — the standard cap-and-report move this repo's
    LSH buckets use; at max_out=64 a source contributes at most
    2,016 pairs, bounding every join task.  Dropped-hub counts are
    cheap for the caller to audit (one filter on the same degree
    aggregate); exclusion UNDERCOUNTS pair support, never fabricates
    pairs — the conservative direction for a relatedness signal.

    Plan: dedup edges -> degree aggregate -> semi-join keep ->
    self-join on src (bounded fan-out) -> one hash aggregate on the
    skinny (dst_a, dst_b) pair key.  No html, no windows."""
    e = edges.select(src, dst).distinct()
    deg = e.groupBy(src).agg(F.count("*").alias("out_deg"))
    kept = e.join(deg.filter(F.col("out_deg") <= max_out)
                  .select(src), src)
    a = kept.select(src, F.col(dst).alias("dst_a"))
    b = kept.select(src, F.col(dst).alias("dst_b"))
    return (a.join(b, src)
            .filter(F.col("dst_a") < F.col("dst_b"))
            .groupBy("dst_a", "dst_b")
            .agg(F.count("*").alias("n_cocite"))
            .filter(F.col("n_cocite") >= min_count))


def robots_directives(kv: DataFrame, pages: DataFrame,
                      id_col: str = "doc_id",
                      headers_col: str = "headers") -> DataFrame:
    """Index-curation robots directives per page, merged from BOTH
    declaration channels the way indexers do: ``<meta name=robots>``
    tags (the ``meta_kv_pages`` rows with prefix 'robots') and the
    ``X-Robots-Tag`` response header (parsed with a pure JVM regex
    from the raw header block on ``pages``).  Token matching is
    word-bounded within the comma/space-separated directive list;
    ``none`` implies both noindex and nofollow; multiple declarations
    union (most-restrictive wins, per Google's documented conflict
    rule).  Output: (id, noindex, nofollow, indexable) for the WHOLE
    population — silent pages are indexable, which is why the
    population left join, not the kv rows, drives the output.

    Scale: one bool_or aggregate over the skinny kv rows + one
    broadcast-able join; the header regex is whole-stage-codegen'd;
    no Python beyond the shared meta kernel."""
    def has(col: Column, token: str) -> Column:
        return col.rlike(rf"(?i)(^|[,\s])(?:{token}|none)([,\s]|$)")

    meta = (kv.filter(F.col("key") == "robots")
            .groupBy(id_col)
            .agg(F.max(has(F.col("content"), "noindex").cast("int"))
                  .alias("m_noidx"),
                 F.max(has(F.col("content"), "nofollow").cast("int"))
                  .alias("m_nofol")))
    hdr = F.regexp_extract(F.col(headers_col),
                           r"(?im)^X-Robots-Tag:\s*([^\r\n]+)", 1)
    base = pages.select(
        id_col,
        has(hdr, "noindex").cast("int").alias("h_noidx"),
        has(hdr, "nofollow").cast("int").alias("h_nofol"))
    out = base.join(meta, id_col, "left")
    noindex = (F.coalesce("m_noidx", F.lit(0))
               + F.col("h_noidx") > 0).alias("noindex")
    nofollow = (F.coalesce("m_nofol", F.lit(0))
                + F.col("h_nofol") > 0).alias("nofollow")
    return out.select(id_col, noindex, nofollow).withColumn(
        "indexable", ~F.col("noindex"))


def link_depth(edges: DataFrame, seeds: DataFrame, max_hops: int = 8,
               src: str = "src", dst: str = "dst",
               node_col: str = "node") -> DataFrame:
    """Crawl-depth estimation: minimum link hops from any seed page
    (homepages, sitemap roots) to every reachable page — the
    frontier-BFS the crawl-prioritization literature keys on (depth
    correlates with quality; deep pages are calendar/faceted spam).
    Returns (node, depth) for REACHED nodes only (the caller
    left-joins the population; unreachable = NULL = orphan signal).

    Iteration discipline matches the repo's other fixed-point
    operators (components, pagerank, label propagation): bounded
    rounds, frontier-only expansion (settled nodes are never
    re-joined — each round's join input is the new frontier, not the
    whole distance table), per-round ``localCheckpoint`` to truncate
    lineage, and one cheap isEmpty action per round for early exit.
    State is the skinny (node, depth) pair; the hot-hub fan-in
    collapses in the frontier's distinct() map-side."""
    settled = seeds.select(F.col(node_col).alias("node"),
                           F.lit(0).alias("depth")).distinct()
    settled = settled.localCheckpoint()
    frontier = settled
    for h in range(1, max_hops + 1):
        nxt = (frontier
               .join(edges.select(F.col(src).alias("node"),
                                  F.col(dst).alias("nxt")), "node")
               .select(F.col("nxt").alias("node"),
                       F.lit(h).alias("depth"))
               .distinct())
        frontier = (nxt.join(settled.select("node"), "node",
                             "left_anti")
                    .localCheckpoint())
        if frontier.isEmpty():
            break
        settled = settled.unionByName(frontier).localCheckpoint()
    return settled


def kcore(edges: DataFrame, k: int = 3, max_rounds: int = 12,
          src: str = "src", dst: str = "dst") -> DataFrame:
    """k-core decomposition of the (undirected) link graph: iterative
    peeling of nodes with degree < k until the fixpoint — the dense
    residue is where link farms and mutual-promotion rings live
    (Seidman 1983 cores; the spam-graph pruning move of the web-graph
    literature).  Returns every surviving node with its degree INSIDE
    the final core.

    Semantics contract (shared with the unrolled SQL oracle): exactly
    the peel sequence up to ``max_rounds`` rounds; self-loops are
    dropped up front (they inflate degree by a cycle of one); the
    graph is symmetrized so direction never affects membership.

    Iteration discipline matches the repo's other fixed-point
    operators (link_depth, components, pagerank): state is the skinny
    symmetric edge list, per-round ``localCheckpoint`` truncates
    lineage, one tiny count action per round gives early exit, each
    round is a degree aggregate + two semi-joins (the hot hub is
    absorbed map-side by the partial count)."""
    e = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
         .filter(F.col("u") != F.col("v")))
    sym = (e.unionByName(e.select(F.col("v").alias("u"),
                                  F.col("u").alias("v")))
           .distinct()
           .localCheckpoint())
    n_prev = sym.select("u").distinct().count()
    for _ in range(max_rounds):
        keep = (sym.groupBy("u").agg(F.count("*").alias("d"))
                .filter(F.col("d") >= k).select("u"))
        sym = (sym.join(keep, "u", "left_semi")
               .join(keep.select(F.col("u").alias("v")), "v",
                     "left_semi")
               .localCheckpoint())
        n_now = sym.select("u").distinct().count()
        if n_now == n_prev:
            break
        n_prev = n_now
    return (sym.groupBy(F.col("u").alias("node"))
            .agg(F.count("*").alias("degree")))


def anchor_classify(edges: DataFrame,
                    categories: dict[str, tuple[str, ...]],
                    dst_col: str = "dst",
                    anchor_col: str = "anchor",
                    materialize: bool = True) -> DataFrame:
    """Anchor-vote page classification — the off-page signal search
    and crawl-prioritization stacks lean on: how OTHER pages describe
    a target beats how it describes itself.  Incoming anchor tokens
    (case-folded) vote through a keyword->category table; each target
    gets its winning category (votes desc, ties to the alphabetically
    first), its winning vote count, and the total matched votes (the
    winner/total ratio is the caller's confidence signal).  Targets
    with no matching anchor token emit nothing.  A keyword listed
    under two categories votes for both — dictionary hygiene is the
    caller's contract.

    Plan: explode anchor tokens (anchors are short — single words to
    a few), broadcast-join the literal keyword table so only voting
    tokens survive, two skinny (dst, category) aggregates, and an
    order-free struct-min argmax — no window over a hot in-degree
    target."""
    from ocr_spark.functions.text import tokens

    spark = edges.sparkSession
    kw = F.broadcast(spark.createDataFrame(
        [(w, c) for c, ws in sorted(categories.items())
         for w in sorted(ws)],
        "term string, category string"))
    toks = edges.select(
        F.col(dst_col).alias("dst"),
        F.explode(tokens(F.lower(F.col(anchor_col)))).alias("term"))
    votes = (toks.join(kw, "term")
             .groupBy("dst", "category")
             .agg(F.count("*").alias("n_votes")))
    if materialize:
        # (dst, category) votes are tiny and feed BOTH the total and
        # the argmax; lazy, the edge source (often an Arrow outlink
        # kernel) re-runs per consumer
        votes = votes.localCheckpoint(eager=False)
    tot = votes.groupBy("dst").agg(
        F.sum("n_votes").alias("n_votes_total"))
    best = (votes.groupBy("dst")
            .agg(F.min(F.struct(
                (-F.col("n_votes")).alias("nv"),
                F.col("category").alias("c"))).alias("b")))
    return (best.join(tot, "dst")
            .select("dst",
                    F.col("b").getField("c").alias("category"),
                    (-F.col("b").getField("nv")).alias("n_votes"),
                    "n_votes_total"))
