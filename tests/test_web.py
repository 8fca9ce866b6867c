"""Web url operators: normalization rules, host/registered-domain
extraction, and the two-phase per-domain top-k (hot-domain safe)."""

from pyspark.sql import functions as F

from ocr_spark.operators.web import (domain_topk, registered_domain,
                                     url_host, url_normalize)


def _norm(spark, url):
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(url_normalize("url").alias("n")).first()["n"]


def test_url_normalize_rules(spark):
    cases = {
        # scheme+host lowercase, path case preserved
        "HTTP://WWW.Ex.COM/Path": "http://www.ex.com/Path",
        # default ports stripped (scheme-matched only)
        "http://a.com:80/x": "http://a.com/x",
        "https://a.com:443/x": "https://a.com/x",
        "http://a.com:8080/x": "http://a.com:8080/x",
        "https://a.com:80/x": "https://a.com:80/x",  # not https default
        # fragment dropped
        "https://a.com/x#frag": "https://a.com/x",
        # tracking params dropped, survivors sorted, empty query gone
        "https://a.com/x?utm_source=f&b=2&a=1": "https://a.com/x?a=1&b=2",
        "https://a.com/x?fbclid=1&gclid=2": "https://a.com/x",
        "https://a.com/x?": "https://a.com/x",
        # trailing slash trimmed on non-root path, kept on root
        "https://a.com/x/": "https://a.com/x",
        "https://a.com/": "https://a.com/",
        # scheme-less input survives
        "a.com/x/": "a.com/x",
    }
    for url, want in cases.items():
        assert _norm(spark, url) == want, url


def test_url_normalize_idempotent(spark):
    urls = ["HTTP://WWW.Ex.COM:80/A/?utm_source=x&b=2&a=1#f",
            "https://news.b.co.uk/s/1/", "host.com/plain"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = [r["n"] for r in df.select(url_normalize("url").alias("n")).collect()]
    df2 = spark.createDataFrame([(u,) for u in once], "url string")
    twice = [r["n"] for r in df2.select(url_normalize("url").alias("n")).collect()]
    assert once == twice


def test_host_and_registered_domain(spark):
    cases = [
        ("https://user:pw@Sub.Ex.COM:8443/p?q#f", "sub.ex.com", "ex.com"),
        ("http://news.bbc.co.uk/x", "news.bbc.co.uk", "bbc.co.uk"),
        ("https://a.b.c.deep.org/", "a.b.c.deep.org", "deep.org"),
        ("localhost/x", "localhost", "localhost"),
        ("https://ex.com", "ex.com", "ex.com"),
    ]
    df = spark.createDataFrame([(u,) for u, _, _ in cases], "url string")
    got = df.select(
        "url", url_host("url").alias("h"), registered_domain("url").alias("d")
    ).collect()
    want = {u: (h, d) for u, h, d in cases}
    for r in got:
        assert (r["h"], r["d"]) == want[r["url"]], r["url"]


def _topk_reference(rows, k):
    """Naive per-domain top-k: score desc, url asc."""
    from collections import defaultdict
    by_dom = defaultdict(list)
    for url, dom, score in rows:
        by_dom[dom].append((url, score))
    keep = set()
    for dom, members in by_dom.items():
        members.sort(key=lambda m: (-m[1], m[0]))
        keep.update(u for u, _ in members[:k])
    return keep


def test_domain_topk_matches_naive_on_skewed_domains(spark):
    # one spam domain with 400 pages, a co.uk domain with 10, singletons
    rows = []
    for i in range(400):
        rows.append((f"https://spam.farm.com/p{i:04d}", i % 37))
    for i in range(10):
        rows.append((f"https://news.bbc.co.uk/s{i}", 100 - i))
    for i in range(5):
        rows.append((f"https://solo{i}.org/x", 1))
    df = spark.createDataFrame(rows, "url string, score long")
    dom_of = {r["url"]: r["d"] for r in df.select(
        "url", registered_domain("url").alias("d")).collect()}
    ref_rows = [(u, dom_of[u], s) for u, s in rows]
    for n_salts in (1, 4, 16):
        out = domain_topk(df, k=3, score_col="score", n_salts=n_salts)
        got = {r["url"] for r in out.collect()}
        assert got == _topk_reference(ref_rows, 3), f"n_salts={n_salts}"
    # the hot domain is actually capped
    out3 = domain_topk(df, k=3, score_col="score").collect()
    per_dom = {}
    for r in out3:
        per_dom[r["domain"]] = per_dom.get(r["domain"], 0) + 1
    assert per_dom["farm.com"] == 3
    assert per_dom["bbc.co.uk"] == 3
    assert all(v <= 3 for v in per_dom.values())
