"""operators/webtext.py + graph.py::connected_components_star: web-corpus
preparation ops and the large-star/small-star components loop."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def test_canonicalize_url_cases(spark):
    from stackstac_spark.operators.webtext import canonicalize_url, registered_domain

    df = spark.createDataFrame(
        [
            # fragment + tracking params + sort + www + default port + case
            (1, "HTTPS://WWW.Example.CO.UK:443/Path/Sub/?utm_source=tw&b=2&a=1#frag"),
            (2, "http://news.site.com:80/a//"),  # default port + trailing slashes
            (3, "https://api.foo.org/x?z=9&y=8&gclid=abc"),  # param sort + gclid
            (4, "https://bare.io"),  # nothing to rewrite
            (5, "http://h.net:8080/p?a=1"),  # NON-default port preserved
            (6, "https://CaSe.com/UPPER/Path"),  # path case preserved
            # ':443' in the PATH is data, not a port — must survive
            (7, "https://a.com/redir/host:443/x"),
            # :443 on an http URL is a real, non-default port — preserved
            (8, "http://b.com:443/y"),
            # :80 on an https URL is a real, non-default port — preserved
            (9, "https://c.com:80/z"),
            # scheme-default port with a query right after the authority
            (10, "http://d.com:80?a=1"),
        ],
        ["id", "url"],
    )
    out = {
        r["id"]: (r["cu"], r["dom"])
        for r in df.select(
            "id",
            canonicalize_url(F.col("url")).alias("cu"),
            registered_domain(canonicalize_url(F.col("url"))).alias("dom"),
        ).collect()
    }
    assert out[1] == ("https://example.co.uk/Path/Sub?a=1&b=2", "example.co.uk")
    assert out[2] == ("http://news.site.com/a", "site.com")
    assert out[3] == ("https://api.foo.org/x?y=8&z=9", "foo.org")
    assert out[4] == ("https://bare.io", "bare.io")
    assert out[5] == ("http://h.net:8080/p?a=1", "h.net")
    assert out[6] == ("https://case.com/UPPER/Path", "case.com")
    assert out[7] == ("https://a.com/redir/host:443/x", "a.com")
    assert out[8] == ("http://b.com:443/y", "b.com")
    assert out[9] == ("https://c.com:80/z", "c.com")
    assert out[10] == ("http://d.com?a=1", "d.com")


def test_registered_domain_bare_host(spark):
    from stackstac_spark.operators.webtext import registered_domain

    df = spark.createDataFrame(
        [("a.b.co.uk",), ("x.com",), ("localhost",), ("deep.sub.ex.org",)], ["h"]
    )
    got = [r[0] for r in df.select(registered_domain(F.col("h"))).collect()]
    assert got == ["b.co.uk", "x.com", "localhost", "ex.org"]


def test_strip_html_traps(spark):
    from stackstac_spark.operators.webtext import strip_html

    html = (
        '<html><head><style>p{color:red}</style><script>if(1<2){x="<b>";}'
        "</script></head><body><h1>Ti&amp;tle</h1><p>Hello &nbsp; world "
        "&lt;tag&gt; &amp;lt;</p><!-- c --></body></html>"
    )
    df = spark.createDataFrame([(html,)], ["h"])
    (got,) = df.select(strip_html(F.col("h"))).collect()[0]
    # script content (with embedded '<') removed wholesale; &amp;lt; decodes
    # to the literal text '&lt;', not '<'
    assert got == "Ti&tle Hello world <tag> &lt;"


def test_domain_cap_deterministic(spark):
    from stackstac_spark.operators.webtext import domain_cap

    df = spark.createDataFrame(
        [(i, "d%d" % (i % 3)) for i in range(60)], ["doc_id", "domain"]
    )
    out = domain_cap(df, cap=4)
    assert out.count() == 12
    per = {r["domain"]: r["n"] for r in out.groupBy("domain").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per == {"d0": 4, "d1": 4, "d2": 4}
    # deterministic across runs
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in domain_cap(df, cap=4).collect())
    assert a == b


def test_blocklist_hits_zero_hit_docs_survive(spark):
    from stackstac_spark.operators.webtext import blocklist_hits

    docs = spark.createDataFrame(
        [(1, "bad word here"), (2, "all clean text"), (3, "bad bad bad")],
        ["doc_id", "text"],
    )
    bl = spark.createDataFrame([("bad",)], ["word"])
    out = {r["doc_id"]: r for r in blocklist_hits(docs, bl, max_ratio=0.5).collect()}
    assert out[1]["n_hits"] == 1 and out[1]["keep"] is True
    assert out[2]["n_hits"] == 0 and out[2]["keep"] is True
    assert out[3]["n_hits"] == 3 and out[3]["keep"] is False


def _brute_components(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cc_star_vs_union_find(spark, seed):
    import random

    rng = random.Random(seed)
    edges = [(rng.randrange(80), rng.randrange(80)) for _ in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    from stackstac_spark.operators.graph import connected_components_star

    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    # driver_threshold=0 pins the distributed star rounds; the default
    # driver union-find path is covered by test_cc_star_dual_path_agreement
    got = {
        r["node"]: r["component"]
        for r in connected_components_star(df, driver_threshold=0).collect()
    }
    assert got == _brute_components(edges)


def test_cc_star_double_root_topology(spark):
    # Regression (r9 ADVICE): after one LS/SS round this topology is
    # {(3,1),(3,2),(10,1),(11,2)} — no node is both hi and lo, but node 3
    # has TWO pure-root parents. The old star-forest check stopped here,
    # splitting component {1,2,3,10,11} across roots 1 and 2 and emitting
    # node 3 twice. The unique-parent convergence condition must keep
    # iterating until everything hangs off root 1.
    from stackstac_spark.operators.graph import connected_components_star

    edges = [(10, 3), (10, 1), (11, 3), (11, 2)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    rows = connected_components_star(df, driver_threshold=0).collect()
    nodes = [r["node"] for r in rows]
    assert sorted(nodes) == [1, 2, 3, 10, 11]  # one row per node, no dups
    assert {r["component"] for r in rows} == {1}


def test_cc_star_no_duplicate_node_rows_random(spark):
    # the double-root bug surfaced as duplicate node rows; sweep a few
    # random graphs for row-multiplicity, not just label agreement
    import random

    from stackstac_spark.operators.graph import connected_components_star

    rng = random.Random(99)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(45)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    rows = connected_components_star(df).collect()
    nodes = [r["node"] for r in rows]
    assert len(nodes) == len(set(nodes))
    assert {r["node"]: r["component"] for r in rows} == _brute_components(edges)


@pytest.mark.parametrize("seed", [7, 8])
def test_cc_star_dual_path_agreement(spark, seed):
    # optimization r12: the driver union-find fast path (default routing at
    # this size) must agree row-for-row with the distributed star rounds —
    # same nodes, same min-id component labels, same schema
    import random

    from stackstac_spark.operators.graph import connected_components_star

    rng = random.Random(seed)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(70)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    fast = connected_components_star(df)  # routes to _cc_driver
    slow = connected_components_star(df, driver_threshold=0)
    assert fast.schema == slow.schema
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, slow.collect()))


def test_cc_star_chain_adversary(spark):
    # a single long chain: the worst case for naive propagation, converges
    # in O(log^2) star rounds
    n = 120
    from stackstac_spark.operators.graph import connected_components_star

    df = spark.createDataFrame([(i, i + 1) for i in range(n)], ["id_a", "id_b"])
    out = connected_components_star(df).collect()
    assert len(out) == n + 1
    assert {r["component"] for r in out} == {0}


def test_cc_star_empty(spark):
    from pyspark.sql import types as T

    from stackstac_spark.operators.graph import connected_components_star

    empty = spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("id_a", T.LongType()),
                T.StructField("id_b", T.LongType()),
            ]
        ),
    )
    assert connected_components_star(empty).count() == 0
