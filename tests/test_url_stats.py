"""url_stats / domain_counts: URL evidence and domain document-frequency."""

from peri_spark.functions import domain_counts, url_stats


def _corpus(spark):
    rows = [
        (0, "no links here"),
        (1, "see https://A.Example.com/p/1 and https://a.example.com/q "
            "plus http://cdn.example.net:8080/x?y=1#frag"),
        (2, 'quoted "https://b.example.com/path" and <https://b.example.com>'),
        (3, "bare host http://host-only.org then text"),
        (4, None),
        (5, "trailing punctuation https://c.example.com/p."),
    ]
    return spark.createDataFrame(rows, "id long, text string")


def test_url_stats_counts_and_domains(spark):
    got = {r.id: r for r in url_stats(_corpus(spark), "text").collect()}
    assert got[0].n_urls == 0 and got[0].domains == []
    # id 1: three URLs, two distinct hosts (case-folded)
    assert got[1].n_urls == 3 and got[1].n_domains == 2
    assert got[1].domains == ["a.example.com", "cdn.example.net"]
    # id 2: quotes and angle brackets terminate the path, host still seen
    assert got[2].n_urls == 2 and got[2].domains == ["b.example.com"]
    # id 3: scheme+host with no path
    assert got[3].domains == ["host-only.org"]
    assert got[4].n_urls is None or got[4].n_urls == 0
    # id 5: '.' is a legal path char — the full URL matches
    assert got[5].n_urls == 1


def test_url_stats_is_projection_only(spark):
    plan = url_stats(_corpus(spark), "text") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_domain_counts_document_frequency(spark):
    rows = [
        (0, "https://x.org/a https://x.org/b"),   # x.org counted ONCE
        (1, "https://x.org/c and https://y.org"),
        (2, "http://y.org/d"),
        (3, "nothing"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r.domain: r.n_docs for r in domain_counts(df, "text").collect()}
    assert got == {"x.org": 2, "y.org": 2}


def test_domain_counts_topk_rank(spark):
    rows = [(i, f"https://d{i % 3}.org/x https://common.org/y")
            for i in range(9)]
    df = spark.createDataFrame(rows, "id long, text string")
    top = domain_counts(df, "text", k=2).collect()
    assert [(r.domain, r.n_docs, r.rank) for r in top] == [
        ("common.org", 9, 1), ("d0.org", 3, 2)]
