"""Sources: paginated fetch semantics (S1-S3) + JSON flatten scan (S6/S7)."""

import json

from social_link_prediction_spark.sources import json_flatten as jf
from social_link_prediction_spark.sources import paginated as pg


class FakeFetcher:
    """Serves a fixed result set through LIMIT/OFFSET; optionally fails
    the first N calls to exercise retry/degrade."""

    def __init__(self, rows, fail_first=0):
        self.rows = rows
        self.fail_first = fail_first
        self.calls = 0

    def __call__(self, query):
        self.calls += 1
        if self.calls <= self.fail_first:
            raise RuntimeError("boom")
        limit = int(query.split("LIMIT")[1].split()[0])
        offset = int(query.split("OFFSET")[1].split()[0])
        return self.rows[offset : offset + limit]


def test_pagination_collects_all():
    rows = [{"x": {"value": str(i)}} for i in range(25)]
    f = FakeFetcher(rows)
    got = [r for page in pg.run_paginated_query("Q", f, page_size=10) for r in page]
    assert len(got) == 25
    assert f.calls == 3  # 10+10+5 (short page ends)


def test_retry_shrinks_page():
    rows = [{"x": {"value": str(i)}} for i in range(5)]
    f = FakeFetcher(rows, fail_first=2)
    pages = list(pg.run_paginated_query("Q", f, page_size=6000,
                                        retry=pg.RetryPolicy(page_shrink=2000)))
    assert sum(len(p) for p in pages) == 5
    assert f.calls == 3  # 2 failures + 1 success at shrunken size


def test_intervals():
    assert pg.create_intervals(1800, 1815, 5) == [(1800, 1805), (1805, 1810), (1810, 1815)]
    q = "SELECT ##YEAR_FILTER_HOOK##"
    f = FakeFetcher([])
    list(pg.run_interval_query(q, f, 1800, 1805, 5))
    # fetcher got a query with the filter injected
    assert f.calls == 1


def test_fetch_all_relationships(tmp_path):
    rows = [{"person": {"value": f"Q{i}"}} for i in range(3)]
    counts = pg.fetch_all_relationships(
        "BASE ##FIND_HOOK## ##YEAR_FILTER_HOOK##",
        {"spouse": "?x wdt:P26 ?y"},
        FakeFetcher(rows),
        str(tmp_path),
        start=1800, end=1805, step=5,
    )
    assert counts == {"spouse": 3}
    payload = json.loads((tmp_path / "raw_data_spouse.json").read_text())
    assert len(payload["results"]["bindings"]) == 3


def test_json_flatten_scan(spark, tmp_path):
    payload = {
        "head": {"vars": ["person", "personLabel"]},
        "results": {"bindings": [
            {"person": {"type": "uri", "value": "http://www.wikidata.org/entity/Q1"},
             "personLabel": {"type": "literal", "value": "Alice", "xml:lang": "en"}},
            {"person": {"type": "uri", "value": "http://www.wikidata.org/entity/Q2"}},
        ]},
    }
    p = tmp_path / "raw_data_spouse.json"
    p.write_text(json.dumps(payload))
    df = jf.read_sparql_json(spark, str(p))
    assert df.count() == 2
    cols = set(df.columns)
    assert "person.value" in cols and "personLabel.xml:lang" in cols
    vals = sorted(r["person.value"] for r in df.collect())
    assert vals[0].endswith("Q1")


def test_batched_values_lookup():
    seen = []

    def fetcher(q):
        seen.append(q)
        return [{"id": {"value": "Q1"}}]

    out = pg.batched_values_lookup(
        [f"Q{i}" for i in range(7)], "VALUES ?id { ##VALUES## }", fetcher, batch_size=3
    )
    assert len(seen) == 3  # ceil(7/3)
    assert "wd:Q0" in seen[0]


def test_python_datasource_paginated(spark, tmp_path):
    """S1-S3 via the Spark 4 Python DataSource: each (rel, interval)
    cell is its own input partition; pagination runs inside tasks."""
    from social_link_prediction_spark.sources.datasource import (
        HAVE_DATASOURCE,
        PaginatedSparqlDataSource,
    )

    if not HAVE_DATASOURCE:
        import pytest

        pytest.skip("pyspark<4: no Python DataSource API")

    fixtures = tmp_path / "cells"
    fixtures.mkdir()
    rows_a = [{"person": {"value": f"Q{i}"}} for i in range(7)]
    rows_b = [{"person": {"value": f"Q{i}"}} for i in range(3)]
    (fixtures / "spouse_1800_1805.json").write_text(json.dumps(rows_a))
    (fixtures / "spouse_1805_1810.json").write_text(json.dumps(rows_b))
    (fixtures / "sibling_1800_1805.json").write_text(json.dumps(rows_b))
    # sibling_1805_1810 intentionally missing -> empty cell

    spark.dataSource.register(PaginatedSparqlDataSource)
    df = (
        spark.read.format("sparql_paginated")
        .option("fixtures", str(fixtures))
        .option("relations", "spouse,sibling")
        .option("start", 1800)
        .option("end", 1810)
        .option("step", 5)
        .option("page_size", 4)  # forces multi-page reads within a cell
        .load()
    )
    assert df.rdd.getNumPartitions() == 4  # 2 rels x 2 intervals
    counts = {r["rel"]: r["count"] for r in df.groupBy("rel").count().collect()}
    assert counts == {"spouse": 10, "sibling": 3}
    # bindings are parseable JSON carrying the SPARQL envelope shape
    from pyspark.sql import functions as F

    parsed = df.select(
        F.get_json_object("binding", "$.person.value").alias("qid")
    )
    assert parsed.filter(F.col("qid").rlike("^Q\\d+$")).count() == 13


def test_register_views_sql_twin(spark):
    """spark.sql over registered views == DataFrame API result."""
    from social_link_prediction_spark.session import register_views

    sf_dir = "/root/testdata/sf0.001"
    register_views(spark, sf_dir)
    got = spark.sql(
        "SELECT o_orderpriority, count(*) AS n FROM orders "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"
    ).collect()
    import os

    df = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    from pyspark.sql import functions as F

    want = (
        df.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderpriority")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # events view carries the nanos->micros timestamp normalization
    assert dict(spark.table("events").dtypes)["ts"].startswith("timestamp")


class FakeTransport:
    """Records requests; fails the first N to exercise the retry path
    upstream in run_paginated_query."""

    def __init__(self, rows, fail_first=0):
        self.rows = rows
        self.fail_first = fail_first
        self.requests = []

    def __call__(self, url, body, headers):
        self.requests.append((url, body.decode(), dict(headers)))
        if len(self.requests) <= self.fail_first:
            raise OSError("connection reset")
        from urllib.parse import parse_qs

        q = parse_qs(self.requests[-1][1])["query"][0]
        limit = int(q.split("LIMIT")[1].split()[0])
        offset = int(q.split("OFFSET")[1].split()[0])
        return json.dumps(
            {"head": {"vars": ["x"]}, "results": {"bindings": self.rows[offset:offset + limit]}}
        ).encode()


def test_http_fetcher_requires_user_agent():
    import pytest

    with pytest.raises(ValueError, match="user_agent"):
        pg.http_fetcher()


def test_http_fetcher_request_shape():
    t = FakeTransport([{"x": {"value": "1"}}])
    f = pg.http_fetcher(endpoint="https://example.org/sparql", user_agent="ua/1.0", transport=t)
    out = f("SELECT ?x WHERE {}\nLIMIT 10 OFFSET 0")
    assert out == [{"x": {"value": "1"}}]
    url, body, headers = t.requests[0]
    assert url == "https://example.org/sparql"
    assert headers["User-Agent"] == "ua/1.0"
    assert headers["Accept"] == "application/sparql-results+json"
    assert "LIMIT+10" in body or "LIMIT%2010" in body or "LIMIT" in body


def test_http_fetcher_retry_and_shrink_through_pagination():
    """extractor.py:88-107 semantics end-to-end: transport errors make
    run_paginated_query shrink the page by 2000 and retry (max 20)."""
    rows = [{"x": {"value": str(i)}} for i in range(7)]
    t = FakeTransport(rows, fail_first=2)
    f = pg.http_fetcher(user_agent="ua/1.0", transport=t)
    pages = list(pg.run_paginated_query(
        "SELECT", f, page_size=6000,
        retry=pg.RetryPolicy(page_shrink=2000, min_page_size=1000),
    ))
    assert sum(len(p) for p in pages) == 7
    # 2 failures then success; page size shrank 6000 -> 4000 -> 2000
    assert len(t.requests) == 3
    assert "LIMIT 2000" in parse_query(t.requests[-1][1])


def parse_query(body):
    from urllib.parse import parse_qs

    return parse_qs(body)["query"][0]


def test_http_fetcher_exhausts_retries():
    import pytest

    t = FakeTransport([], fail_first=100)
    f = pg.http_fetcher(user_agent="ua/1.0", transport=t)
    with pytest.raises(OSError):
        list(pg.run_paginated_query(
            "SELECT", f, page_size=10000,
            retry=pg.RetryPolicy(max_retries=5),
        ))
    assert len(t.requests) == 6  # initial + 5 retries


def test_python_datasource_streaming(spark, tmp_path):
    """The same extraction as a Structured Streaming source: cell-list
    offsets, availableNow drains the backlog, stream total == batch
    total (exactly-once per cell)."""
    from social_link_prediction_spark.sources.datasource import (
        HAVE_DATASOURCE,
        HAVE_STREAM_READER,
        PaginatedSparqlDataSource,
    )

    if not (HAVE_DATASOURCE and HAVE_STREAM_READER):
        import pytest

        pytest.skip("pyspark<4: no Python DataSource streaming API")

    fixtures = tmp_path / "cells"
    fixtures.mkdir()
    rows_a = [{"person": {"value": f"Q{i}"}} for i in range(7)]
    rows_b = [{"person": {"value": f"Q{i}"}} for i in range(3)]
    (fixtures / "spouse_1800_1805.json").write_text(json.dumps(rows_a))
    (fixtures / "spouse_1805_1810.json").write_text(json.dumps(rows_b))
    (fixtures / "sibling_1800_1805.json").write_text(json.dumps(rows_b))

    spark.dataSource.register(PaginatedSparqlDataSource)
    stream = (
        spark.readStream.format("sparql_paginated")
        .option("fixtures", str(fixtures))
        .option("relations", "spouse,sibling")
        .option("start", 1800)
        .option("end", 1810)
        .option("step", 5)
        .option("page_size", 4)
        .option("cells_per_batch", 1)  # several micro-batches
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("sparql_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    # cells_per_batch=1 -> one cell per micro-batch; poll until the
    # offset walks the whole cell list (4 cells, 13 rows total)
    import time as _time

    deadline = _time.time() + 120
    while _time.time() < deadline:
        n = spark.sql("select count(*) as n from sparql_stream").first().n
        if n >= 13:
            break
        _time.sleep(0.5)
    q.stop()
    out = spark.sql("select rel, count(*) as n from sparql_stream group by rel").collect()
    assert {r.rel: r.n for r in out} == {"spouse": 10, "sibling": 3}


def test_datasource_stream_to_parquet_e2e(spark, tmp_path):
    """End-to-end continuous extraction: sparql_paginated stream ->
    JSON envelope projection -> exactly-once parquet append."""
    from pyspark.sql import functions as F

    from social_link_prediction_spark.sources.datasource import (
        HAVE_DATASOURCE,
        HAVE_STREAM_READER,
        PaginatedSparqlDataSource,
    )

    if not (HAVE_DATASOURCE and HAVE_STREAM_READER):
        import pytest

        pytest.skip("pyspark<4: no Python DataSource streaming API")

    fixtures = tmp_path / "cells"
    fixtures.mkdir()
    (fixtures / "spouse_1800_1805.json").write_text(
        json.dumps([{"person": {"value": f"Q{i}"}} for i in range(5)])
    )
    spark.dataSource.register(PaginatedSparqlDataSource)
    stream = (
        spark.readStream.format("sparql_paginated")
        .option("fixtures", str(fixtures))
        .option("relations", "spouse")
        .option("start", 1800).option("end", 1805).option("step", 5)
        .load()
        .select(
            "rel",
            F.get_json_object("binding", "$.person.value").alias("qid"),
        )
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", str(tmp_path / "edges"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    import time as _time

    deadline = _time.time() + 120
    while _time.time() < deadline:
        try:
            if spark.read.parquet(str(tmp_path / "edges")).count() >= 5:
                break
        except Exception:
            pass
        _time.sleep(0.5)
    q.stop()
    out = spark.read.parquet(str(tmp_path / "edges")).collect()
    assert sorted(r.qid for r in out) == [f"Q{i}" for i in range(5)]
    assert all(r.rel == "spouse" for r in out)


def test_read_jsonl_clean_quarantines_bad_lines(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from social_link_prediction_spark.sources.delimited import read_jsonl_clean

    p = tmp_path / "drop.jsonl"
    p.write_text(
        '{"id": 1, "name": "a"}\n'
        "this is not json\n"
        '{"id": 2, "name": "b"}\n'
        '{"id": "not-a-number", "name": "c"}\n'
    )
    schema = StructType(
        [StructField("id", LongType()), StructField("name", StringType())]
    )
    clean, quarantine = read_jsonl_clean(spark, str(p), schema)
    assert sorted((r.id, r.name) for r in clean.collect()) == [(1, "a"), (2, "b")]
    bad = sorted(r.raw_line for r in quarantine.collect())
    assert len(bad) == 2
    assert any("not json" in b for b in bad)
    assert all(r._input_file.endswith("drop.jsonl") for r in quarantine.collect())


def test_read_csv_clean_quarantines_untypable_rows(spark, tmp_path):
    from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

    from social_link_prediction_spark.sources.delimited import read_csv_clean

    p = tmp_path / "drop.csv"
    p.write_text("id,name,score\n1,a,1.5\ntwo,b,2.5\n3,c,oops\n4,d,4.0\n")
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("score", DoubleType()),
        ]
    )
    clean, quarantine = read_csv_clean(spark, str(p), schema)
    assert sorted((r.id, r.name, r.score) for r in clean.collect()) == [
        (1, "a", 1.5),
        (4, "d", 4.0),
    ]
    assert quarantine.count() == 2


def test_read_clean_rejects_reserved_column(spark):
    from pyspark.sql.types import StringType, StructField, StructType

    from social_link_prediction_spark.sources.delimited import (
        _with_capture,
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        _with_capture(StructType([StructField("_corrupt_record", StringType())]))
