"""Cleaning operators (P1-P15) against reference semantics."""

from pyspark.sql import functions as F

from social_link_prediction_spark.operators import cleaning as cl


def test_strip_value_suffix_prunes_metadata(raw_bindings):
    out = cl.strip_value_suffix(raw_bindings)
    assert "person" in out.columns
    assert "personLabel" in out.columns
    assert all(not c.endswith(".type") and ":" not in c for c in out.columns)


def test_snake_case():
    assert cl.to_snake_case("personLabel") == "person_label"
    assert cl.to_snake_case("objectSubType") == "object_sub_type"
    assert cl.to_snake_case("birth Year-x") == "birth_year_x"


def test_uri_to_qid(spark):
    df = spark.createDataFrame(
        [("http://www.wikidata.org/entity/Q42",), ("Q7",)], ["u"]
    ).select(cl.uri_to_qid("u").alias("q"))
    assert [r.q for r in df.collect()] == ["Q42", "Q7"]


def test_scrub_and_empty_null(spark):
    df = spark.createDataFrame([("  a\r\nb\tc  ", "")], ["s", "e"]).select(
        cl.scrub_text("s").alias("s"), cl.empty_to_null("e").alias("e")
    )
    row = df.first()
    assert row.s == "a b c"
    assert row.e is None


def test_qid_filters(spark):
    df = spark.createDataFrame(
        [("Q1", "Q2", "Alice", "Bob"), ("bad", "Q2", "A", "B"), ("Q3", "Q4", "Q3", "C")],
        ["person", "object", "person_label", "object_label"],
    )
    valid = cl.filter_valid_qids(df, "person", "object")
    assert valid.count() == 2
    resolved = cl.filter_resolved_labels(valid, "person_label", "object_label")
    assert resolved.count() == 1


def test_coerce_int(spark):
    df = spark.createDataFrame([("1990",), ("junk",), ("",)], ["y"]).select(
        cl.coerce_int("y").alias("y")
    )
    assert [r.y for r in df.collect()] == [1990, None, None]


def test_normalize_name_diacritics(spark):
    df = spark.createDataFrame([("  Sơn Tùng M-TP ",)], ["n"]).select(
        cl.normalize_name("n").alias("n")
    )
    assert df.first().n == "son tung m-tp"
