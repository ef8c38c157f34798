"""Fuzzy search (F1-F4): FIXTURES.md invariants 10."""

from pyspark.sql import functions as F

from social_link_prediction_spark.search import fuzzy


def _index(spark):
    nodes = spark.createDataFrame(
        [
            ("Q1", "Taylor Swift", "human", 0),
            ("Q2", "Taylor Swift", "human", 1),  # homonym
            ("Q3", "Sơn Tùng M-TP", "human", 2),
            ("Q4", "Taylor", "human", 3),
            ("Q5", "Completely Different", "human", 4),
        ],
        ["id", "name", "type", "pyg_id"],
    )
    return nodes, fuzzy.build_search_index(nodes)


def test_exact_match_scores_100(spark):
    _, idx = _index(spark)
    out = fuzzy.fuzzy_lookup(idx, "taylor swift")
    rows = out.collect()
    assert all(r.score == 100.0 for r in rows)
    assert {r.id for r in rows} == {"Q1", "Q2"}  # homonyms both returned


def test_diacritic_exact(spark):
    _, idx = _index(spark)
    out = fuzzy.fuzzy_lookup(idx, "son tung m-tp").collect()
    assert len(out) == 1 and out[0].id == "Q3"


def test_cutoff_drops_garbage(spark):
    _, idx = _index(spark)
    out = fuzzy.fuzzy_lookup(idx, "zzzzqqqq").collect()
    assert out == []  # invariant 10: below threshold 60 dropped


def test_prefix_bonus_ranks_prefix_first(spark):
    _, idx = _index(spark)
    out = fuzzy.fuzzy_lookup(idx, "taylor swif").collect()
    assert out and out[0].name.startswith("Taylor")


def test_pyg_translation(spark):
    nodes, _ = _index(spark)
    fwd = fuzzy.id_to_pyg(nodes, "Q3").first()
    assert (fwd.type, fwd.pyg_id) == ("human", 2)
    back = fuzzy.pyg_to_id(nodes, "human", 2).first()
    assert back.id == "Q3"


def test_fuzzy_levenshtein_scorer_forced(spark):
    idx_src = spark.createDataFrame(
        [(1, "small ring"), (2, "smoke grenade"), (3, "ring")], ["id", "name"]
    )
    from social_link_prediction_spark.search import fuzzy as fz

    idx = fz.build_search_index(idx_src)
    out = fz.fuzzy_lookup(idx, "smal ring", scorer="levenshtein").collect()
    assert out and out[0].id == 1  # 1 edit away, prefix-adjacent
