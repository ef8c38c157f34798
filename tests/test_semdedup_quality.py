"""Round-3 pipeline operators: semantic dedup, PII scrub, quality
filter, k-core."""

from pyspark.sql import functions as F

from social_link_prediction_spark.graph import motifs as gmot
from social_link_prediction_spark.pipelines import semdedup as sdd
from social_link_prediction_spark.pipelines import text as ptx


def _emb_df(spark):
    """Two tight groups along different axes plus one outlier; 4-dim."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0, 0.0]),   # near-dup of 0
        (2, [0.98, -0.1, 0.05, 0.0]),  # near-dup of 0 and 1
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.05, 0.99, 0.0, 0.1]),   # near-dup of 3
        (5, [0.0, 0.0, 1.0, 0.0]),     # singleton
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


_CENTROIDS4 = [
    [1.0, 0.0, 0.0, 0.0],
    [0.0, 1.0, 0.0, 0.0],
    [0.0, 0.0, 1.0, 0.0],
    [0.0, 0.0, 0.0, 1.0],
]


def test_ivf_cells_assignment(spark):
    cells = sdd.ivf_cells(_emb_df(spark), _CENTROIDS4)
    got = {r.id: r.cell for r in cells.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 2}


def test_semantic_pairs_within_cell_only(spark):
    cells = sdd.ivf_cells(_emb_df(spark), _CENTROIDS4)
    pairs = sdd.semantic_pairs(cells, threshold=0.9).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    # cross-cell pairs (e.g. 0-3) can never appear even at threshold 0
    assert got == {(0, 1), (0, 2), (1, 2), (3, 4)}
    for r in pairs:
        assert r.cosine >= 0.9


def test_semantic_dedup_keeps_min_id_per_group(spark):
    cells = sdd.ivf_cells(_emb_df(spark), _CENTROIDS4)
    out = {r.id: r.keep for r in sdd.semantic_dedup(cells, threshold=0.9).collect()}
    assert out == {0: 1, 1: 0, 2: 0, 3: 1, 4: 0, 5: 1}


def test_kmeans_cells_shape(spark):
    cells = sdd.kmeans_cells(_emb_df(spark), k=3, seed=11)
    rows = cells.collect()
    assert len(rows) == 6
    assert set(cells.columns) == {"id", "v", "cell"}
    # near-identical vectors land in the same learned cell
    got = {r.id: r.cell for r in rows}
    assert got[0] == got[1] == got[2]
    assert got[3] == got[4]


def test_scrub_pii_counts_and_replacement(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@test.org and ssn 123-45-6789 done"),
            (2, "call 555-123-4567 from 10.0.0.1 twice 555.123.4567"),
            (3, "clean text no pii"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in ptx.scrub_pii(df).collect()}
    assert out[1].n_email == 1 and out[1].n_ssn == 1
    assert out[1].text_scrubbed == "mail <EMAIL> and ssn <SSN> done"
    assert out[2].n_phone == 2 and out[2].n_ipv4 == 1
    assert out[2].text_scrubbed == "call <PHONE> from <IP> twice <PHONE>"
    assert out[3].text_scrubbed == "clean text no pii"
    assert out[3].n_email == out[3].n_ssn == out[3].n_phone == out[3].n_ipv4 == 0


def test_quality_filter_rules(spark):
    df = spark.createDataFrame(
        [
            (1, "too short"),
            (2, " ".join(["word"] * 40)),               # low diversity
            (3, " ".join(["tok%d" % i for i in range(40)])),  # kept
            (4, " ".join(["!" for _ in range(40)])),      # punct noise
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in ptx.quality_filter(df).collect()}
    assert out[1].drop_reason == "too_short" and out[1].keep == 0
    assert out[2].drop_reason == "low_diversity"
    assert out[3].drop_reason is None and out[3].keep == 1
    assert out[4].drop_reason == "low_diversity" or out[4].drop_reason == "punct_noise"


def test_k_core_peels_cascade(spark):
    # triangle (1,2,3) + a path 3-4-5 hanging off it: 2-core = the
    # triangle only, and removing 5 then 4 needs a 2-round cascade
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], ["src", "dst"]
    )
    core = gmot.k_core(edges, k=2)
    got = {r.id: r.degree for r in core.collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_k_core_empty_when_k_too_high(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    assert gmot.k_core(edges, k=5).count() == 0


def test_k_core_keeps_whole_graph_when_k_low(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], ["src", "dst"])
    core = gmot.k_core(edges, k=1)
    assert core.count() == 3


def test_semantic_pairs_blas_matches_sql(spark):
    cells = sdd.ivf_cells(_emb_df(spark), _CENTROIDS4)
    blas = {
        (r.id_a, r.id_b): r.cosine
        for r in sdd.semantic_pairs(cells, threshold=0.5, impl="blas").collect()
    }
    sql = {
        (r.id_a, r.id_b): r.cosine
        for r in sdd.semantic_pairs(cells, threshold=0.5, impl="sql").collect()
    }
    assert set(blas) == set(sql)
    for k in blas:
        assert abs(blas[k] - sql[k]) < 2e-6
