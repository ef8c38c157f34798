"""Catalog-chain integrity guards (r7 split: queries.py facade over
catalog/c01..c06.py — VERDICT r6 item 6)."""

import glob
import os

import social_link_prediction_spark
from social_link_prediction_spark import queries as q


def test_registry_complete_and_paired():
    assert len(q.QUERIES) >= 500
    assert set(q.ORACLES) == set(q.QUERIES)  # every entry oracle-paired
    assert all(callable(f) for f in q.QUERIES.values())


def test_facade_reexports_helpers():
    # the driver contract and tests reach helpers through the facade
    for name in ("_t", "_trunc_ntz", "_partsupp_edges", "query",
                 "pricing_summary", "QUERIES", "ORACLES"):
        assert hasattr(q, name), name


def test_no_catalog_module_exceeds_8k_lines():
    root = os.path.dirname(social_link_prediction_spark.__file__)
    for path in glob.glob(os.path.join(root, "catalog", "c*.py")):
        n = sum(1 for _ in open(path))
        assert n < 8000, f"{path}: {n} lines"


def test_chain_shares_one_registry():
    from social_link_prediction_spark.catalog import c01, c06

    assert c01.QUERIES is c06.QUERIES is q.QUERIES
    assert c01.ORACLES is c06.ORACLES is q.ORACLES
