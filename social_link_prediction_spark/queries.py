"""Public facade of the oracle-paired query catalog.

The 498-entry registration script now lives in
``social_link_prediction_spark/catalog/c01.py`` … ``c07.py`` (VERDICT r6
item 6: no module >8k lines); importing the last link of the chain
populates the shared ``QUERIES``/``ORACLES`` dicts and accumulates every
helper. This module re-exports that namespace verbatim, so every
existing import site (``__spark_entry__``, bench, tests, tools) keeps
working unchanged.
"""
from social_link_prediction_spark.catalog import c07 as _tail

globals().update(
    {k: v for k, v in vars(_tail).items() if not k.startswith("__")}
)
del _tail
