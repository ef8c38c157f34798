"""social_link_prediction_spark — PySpark-native social-graph analytics engine.

A from-scratch, Spark-first re-implementation of the query and
data-processing capabilities of the reference system
(minhquang0407/social-link-prediction): SPARQL-extract ETL semantics,
relational cleaning/dedup/aggregation operators, graph analytics
(degrees, PageRank, weighted shortest paths, degrees-of-separation),
fuzzy name search, and link-prediction scoring — plus the
training-data-pipeline operators a 100 TB corpus needs (dedup,
similarity search, text analysis, multimodal columns).

Everything is expressed with the DataFrame/SQL API so Catalyst/AQE
pick physical strategies; Python UDFs appear only where JVM builtins
genuinely cannot express the semantics (and then as Arrow-batched
pandas UDFs).
"""

__version__ = "0.1.0"

from social_link_prediction_spark.session import get_spark  # noqa: F401
