"""Oracle-paired query catalog, split into sequential family modules.

The modules form a chain: each imports the previous one and copies its
namespace (helpers, oracle-twin SQL builders, and the SHARED
``QUERIES``/``ORACLES`` registry dicts), so the 498-entry catalog
behaves exactly like the original single-module registration script
while no file exceeds ~7k lines. Import ``c07`` (or
``social_link_prediction_spark.queries``, the public facade) to get
the fully-populated registry.
"""
