"""Graph layer (SURVEY.md §2.7): the property graph stays relational —
a vertices DataFrame + an edges DataFrame (GraphFrames model). All
iterative algorithms are driver-looped DataFrame join/agg rounds with
localCheckpoint-based lineage truncation, so they scale with the
cluster rather than a single machine's RAM (the reference pickles a
4.6M-node igraph object whole; ref: infrastructure/repositories/
graph_repo.py:12-63).
"""
