"""ML layer (SURVEY.md §2.9): feature engineering, leakage-safe link
splits, negative sampling, MLlib link-prediction models, and the
scan/recommend/constrained scoring queries.

Design decision (SURVEY §7.4.3): the reference's GraphSAGE encoder +
per-relation MLP decoders are replaced by an MLlib classifier over
engineered graph features (common neighbors, Adamic-Adar, degrees,
PageRank, embedding cosine). The QUERY capability is preserved —
scan/recommend/constrain return the same shapes with the same filters
and penalty arithmetic — and the embedding column is pluggable, so a
torch-produced embedding table drops in unchanged.
"""
