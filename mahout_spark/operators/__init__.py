"""Pipeline operators: cooccurrence/LLR similarity, row similarity with

pluggable measures, top-K, dedup family, ANN, and the user-based
recommender. All long-form DataFrame plans — joins/groupBy/window only; no
Python in the hot path.
"""
