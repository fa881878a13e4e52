"""Pipeline operators: cooccurrence/LLR similarity, row similarity with

pluggable measures, top-K, dedup family, ANN, the recommender stack
(user/item/CMS/SVD/implicit-ALS + baselines), classifiers, clustering,
decompositions, iterative solvers (CG/LSMR/eigen), and evaluation. All
long-form DataFrame plans — joins/groupBy/window only; no Python in the
hot path (Arrow-batched NumPy kernels where Spark lacks the primitive).
"""
