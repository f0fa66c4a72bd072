"""UGFraud detector family, rebuilt Ray-Data-first.

Each detector follows the reference's 3-phase contract (SURVEY §2.10):
build state from (edges, priors) tables -> iterate (superstep engine or
dedicated actor pool) -> read out score Datasets.
"""
