from .registry import REGISTRY, all_oracles, all_queries, query

__all__ = ["REGISTRY", "all_oracles", "all_queries", "query"]
