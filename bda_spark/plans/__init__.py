from .registry import QUERIES, ORACLES, get_queries, get_oracles

__all__ = ["QUERIES", "ORACLES", "get_queries", "get_oracles"]
