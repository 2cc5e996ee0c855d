from .registry import ORACLE, QUERIES, query

__all__ = ["ORACLE", "QUERIES", "query"]
