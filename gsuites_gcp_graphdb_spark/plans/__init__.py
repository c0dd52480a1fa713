from .catalog import CATALOG, oracle_sql, queries

__all__ = ["CATALOG", "oracle_sql", "queries"]
