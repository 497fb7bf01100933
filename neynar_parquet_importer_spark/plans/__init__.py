from .queries import QUERIES, ORACLE_SQL, flagship

__all__ = ["QUERIES", "ORACLE_SQL", "flagship"]
