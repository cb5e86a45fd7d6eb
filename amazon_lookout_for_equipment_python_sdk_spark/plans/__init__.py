"""Query registry: named engine queries + their ANSI-SQL oracles."""

from .queries import QUERIES, ORACLE_SQL, load  # noqa: F401
