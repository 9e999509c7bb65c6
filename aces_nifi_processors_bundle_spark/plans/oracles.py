"""DuckDB oracle SQL for every query in `queries.py`.

Each string runs on DuckDB 1.0 against pre-registered views (region
nation customer supplier part orders lineitem events documents
embeddings) over the same parquet the Spark query read. Column aliases
match the Spark output exactly (driver compare sorts by column name and
hashes values).
"""

from __future__ import annotations

ORACLES: dict[str, str] = {}


def oracle(name: str):
    def register(sql: str) -> str:
        ORACLES[name] = sql
        return sql
    return register


oracle("q_bin_flagship")(
    """
WITH bins AS (
  SELECT 'byDay.DAY.' || strftime(date_trunc('day', ts), '%Y-%m-%d') AS name FROM events
  UNION ALL
  SELECT 'byType.' || event_type FROM events
  UNION ALL
  SELECT 'dayType.byDay.DAY.' || strftime(date_trunc('day', ts), '%Y-%m-%d')
         || '|byType.' || event_type FROM events
)
SELECT name, CAST(count(*) AS BIGINT) AS total
FROM bins GROUP BY name ORDER BY name
"""
)
