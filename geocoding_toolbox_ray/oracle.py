"""DuckDB oracle SQL builders.

Every SQL string here is assembled from the same constants/builders the
Ray kernels use (``functions/*.py`` ``*_sql`` helpers, the synthetic
reference ``VALUES`` literal), so the driver's Ray-vs-DuckDB comparison is
a mechanical identity check, not a re-implementation.
"""

from __future__ import annotations

from .functions.cleanse import cleanse_street_sql, cleanse_zone_sql
from .functions.scoring import score_sql
from .functions.standardize import standardize_sql
from .pipelines.candidates import derive_sql
from .sources.synthetic import address_points_values_sql
from .stages.matcher import no_candidates_message


def geocode_orders_sql(accept_score: int = 70) -> str:
    """Full 11-column geocode output over candidates derived from ``orders``."""
    msg = no_candidates_message(accept_score).replace("'", "''")
    return f"""
WITH candidates AS ({derive_sql()}),
cleansed AS (
    SELECT primary_key, input_street, input_zone,
           {cleanse_street_sql('input_street')} AS street_clean,
           {cleanse_zone_sql('input_zone')} AS zone_clean
    FROM candidates
),
std AS (
    SELECT *, {standardize_sql('street_clean')} AS addr_std_in,
           lower(zone_clean) AS zone_key
    FROM cleansed
),
{address_points_values_sql('ap')},
scored AS (
    SELECT s.primary_key, s.addr_std_in,
           ap.point_id, ap.addr_std, ap.match_address, ap.x, ap.y,
           ap.address_grid, ap.locator,
           {score_sql('s.addr_std_in', 'ap.addr_std')} AS score
    FROM std s
    JOIN ap ON (ap.zone = s.zone_key OR ap.zip = s.zone_key)
),
best AS (
    SELECT *, row_number() OVER (
        PARTITION BY primary_key
        ORDER BY score DESC, addr_std ASC, point_id ASC
    ) AS rn
    FROM scored
),
winners AS (SELECT * FROM best WHERE rn = 1 AND score >= {accept_score})
SELECT s.primary_key,
       s.input_street,
       s.input_zone,
       COALESCE(w.x, 0.0) AS x,
       COALESCE(w.y, 0.0) AS y,
       COALESCE(w.score, 0) AS score,
       w.locator AS "locator",
       w.match_address AS "matchAddress",
       CASE WHEN w.primary_key IS NOT NULL THEN s.addr_std_in END AS "standardizedAddress",
       w.address_grid AS "addressGrid",
       CASE WHEN w.primary_key IS NULL THEN '{msg}' END AS "message"
FROM std s
LEFT JOIN winners w ON w.primary_key = s.primary_key
"""


def counters_sql(accept_score: int = 70) -> str:
    """Run-level counters over the geocode output (reference A1-A3,
    geocode.py:136-163): floor(x+0.5) replaces round() so Python and DuckDB
    cannot disagree on halves."""
    return f"""
WITH output AS ({geocode_orders_sql(accept_score)})
SELECT COUNT(*) AS total,
       SUM(CASE WHEN message IS NULL THEN 1 ELSE 0 END) AS success,
       SUM(CASE WHEN message IS NULL THEN 0 ELSE 1 END) AS fail,
       CAST(floor(100.0 * SUM(CASE WHEN message IS NULL THEN 0 ELSE 1 END)
                  / COUNT(*) + 0.5) AS BIGINT) AS failure_rate,
       CAST(floor(CAST(SUM(CASE WHEN message IS NULL THEN score END) AS DOUBLE)
                  / SUM(CASE WHEN message IS NULL THEN 1 ELSE 0 END) + 0.5) AS BIGINT)
           AS avg_score
FROM output
"""


def cleanse_street_documents_sql() -> str:
    """Cleansing conformance over real text (documents.text)."""
    return (
        "SELECT doc_id, "
        + cleanse_street_sql("text")
        + " AS street_clean FROM documents"
    )


def cleanse_zone_orders_sql() -> str:
    """Zone-cleanse conformance incl. the ZIP5 truncation branch: 6-digit
    strings starting with 8 derived from o_orderkey."""
    return (
        "SELECT o_orderkey, "
        + cleanse_zone_sql("CAST(800000 + o_orderkey AS VARCHAR)")
        + " AS zone_clean, "
        + cleanse_zone_sql("o_orderpriority")
        + " AS zone_clean_text FROM orders"
    )
