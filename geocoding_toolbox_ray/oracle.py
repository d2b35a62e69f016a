"""DuckDB oracle SQL builders.

Every SQL string here is assembled from the same constants/builders the
Ray kernels use (``functions/*.py`` ``*_sql`` helpers, the synthetic
reference ``VALUES`` literal), so the driver's Ray-vs-DuckDB comparison is
a mechanical identity check, not a re-implementation.
"""

from __future__ import annotations

from .functions.cells import X0, Y0, cell_encode_sql
from .functions.text import WS_SPLIT_PATTERN
from .functions.cleanse import cleanse_street_sql, cleanse_zone_sql
from .functions.scoring import score_sql
from .functions.standardize import match_key_sql, standardize_sql
from .functions.tiles import tile_assign_sql
from .pipelines.candidates import derive_sql
from .pipelines.spatial import DX_BY_MOD3, DY_BY_MOD2
from .sources.synthetic import address_points_values_sql, parcels_bbox_values_sql
from .stages.matcher import no_candidates_message


def geocode_orders_sql(
    accept_score: int = 70,
    locators: str = "all",
    pobox: str = "false",
    wkid: int = 26912,
    candidates_sql: str | None = None,
    include_highways: bool = False,
    include_intersections: bool = False,
) -> str:
    """Full 11-column geocode output over candidates derived from ``orders``,
    parameterized exactly like the engine: locator-tier selection, PO Box
    admission, output spatial reference."""
    from .functions.project import project_xy_sql

    msg = no_candidates_message(accept_score).replace("'", "''")
    locator_filter = ""
    if locators == "addressPoints":
        locator_filter = " AND ap.locator = 'AddressPoints'"
    elif locators == "roadCenterlines":
        locator_filter = " AND ap.locator = 'RoadCenterlines'"
    x_out, y_out = "w.x", "w.y"
    if wkid != 26912:
        x_out, y_out = project_xy_sql("w.x", "w.y", wkid)
    return f"""
WITH candidates AS ({candidates_sql or derive_sql()}),
cleansed AS (
    SELECT primary_key, input_street, input_zone,
           {cleanse_street_sql('input_street')} AS street_clean,
           {cleanse_zone_sql('input_zone')} AS zone_clean
    FROM candidates
),
std0 AS (
    SELECT *, {standardize_sql('street_clean')} AS addr_std_in,
           lower(zone_clean) AS zone_key
    FROM cleansed
),
std AS (
    -- match key drops a fractional house suffix and a trailing unit
    -- designator/range; standardizedAddress keeps both (same match_key
    -- constants as the engine)
    SELECT *, {match_key_sql('addr_std_in')} AS addr_key FROM std0
),
{address_points_values_sql('ap', include_pobox=(pobox == 'true'), include_highways=include_highways, include_intersections=include_intersections)},
scored AS (
    SELECT s.primary_key, s.addr_std_in,
           ap.point_id, ap.addr_std, ap.match_address, ap.x, ap.y,
           ap.address_grid, ap.locator,
           {score_sql('s.addr_key', 'ap.addr_std')} AS score
    FROM std s
    JOIN ap ON (ap.zone = s.zone_key OR ap.zip = s.zone_key){locator_filter}
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
       COALESCE({x_out}, 0.0) AS x,
       COALESCE({y_out}, 0.0) AS y,
       COALESCE(w.score, 0) AS score,
       w.locator AS "locator",
       w.match_address AS "matchAddress",
       CASE WHEN w.primary_key IS NOT NULL THEN s.addr_std_in END AS "standardizedAddress",
       w.address_grid AS "addressGrid",
       CASE WHEN w.primary_key IS NULL THEN '{msg}' END AS "message"
FROM std s
LEFT JOIN winners w ON w.primary_key = s.primary_key
"""


def _pages_corpus_ctes() -> str:
    """CTE fragment regenerating the deterministic pages corpus (en pages
    only) fully in SQL: the page TEXT is rebuilt inside DuckDB from the
    very same generation constants the engine corpus uses
    (sources/pages.py ``_page_addresses`` / ``_build_html`` /
    ``extract_text`` — pure functions of the page index).  This makes the
    flagship pages pipelines hash-checkable with no filesystem fixture
    and no ordering dependence on which side the driver runs first
    (VERDICT r2 #2).  Exposes ``pgtext(i, url, text)``.

    Page count is sf-proportional exactly like the engine side:
    ``2 * COUNT(*) FROM orders`` (``__ray_entry__._pages_count_for``).
    """
    from .sources.pages import _FILLER, _LANG_CYCLE
    from .sources.synthetic import _address_point_rows

    pts = _address_point_rows()
    npts = len(pts)
    vals = ",\n".join(
        "({k}, '{ma}', '{zt}', '{zp}')".format(
            k=k,
            ma=r["match_address"].replace("'", "''"),
            zt=r["zone"].title().replace("'", "''"),
            zp=r["zip"],
        )
        for k, r in enumerate(pts)
    )
    nf = len(_FILLER)

    def filler(expr: str) -> str:
        branches = " ".join(
            f"WHEN {k} THEN '{f}'" for k, f in enumerate(_FILLER)
        )
        return f"CASE ({expr}) % {nf} {branches} END"

    def addr(j: int) -> str:
        return (
            f"(CASE WHEN (i + {j}) % 7 = 0 THEN '9999 N XYZZY' "
            f"ELSE p{j}.match_address END) || ', ' || "
            f"(CASE WHEN (i + {j}) % 2 = 0 THEN p{j}.zone_title "
            f"ELSE p{j}.zip END)"
        )

    def seg(j: int) -> str:
        return (
            f"CASE WHEN i % 4 > {j} THEN ' Contact us at ' || {addr(j)} "
            f"|| '. Note ' || {filler(f'i + {j}')} || '.' ELSE '' END"
        )

    en_mods = ", ".join(
        str(k) for k, l in enumerate(_LANG_CYCLE) if l == "en"
    )
    joins = "\n".join(
        f"    JOIN pgpts p{j} ON p{j}.pidx = (i * 7 + {j * 13}) % {npts}"
        for j in range(3)
    )
    return f"""pgpts(pidx, match_address, zone_title, zip) AS (VALUES
{vals}),
pgidx AS (
    SELECT unnest(generate_series(0, (SELECT 2 * COUNT(*) FROM orders) - 1)) AS i
),
pgtext AS (
    SELECT i,
           'https://site' || CAST(i % 1000 AS VARCHAR)
               || '.example.ut.us/page/' || CAST(i AS VARCHAR) AS url,
           'Page ' || CAST(i AS VARCHAR) || ' Listing ' || CAST(i AS VARCHAR)
               || {seg(0)}
               || {seg(1)}
               || {seg(2)}
               || ' ' || {filler('i')} || '.' AS text
    FROM pgidx
{joins}
    WHERE i % {len(_LANG_CYCLE)} IN ({en_mods})
)"""


def _pages_candidates_sql() -> str:
    """Candidates over the SQL-regenerated pages corpus, scanned with the
    IDENTICAL RE2-compatible ``ADDRESS_PATTERN`` via regexp_extract_all."""
    from .stages.extract import ADDRESS_PATTERN

    return f"""
WITH {_pages_corpus_ctes()},
pgext AS (
    SELECT url,
           regexp_extract_all(text, '{ADDRESS_PATTERN}', 1) AS streets,
           regexp_extract_all(text, '{ADDRESS_PATTERN}', 2) AS zones
    FROM pgtext
),
pgm AS (
    SELECT url, streets, zones,
           unnest(generate_series(1, len(streets))) AS k
    FROM pgext
)
SELECT url || '#' || CAST(k - 1 AS VARCHAR) AS primary_key,
       streets[k] AS input_street,
       zones[k] AS input_zone
FROM pgm
"""


def geocode_pages_sql(accept_score: int = 70) -> str:
    """Flagship end-to-end oracle: SQL-regenerated pages -> identical RE2
    extraction -> the existing geocode machinery (same 11-column output as
    the engine's ``pipelines/geocode.py geocode_pages``)."""
    return geocode_orders_sql(
        accept_score=accept_score, candidates_sql=_pages_candidates_sql()
    )


def curate_pages_sql() -> str:
    """Curation headline oracle over the SQL-regenerated pages corpus:
    same quality gate (token count + stopword permille), dedup keyed on
    the TEXT itself (``PARTITION BY text``) — content-identity grouping
    is hash-free in SQL, which leaves the engine free to use the fastest
    hash (md5; see pipelines/curate.py docstring), keep smallest url."""
    from .functions.text import quality_sql
    from .pipelines.curate import MAX_STOP_PERMILLE

    q = quality_sql("text")
    return f"""
WITH {_pages_corpus_ctes()},
pgq AS (
    SELECT url, text, {q['n_tokens']} AS n_tokens, {q['stop_permille']} AS sp
    FROM pgtext
),
pgg AS (
    SELECT url, text, n_tokens FROM pgq
    WHERE n_tokens > 0 AND sp <= {MAX_STOP_PERMILLE}
),
pgr AS (
    SELECT url, n_tokens,
           row_number() OVER (PARTITION BY text ORDER BY url ASC) AS rn
    FROM pgg
)
SELECT url, n_tokens FROM pgr WHERE rn = 1
"""


def counters_sql(accept_score: int = 70) -> str:
    """Run-level counters over the geocode output (reference A1-A3,
    geocode.py:136-163): floor(x+0.5) replaces round() so Python and DuckDB
    cannot disagree on halves."""
    return f"""
WITH output AS ({geocode_orders_sql(accept_score)})
SELECT COUNT(*) AS total,
       CAST(SUM(CASE WHEN message IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS success,
       CAST(SUM(CASE WHEN message IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS fail,
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


# ------------------------------------------------------------- spatial

def _anchored_points_cte(extra: str = "") -> str:
    """The anchored-points CTE; ``extra`` appends additional SELECT items
    (e.g. a measure column) without touching the shared point arithmetic."""
    dx = (
        f"CASE l_orderkey % 3 WHEN 0 THEN {DX_BY_MOD3[0]!r} "
        f"WHEN 1 THEN {DX_BY_MOD3[1]!r} ELSE {DX_BY_MOD3[2]!r} END"
    )
    dy = (
        f"CASE l_linenumber % 2 WHEN 0 THEN {DY_BY_MOD2[0]!r} "
        f"ELSE {DY_BY_MOD2[1]!r} END"
    )
    return (
        "qpts AS (SELECT l_orderkey * 10 + l_linenumber AS query_id, "
        f"ap.x + ({dx}) AS qx, ap.y + ({dy}) AS qy{extra} "
        "FROM lineitem JOIN ap ON ap.point_id = 1 + ((l_orderkey * 7 + l_linenumber) % 600))"
    )


def _uniform_points_select() -> str:
    return (
        "SELECT l_orderkey * 10 + l_linenumber AS query_id, "
        f"({X0!r} + CAST((l_orderkey * 131 + l_linenumber * 17) % 4096 AS DOUBLE) * 125.0) AS qx, "
        f"({Y0!r} + CAST((l_orderkey * 241 + l_partkey * 13) % 4096 AS DOUBLE) * 125.0) AS qy "
        "FROM lineitem"
    )


def pip_join_sql() -> str:
    return f"""
WITH {address_points_values_sql('ap')},
{parcels_bbox_values_sql('parcels')},
{_anchored_points_cte()},
hits AS (
    SELECT q.query_id, p.parcel_id,
           row_number() OVER (PARTITION BY q.query_id ORDER BY p.parcel_id ASC) AS rn
    FROM qpts q
    JOIN parcels p
      ON q.qx > p.xmin AND q.qx < p.xmax AND q.qy > p.ymin AND q.qy < p.ymax
)
SELECT q.query_id, h.parcel_id
FROM qpts q
LEFT JOIN (SELECT query_id, parcel_id FROM hits WHERE rn = 1) h
  ON h.query_id = q.query_id
"""


def knn_join_sql() -> str:
    return f"""
WITH {address_points_values_sql('ap')},
{_anchored_points_cte()},
pairs AS (
    SELECT q.query_id, ap.point_id, ap.x, ap.y,
           (q.qx - ap.x) * (q.qx - ap.x) + (q.qy - ap.y) * (q.qy - ap.y) AS d2
    FROM qpts q CROSS JOIN ap
),
best AS (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY d2 ASC, point_id ASC
    ) AS rn
    FROM pairs
)
SELECT q.query_id, b.point_id AS nn_point_id, b.x AS nn_x, b.y AS nn_y
FROM qpts q
JOIN (SELECT * FROM best WHERE rn = 1) b ON b.query_id = q.query_id
"""


def points_within_radius_sql() -> str:
    """Distance join (DWithin): identical IEEE d2 expression to the engine's
    ``RadiusStage`` (dx*dx + dy*dy), so the float column hash-matches."""
    from .pipelines.spatial import RADIUS_JOIN_M

    r = float(RADIUS_JOIN_M)
    d2 = "(q.qx - ap.x) * (q.qx - ap.x) + (q.qy - ap.y) * (q.qy - ap.y)"
    return f"""
WITH {address_points_values_sql('ap')},
{_anchored_points_cte()}
SELECT q.query_id, ap.point_id, {d2} AS d2
FROM qpts q JOIN ap ON {d2} <= {r!r} * {r!r}
"""


def parcel_zonal_stats_sql() -> str:
    """Zonal statistics over the parcel layer: strict-bbox containment
    (the pip oracle's predicate — parcels are axis-aligned rectangles)."""
    return f"""
WITH {address_points_values_sql('ap')},
{parcels_bbox_values_sql('parcels')},
{_anchored_points_cte(extra=", CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty")}
SELECT p.parcel_id,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(SUM(q.qty) AS BIGINT) AS sum_qty
FROM qpts q JOIN parcels p
  ON q.qx > p.xmin AND q.qx < p.xmax AND q.qy > p.ymin AND q.qy < p.ymax
GROUP BY p.parcel_id
"""


def reverse_geocode_lineitem_sql() -> str:
    """Reverse geocode with cutoff: argmin cross join gated by max_d2;
    sentinel -1 / NULLs beyond the cutoff (matches ReverseGeocodeStage)."""
    from .pipelines.spatial import REVERSE_MAX_D_M

    maxd2 = float(REVERSE_MAX_D_M) * float(REVERSE_MAX_D_M)
    return f"""
WITH {address_points_values_sql('ap')},
qpts AS ({_uniform_points_select()}),
pairs AS (
    SELECT q.query_id, q.qx, q.qy, ap.point_id, ap.match_address, ap.address_grid,
           (q.qx - ap.x) * (q.qx - ap.x) + (q.qy - ap.y) * (q.qy - ap.y) AS d2
    FROM qpts q CROSS JOIN ap
),
best AS (
    -- PARTITION BY the full point identity, not just query_id: derived
    -- query_ids collide across physical lineitem rows with different
    -- l_partkey (and thus different qy) — per-input-row semantics
    -- ((o_orderkey, l_linenumber) is NOT unique in this data)
    SELECT *, row_number() OVER (
        PARTITION BY query_id, qx, qy ORDER BY d2 ASC, point_id ASC
    ) AS rn
    FROM pairs
)
SELECT q.query_id,
       COALESCE(CASE WHEN b.d2 <= {maxd2!r} THEN b.point_id END, -1) AS nn_point_id,
       CASE WHEN b.d2 <= {maxd2!r} THEN b.match_address END AS match_address,
       CASE WHEN b.d2 <= {maxd2!r} THEN b.address_grid END AS address_grid,
       CASE WHEN b.d2 <= {maxd2!r} THEN b.d2 END AS d2
FROM qpts q
JOIN (SELECT * FROM best WHERE rn = 1) b
  ON b.query_id = q.query_id AND b.qx = q.qx AND b.qy = q.qy
"""


def q6_forecast_revenue_sql() -> str:
    """TPC-H-Q6-shaped filter+sum in exact integers: cents x discount
    permille (both < 2^31, product < 2^62 — exact in int64 and BIGINT)."""
    from .queries import Q6_DPERM_LO, Q6_DPERM_HI, Q6_MAX_QTY, Q6_YEAR

    return f"""
SELECT CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
               * CAST(floor(l_discount * 1000 + 0.5) AS BIGINT)) AS BIGINT)
           AS revenue_scaled,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_YEAR}-01-01'
  AND l_shipdate < TIMESTAMP '{Q6_YEAR + 1}-01-01'
  AND l_quantity < {Q6_MAX_QTY}
  AND CAST(floor(l_discount * 1000 + 0.5) AS BIGINT)
      BETWEEN {Q6_DPERM_LO} AND {Q6_DPERM_HI}
"""


def nation_trade_coverage_sql() -> str:
    """Set-coverage flags per nation (the INTERSECT / EXCEPT shape as one
    flagged table): which nations have suppliers, customers, both."""
    return """
SELECT n.n_nationkey, n.n_name,
       CAST(COALESCE(s.ns, 0) AS BIGINT) AS n_suppliers,
       CAST(COALESCE(c.nc, 0) AS BIGINT) AS n_customers,
       CAST(CASE WHEN s.ns IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS has_supplier,
       CAST(CASE WHEN c.nc IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS has_customer
FROM nation n
LEFT JOIN (SELECT s_nationkey, COUNT(*) AS ns FROM supplier GROUP BY 1) s
       ON s.s_nationkey = n.n_nationkey
LEFT JOIN (SELECT c_nationkey, COUNT(*) AS nc FROM customer GROUP BY 1) c
       ON c.c_nationkey = n.n_nationkey
"""


def geohash_lineitem_sql() -> str:
    """Planar geohash assembled term-by-term from the SAME constants as
    ``functions.cells.geohash_encode`` (bit interleave as integer
    div/mod arithmetic, base32 chars via substr on the shared alphabet)."""
    from .functions.cells import (
        EXTENT,
        GEOHASH_ALPHABET,
        GEOHASH_BITS_PER_AXIS,
        GEOHASH_CHARS,
        X0,
        Y0,
    )

    n = 1 << GEOHASH_BITS_PER_AXIS
    s = EXTENT / n
    ix = f"LEAST(GREATEST(CAST(floor((qx - {X0!r}) / {s!r}) AS BIGINT), 0), {n - 1})"
    iy = f"LEAST(GREATEST(CAST(floor((qy - {Y0!r}) / {s!r}) AS BIGINT), 0), {n - 1})"
    terms = " + ".join(
        f"((ix // {1 << k}) % 2) * {1 << (2 * k + 1)}"
        f" + ((iy // {1 << k}) % 2) * {1 << (2 * k)}"
        for k in range(GEOHASH_BITS_PER_AXIS)
    )
    total_bits = 2 * GEOHASH_BITS_PER_AXIS
    concat = " || ".join(
        f"substr('{GEOHASH_ALPHABET}', "
        f"CAST((z // {1 << (total_bits - 5 * (j + 1))}) % 32 AS INTEGER) + 1, 1)"
        for j in range(GEOHASH_CHARS)
    )
    return f"""
WITH qpts AS ({_uniform_points_select()}),
g AS (SELECT query_id, {ix} AS ix, {iy} AS iy FROM qpts),
zt AS (SELECT query_id, ({terms}) AS z FROM g)
SELECT query_id, {concat} AS geohash FROM zt
"""


def url_canonicalize_sql() -> str:
    """Messy-URL fixture + canonicalization rule chain, both assembled
    from the constants in functions/urls.py."""
    from .functions.urls import canonicalize_url_sql, messy_url_expr

    return f"""
WITH s AS (
    SELECT unnest(generate_series(0, (SELECT 2 * COUNT(*) FROM orders) - 1)) AS i
),
m AS (SELECT i, {messy_url_expr('i')} AS u FROM s)
SELECT i, u AS url_raw, {canonicalize_url_sql('u')} AS url_canonical FROM m
"""


def documents_sink_roundtrip_sql() -> str:
    """Per-lang count + checksum straight from the source table — equals
    the engine's write-then-read-back reduce iff the sink is lossless."""
    from .queries import CHECKSUM_K, CHECKSUM_M

    return f"""
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(((doc_id % {CHECKSUM_M}) * {CHECKSUM_K}
                 + n_chars % {CHECKSUM_M}) % {CHECKSUM_M}) AS BIGINT) AS checksum
FROM documents GROUP BY 1
"""


def key_uniqueness_audit_sql() -> str:
    """Row vs distinct-key counts per audited candidate key."""
    return """
SELECT * FROM (
    SELECT 'orders.o_orderkey' AS key_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_dup_rows
    FROM orders
    UNION ALL
    SELECT 'lineitem.(o_orderkey,l_linenumber)',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT l_orderkey * 10 + l_linenumber) AS BIGINT),
           CAST(COUNT(*) - COUNT(DISTINCT l_orderkey * 10 + l_linenumber) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'events.event_id',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT event_id) AS BIGINT),
           CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT)
    FROM events
)
"""


def doc_type_token_ratio_sql() -> str:
    """Type-token ratio with distinctness over the shared rolling-poly
    hash (identical collision behavior to the engine)."""
    from .functions.text import rolling_fingerprint_sql

    return f"""
WITH {_doc_tokens_cte()},
tk AS (SELECT doc_id, unnest(ts) AS t FROM toks),
h AS (SELECT doc_id, {rolling_fingerprint_sql('t')} AS hv FROM tk),
agg AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT hv) AS BIGINT) AS n_distinct
    FROM h GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(a.n_distinct, 0) AS BIGINT) AS n_distinct,
       CAST(CASE WHEN COALESCE(a.n_tokens, 0) > 0
                 THEN 1000 * a.n_distinct // a.n_tokens ELSE 0 END AS BIGINT)
           AS ttr_permille
FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
"""


def customer_coverage_days_sql() -> str:
    """Interval-union sweep as the standard shifted-window cummax."""
    from .queries import COVERAGE_SPAN_DAYS

    w = COVERAGE_SPAN_DAYS
    return f"""
WITH d AS (
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) AS BIGINT)
               AS day_num
    FROM orders
),
w AS (
    SELECT o_custkey, day_num AS s, day_num + {w} AS e,
           MAX(day_num + {w}) OVER (
               PARTITION BY o_custkey ORDER BY day_num, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
    FROM d
)
SELECT o_custkey,
       CAST(SUM(GREATEST(0, e - GREATEST(s, COALESCE(prev_max, -1000000000000000))))
            AS BIGINT) AS covered_days
FROM w GROUP BY 1
"""


def supplier_degree_histogram_sql() -> str:
    """Degree distribution of the distinct co-supply edge set."""
    return """
WITH inc AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem WHERE l_orderkey % 10 = 0),
e AS (
    SELECT DISTINCT a.sk AS sa, b.sk AS sb
    FROM inc a JOIN inc b ON a.ok = b.ok AND a.sk < b.sk
),
deg AS (
    SELECT sk, CAST(COUNT(*) AS BIGINT) AS degree
    FROM (SELECT sa AS sk FROM e UNION ALL SELECT sb AS sk FROM e)
    GROUP BY 1
)
SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_suppliers FROM deg GROUP BY 1
"""


def quality_lr_score_sql() -> str:
    """Integer LR scoring replica: same rolling-poly hash, same weight
    formula W[d] = (d*KNUTH) % (2*span+1) - span, per-token dot product."""
    from .functions.text import rolling_fingerprint_sql
    from .queries import FEAT_HASH_DIMS, LR_WEIGHT_SPAN

    K = FEAT_HASH_DIMS
    span = LR_WEIGHT_SPAN
    return f"""
WITH {_doc_tokens_cte()},
tk AS (SELECT doc_id, unnest(ts) AS t FROM toks),
h AS (SELECT doc_id, {rolling_fingerprint_sql('t')} AS hv FROM tk),
c AS (
    SELECT doc_id,
           (((hv % {K}) * 2654435761) % {2 * span + 1} - {span})
           * (CASE WHEN (hv // {K}) % 2 = 0 THEN 1 ELSE -1 END) AS contrib
    FROM h
),
s AS (SELECT doc_id, CAST(SUM(contrib) AS BIGINT) AS sc FROM c GROUP BY 1)
SELECT d.doc_id,
       CAST(COALESCE(s.sc, 0) AS BIGINT) AS lr_score,
       CAST(CASE WHEN COALESCE(s.sc, 0) >= 0 THEN 1 ELSE 0 END AS BIGINT) AS accepted
FROM documents d LEFT JOIN s ON s.doc_id = d.doc_id
"""


def spatial_cell_join_sql() -> str:
    """Big-big distance join: B replicated to the same 9 cell offsets the
    engine uses, equality hash join on the cell pair, exact d2 filter."""
    from .functions.cells import EXTENT, X0, Y0
    from .pipelines.spatial import CELL_JOIN_RADIUS_M, CELL_JOIN_RES

    s = EXTENT / (1 << CELL_JOIN_RES)
    r2 = float(CELL_JOIN_RADIUS_M) * float(CELL_JOIN_RADIUS_M)
    d2 = "(a.qx - b.qx) * (a.qx - b.qx) + (a.qy - b.qy) * (a.qy - b.qy)"
    return f"""
WITH {address_points_values_sql('ap')},
{_anchored_points_cte()},
upts AS ({_uniform_points_select()}),
offs(dx, dy) AS (VALUES (-1,-1),(0,-1),(1,-1),(-1,0),(0,0),(1,0),(-1,1),(0,1),(1,1)),
a AS (
    SELECT query_id, qx, qy,
           CAST(floor((qx - {X0!r}) / {s!r}) AS BIGINT) AS ix,
           CAST(floor((qy - {Y0!r}) / {s!r}) AS BIGINT) AS iy
    FROM qpts
),
b9 AS (
    SELECT u.query_id, u.qx, u.qy,
           CAST(floor((u.qx - {X0!r}) / {s!r}) AS BIGINT) + o.dx AS tix,
           CAST(floor((u.qy - {Y0!r}) / {s!r}) AS BIGINT) + o.dy AS tiy
    FROM upts u CROSS JOIN offs o
)
SELECT a.query_id AS a_id, b.query_id AS b_id, {d2} AS d2
FROM a JOIN b9 b ON b.tix = a.ix AND b.tiy = a.iy
WHERE {d2} <= {r2!r}
"""


def parcel_tile_cover_sql() -> str:
    """Parcel bbox -> overlapped ZXY tiles (2-step UNNEST like
    tile_cover_lineitem — DuckDB lacks lateral generate_series)."""
    from .functions.tiles import tile_assign_sql

    tx0, ty0 = tile_assign_sql("xmin", "ymax")
    tx1, ty1 = tile_assign_sql("xmax", "ymin")
    return f"""
WITH {parcels_bbox_values_sql('parcels')},
c AS (
    SELECT parcel_id, {tx0} AS tx0, {ty0} AS ty0, {tx1} AS tx1, {ty1} AS ty1
    FROM parcels
),
ex AS (
    SELECT parcel_id, UNNEST(generate_series(tx0, tx1)) AS tile_x, ty0, ty1
    FROM c
)
SELECT parcel_id, tile_x, UNNEST(generate_series(ty0, ty1)) AS tile_y FROM ex
"""


def address_point_density_sql() -> str:
    """Per-reference-point density: the distance join grouped by point."""
    from .pipelines.spatial import RADIUS_JOIN_M

    r = float(RADIUS_JOIN_M)
    d2 = "(q.qx - ap.x) * (q.qx - ap.x) + (q.qy - ap.y) * (q.qy - ap.y)"
    return f"""
WITH {address_points_values_sql('ap')},
{_anchored_points_cte()}
SELECT ap.point_id, CAST(COUNT(*) AS BIGINT) AS n_within
FROM qpts q JOIN ap ON {d2} <= {r!r} * {r!r}
GROUP BY ap.point_id
"""


def events_decayed_value_sql() -> str:
    """Binary-decay recency window, weights generated from DECAY_WINDOW."""
    from .queries import DECAY_WINDOW

    cases = " ".join(
        f"WHEN {lag} THEN {1 << (DECAY_WINDOW - 1 - lag)}"
        for lag in range(DECAY_WINDOW)
    )
    return f"""
WITH r AS (
    SELECT user_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS vint,
           row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
           ) - 1 AS lag
    FROM events
)
SELECT user_id,
       CAST(SUM(vint * CASE lag {cases} ELSE 0 END) AS BIGINT) AS decayed_cents
FROM r GROUP BY user_id
"""


def customer_status_full_join_sql() -> str:
    """Two-sided-orphan FULL OUTER join of per-customer status aggregates."""

    def side(status: str, n: str, c: str) -> str:
        return (
            f"SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS {n}, "
            f"CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS {c} "
            f"FROM orders WHERE o_orderstatus = '{status}' GROUP BY 1"
        )

    return f"""
WITH f AS ({side('F', 'n_f', 'cents_f')}),
o AS ({side('O', 'n_o', 'cents_o')})
SELECT COALESCE(f.o_custkey, o.o_custkey) AS o_custkey,
       CAST(COALESCE(f.n_f, 0) AS BIGINT) AS n_f,
       CAST(COALESCE(f.cents_f, 0) AS BIGINT) AS cents_f,
       CAST(COALESCE(o.n_o, 0) AS BIGINT) AS n_o,
       CAST(COALESCE(o.cents_o, 0) AS BIGINT) AS cents_o
FROM f FULL OUTER JOIN o ON o.o_custkey = f.o_custkey
"""


def cell_encode_lineitem_sql() -> str:
    return (
        "WITH qpts AS (" + _uniform_points_select() + ") "
        "SELECT query_id, " + cell_encode_sql("qx", "qy") + " AS cell FROM qpts"
    )


def tile_assign_lineitem_sql() -> str:
    tx, ty = tile_assign_sql("qx", "qy")
    return (
        "WITH qpts AS (" + _uniform_points_select() + ") "
        f"SELECT query_id, {tx} AS tile_x, {ty} AS tile_y FROM qpts"
    )


def tile_pyramid_sql(levels: int = 4) -> str:
    """Pyramid rollup oracle: parent tiles are exact integer halvings."""
    from .functions.tiles import DEFAULT_ZOOM

    tx, ty = tile_assign_sql("qx", "qy")
    sel = "\nUNION ALL\n".join(
        f"SELECT {DEFAULT_ZOOM - lv} AS zoom, tx // {1 << lv} AS tile_x, "
        f"ty // {1 << lv} AS tile_y FROM t"
        for lv in range(levels)
    )
    return (
        "WITH qpts AS (" + _uniform_points_select() + "), "
        f"t AS (SELECT {tx} AS tx, {ty} AS ty FROM qpts), "
        f"lv AS ({sel}) "
        "SELECT zoom, tile_x, tile_y, COUNT(*) AS n FROM lv GROUP BY 1, 2, 3"
    )


def distinct_orders_per_returnflag_sql() -> str:
    """Shared oracle for the salted AND unsalted hot-key distinct — the
    value-salted shuffle must be output-invisible."""
    return (
        "SELECT l_returnflag, CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) "
        "AS n_distinct FROM lineitem GROUP BY 1"
    )


def tile_counts_sql() -> str:
    tx, ty = tile_assign_sql("qx", "qy")
    return (
        "WITH qpts AS (" + _uniform_points_select() + ") "
        f"SELECT {tx} AS tile_x, {ty} AS tile_y, COUNT(*) AS n "
        "FROM qpts GROUP BY 1, 2"
    )


# -------------------------------------------------------- text analysis

def token_count_documents_sql() -> str:
    from .functions.text import token_count_sql

    return f"SELECT doc_id, {token_count_sql('text')} AS n_tokens FROM documents"


def lang_id_documents_sql() -> str:
    from .functions.text import lang_id_sql

    return f"SELECT doc_id, {lang_id_sql('text')} AS lang_pred FROM documents"


def quality_documents_sql() -> str:
    from .functions.text import quality_sql

    cols = ", ".join(f"{expr} AS {name}" for name, expr in quality_sql("text").items())
    return f"SELECT doc_id, {cols} FROM documents"


def doc_fingerprint_sql() -> str:
    return "SELECT doc_id, md5(text) AS fp FROM documents"


def _doc_shingles_ctes(n_words: int = 3) -> str:
    """Shared CTE fragment: documents -> distinct word-n-gram shingle rows
    (doc_id, sh), exactly mirroring stages/dedup.py _shingle_strings."""
    return f"""toks0 AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text), '{WS_SPLIT_PATTERN}'), x -> x <> '') AS ts
    FROM documents
),
idx AS (
    SELECT doc_id, ts,
           unnest(generate_series(1, greatest(len(ts) - {n_words - 1}, 1))) AS i
    FROM toks0
),
sh AS (
    SELECT DISTINCT doc_id,
           CASE WHEN len(ts) < {n_words} THEN array_to_string(ts, ' ')
                ELSE array_to_string(ts[i:i+{n_words - 1}], ' ') END AS sh
    FROM idx
)"""


def ngram_jaccard_exact_pairs_sql(theta_permille: int = 500) -> str:
    """Exact n-gram Jaccard pairs, mirroring stages/dedup.py
    ngram_jaccard_exact_pairs step for step with identical integer
    arithmetic (prefix length, threshold compare, permille floor)."""
    return f"""
WITH {_doc_shingles_ctes()},
n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
df AS (SELECT sh, COUNT(*) AS df FROM sh GROUP BY 1),
ranked AS (
    SELECT s.doc_id, s.sh,
           row_number() OVER (PARTITION BY s.doc_id ORDER BY d.df ASC, s.sh ASC) AS rn,
           nn.n_sh
    FROM sh s JOIN df d ON d.sh = s.sh JOIN n nn ON nn.doc_id = s.doc_id
),
pfx AS (
    SELECT * FROM ranked
    WHERE rn <= n_sh - (({theta_permille} * n_sh + 999) // 1000) + 1
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM pfx a JOIN pfx b ON a.sh = b.sh AND a.doc_id < b.doc_id
),
inter AS (
    SELECT c.doc_a, c.doc_b, COUNT(*) AS i
    FROM cand c
    JOIN sh sa ON sa.doc_id = c.doc_a
    JOIN sh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
    GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       CAST(floor(1000.0 * i.i / (na.n_sh + nb.n_sh - i.i) + 0.5) AS BIGINT)
           AS jaccard_permille
FROM inter i
JOIN n na ON na.doc_id = i.doc_a
JOIN n nb ON nb.doc_id = i.doc_b
WHERE 1000 * i.i >= {theta_permille} * (na.n_sh + nb.n_sh - i.i)
"""


def minhash_dup_pairs_sql(est_permille: int = 500, cap: int | None = None) -> str:
    """MinHash + LSH near-dup pairs replicated EXACTLY in SQL: the same
    shingles, the same code-point polynomial shingle hash, the same 64
    (a, b) permutation constants (embedded as VALUES from
    stages.dedup.MINHASH_A/B), the same positional band combine — every
    intermediate < 2^62, exact BIGINT arithmetic end to end.

    ``cap`` replicates the engine's RUN_ALL_PAIRS_CAP star mode (ADVICE
    r2): within an equal-(band_id, band_hash) run of more than ``cap``
    distinct docs, only pairs anchored at the run's min doc_id are
    emitted — identical arithmetic in stages/dedup.py bucket_pairs."""
    from .functions.text import rolling_fingerprint_sql
    from .stages.dedup import (
        BAND_K,
        LSH_BANDS,
        MINHASH_A,
        MINHASH_B,
        MINHASH_P,
        MINHASH_PERMS,
        ROWS_PER_BAND,
        RUN_ALL_PAIRS_CAP,
    )

    if cap is None:
        cap = RUN_ALL_PAIRS_CAP

    perms = ", ".join(
        f"({i}, {int(a)}, {int(b)})"
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    )
    weights = ", ".join(
        f"({j}, {pow(BAND_K, ROWS_PER_BAND - 1 - j, MINHASH_P)})"
        for j in range(ROWS_PER_BAND)
    )
    return f"""
WITH {_doc_shingles_ctes()},
hashes AS (SELECT doc_id, {rolling_fingerprint_sql('sh')} AS h FROM sh),
perms(perm_id, a, b) AS (VALUES {perms}),
w(j, wt) AS (VALUES {weights}),
sig AS (
    SELECT hh.doc_id, p.perm_id, MIN((p.a * hh.h + p.b) % {MINHASH_P}) AS v
    FROM hashes hh CROSS JOIN perms p
    GROUP BY 1, 2
),
band AS (
    SELECT s.doc_id, s.perm_id // {ROWS_PER_BAND} AS band_id,
           SUM(((s.v % {MINHASH_P}) * w.wt) % {MINHASH_P}) % {MINHASH_P} AS band_hash
    FROM sig s JOIN w ON w.j = s.perm_id % {ROWS_PER_BAND}
    GROUP BY 1, 2
),
runsize AS (
    SELECT band_id, band_hash,
           COUNT(DISTINCT doc_id) AS n, MIN(doc_id) AS mn
    FROM band GROUP BY 1, 2
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM band a
    JOIN band b ON a.band_id = b.band_id AND a.band_hash = b.band_hash
              AND a.doc_id < b.doc_id
    JOIN runsize r ON r.band_id = a.band_id AND r.band_hash = a.band_hash
    WHERE r.n <= {cap} OR a.doc_id = r.mn
),
eq AS (
    SELECT c.doc_a, c.doc_b,
           COUNT(*) FILTER (WHERE sa.v = sb.v) AS neq
    FROM cand c
    JOIN sig sa ON sa.doc_id = c.doc_a
    JOIN sig sb ON sb.doc_id = c.doc_b AND sb.perm_id = sa.perm_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(floor(1000.0 * neq / {MINHASH_PERMS} + 0.5) AS BIGINT)
           AS est_jaccard_permille
FROM eq
WHERE 1000 * neq >= {est_permille} * {MINHASH_PERMS}
"""


def simhash_dup_pairs_sql(max_hamming: int = 3, cap: int | None = None) -> str:
    """SimHash near-dup pairs replicated exactly: the same tokenization,
    the same 62-bit token hash (two code-point polynomial hashes), the
    same frequency-weighted bit votes, the same 4x16-bit band blocking
    (pigeonhole-complete for hamming <= 3), exact BIGINT arithmetic.
    ``cap`` replicates the engine's star mode (see minhash_dup_pairs_sql)."""
    from .functions.text import rolling_fingerprint_sql
    from .stages.dedup import RUN_ALL_PAIRS_CAP, SIMHASH_BITS

    if cap is None:
        cap = RUN_ALL_PAIRS_CAP

    return f"""
WITH toks0 AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text), '{WS_SPLIT_PATTERN}'), x -> x <> '') AS ts
    FROM documents
),
tok AS (SELECT doc_id, unnest(ts) AS t FROM toks0),
th AS (
    SELECT doc_id,
           {rolling_fingerprint_sql('t')} * 2147483648
           + {rolling_fingerprint_sql("(t || '#')")} AS h
    FROM tok
),
jbits(j) AS (SELECT unnest(generate_series(0, {SIMHASH_BITS - 1}))),
acc AS (
    SELECT th.doc_id, jbits.j,
           SUM(CASE WHEN (th.h >> jbits.j) & 1 = 1 THEN 1 ELSE -1 END) AS a
    FROM th CROSS JOIN jbits
    GROUP BY 1, 2
),
sim AS (
    SELECT doc_id,
           SUM(CASE WHEN a > 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS simhash
    FROM acc GROUP BY 1
),
bband AS (
    SELECT doc_id, simhash, b.b AS band_id,
           (simhash >> (16 * b.b)) & 65535 AS band_val
    FROM sim CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b) b
),
runsize AS (
    SELECT band_id, band_val,
           COUNT(DISTINCT doc_id) AS n, MIN(doc_id) AS mn
    FROM bband GROUP BY 1, 2
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS ha,
                    b.doc_id AS doc_b, b.simhash AS hb
    FROM bband a
    JOIN bband b ON a.band_id = b.band_id AND a.band_val = b.band_val
               AND a.doc_id < b.doc_id
    JOIN runsize r ON r.band_id = a.band_id AND r.band_val = a.band_val
    WHERE r.n <= {cap} OR a.doc_id = r.mn
)
SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(ha, hb)) <= {max_hamming}
"""


def shared_passage_pairs_sql(w: int = 8) -> str:
    """Doc pairs sharing >= 1 contiguous w-token window + shared distinct
    window count — same windows as the engine's generalized shingling."""
    return f"""
WITH {_doc_shingles_ctes(w)}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS shared_windows
FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


def ngram_novelty_sql() -> str:
    """Per-doc novelty permille: fraction of distinct word-3-grams that
    appear in no other document — identical shingling and integer
    permille arithmetic as stages/dedup.py ngram_novelty."""
    return f"""
WITH {_doc_shingles_ctes()},
n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
df AS (SELECT sh, COUNT(*) AS df FROM sh GROUP BY 1),
per AS (
    SELECT s.doc_id,
           COUNT(*) FILTER (WHERE d.df > 1) AS dup
    FROM sh s JOIN df d ON d.sh = s.sh
    GROUP BY 1
)
SELECT p.doc_id,
       CAST(floor(1000.0 * (n.n_sh - p.dup) / n.n_sh + 0.5) AS BIGINT)
           AS novelty_permille
FROM per p JOIN n ON n.doc_id = p.doc_id
"""


def dedup_clusters_sql(theta_permille: int = 500) -> str:
    """Connected components over the exact-Jaccard pair graph via a
    recursive CTE (reachability closure + per-node MIN), mirroring the
    engine's min-label propagation fixpoint."""
    return f"""
WITH RECURSIVE pairs AS ({ngram_jaccard_exact_pairs_sql(theta_permille)}),
edges AS (
    SELECT doc_a AS u, doc_b AS v FROM pairs
    UNION
    SELECT doc_b, doc_a FROM pairs
),
reach(u, v) AS (
    SELECT u, v FROM (
        SELECT u, v FROM edges UNION SELECT u, u FROM edges
    )
    UNION
    SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v
)
SELECT u AS doc_id, MIN(v) AS cluster_id FROM reach GROUP BY u
"""


def document_chunks_sql(size: int = 512, stride: int = 384) -> str:
    """Sliding-window chunk rows via list slicing — same tokenization
    (WS_SPLIT_PATTERN), same integer chunk-count rule as the engine."""
    return f"""
WITH toks0 AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text), '{WS_SPLIT_PATTERN}'), x -> x <> '') AS ts
    FROM documents
),
nc AS (
    SELECT doc_id, ts, len(ts) AS n,
           CASE WHEN len(ts) > {size}
                THEN 1 + (len(ts) - {size} + {stride} - 1) // {stride}
                ELSE 1 END AS n_chunks
    FROM toks0
),
k AS (
    SELECT doc_id, ts, n,
           unnest(generate_series(0, n_chunks - 1)) AS chunk_id
    FROM nc
)
SELECT doc_id, chunk_id,
       array_to_string(ts[chunk_id * {stride} + 1 : chunk_id * {stride} + {size}], ' ')
           AS chunk_text,
       CAST(least({size}, greatest(n - chunk_id * {stride}, 0)) AS BIGINT)
           AS n_chunk_tokens
FROM k
"""


def sequence_packing_sql(max_len: int = 2048) -> str:
    """Packing layout as one window cumsum (exclusive)."""
    from .functions.text import token_count_sql

    return f"""
WITH c AS (SELECT doc_id, {token_count_sql('text')} AS n_tokens FROM documents),
s AS (
    SELECT doc_id, n_tokens,
           CAST(COALESCE(SUM(n_tokens) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS cum
    FROM c
)
SELECT doc_id, n_tokens,
       CAST(cum // {max_len} AS BIGINT) AS seq_id,
       CAST(cum % {max_len} AS BIGINT) AS seq_offset
FROM s
"""


def sequence_packing_shuffled_sql(max_len: int = 2048) -> str:
    """Shuffled packing: window cumsum ordered by the same deterministic
    multiplicative-hash shuffle key (bijective mod 2^32 — no ties)."""
    from .functions.text import token_count_sql

    return f"""
WITH c AS (
    SELECT doc_id, {token_count_sql('text')} AS n_tokens,
           (doc_id * 2654435761) % 4294967296 AS sk
    FROM documents
),
s AS (
    SELECT doc_id, n_tokens,
           CAST(COALESCE(SUM(n_tokens) OVER (
               ORDER BY sk ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS cum
    FROM c
)
SELECT doc_id, n_tokens,
       CAST(cum // {max_len} AS BIGINT) AS seq_id,
       CAST(cum % {max_len} AS BIGINT) AS seq_offset
FROM s
"""


def token_cms_topk_sql(k: int = 20) -> str:
    """CMS replica: bucket sums per hash row over the full vocabulary,
    min over rows for the exact top-k tokens — same constants
    (stages/sketch.py CMS_*), same polynomial hash, exact BIGINT."""
    from .functions.text import ROLL_MOD, rolling_fingerprint_sql
    from .stages.sketch import CMS_A, CMS_B, CMS_D, CMS_W

    bucket_cols = ", ".join(
        f"(({CMS_A[j]} * ph + {CMS_B[j]}) % {ROLL_MOD}) % {CMS_W} AS h{j}"
        for j in range(CMS_D)
    )
    bs = ",\n".join(
        f"bs{j} AS (SELECT h{j}, CAST(SUM(n) AS BIGINT) AS s FROM b GROUP BY 1)"
        for j in range(CMS_D)
    )
    joins = "\n".join(f"JOIN bs{j} ON bs{j}.h{j} = b.h{j}" for j in range(CMS_D))
    least = ", ".join(f"bs{j}.s" for j in range(CMS_D))
    return f"""
WITH toks0 AS (
    SELECT list_filter(regexp_split_to_array(lower(text), '{WS_SPLIT_PATTERN}'), x -> x <> '') AS ts
    FROM documents
),
tok AS (SELECT unnest(ts) AS token FROM toks0),
c AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY 1),
h AS (SELECT token, n, {rolling_fingerprint_sql('token')} AS ph FROM c),
b AS (SELECT token, n, {bucket_cols} FROM h),
{bs},
topk AS (SELECT token, n FROM c ORDER BY n DESC, token ASC LIMIT {k})
SELECT t.token, CAST(t.n AS BIGINT) AS n,
       CAST(LEAST({least}) AS BIGINT) AS est_n
FROM topk t
JOIN b ON b.token = t.token
{joins}
"""


def token_histogram_sql(k: int = 100) -> str:
    return f"""
WITH toks0 AS (
    SELECT list_filter(regexp_split_to_array(lower(text), '{WS_SPLIT_PATTERN}'), x -> x <> '') AS ts
    FROM documents
),
tok AS (SELECT unnest(ts) AS token FROM toks0),
c AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY 1)
SELECT token, n FROM c ORDER BY n DESC, token ASC LIMIT {k}
"""


def documents_near_deduped_sql(theta_permille: int = 500) -> str:
    return f"""
WITH cc AS ({dedup_clusters_sql(theta_permille)})
SELECT d.doc_id FROM documents d
LEFT JOIN cc ON cc.doc_id = d.doc_id
WHERE cc.doc_id IS NULL OR cc.cluster_id = cc.doc_id
"""


def curated_documents_sql(theta_permille: int = 500) -> str:
    from .functions.text import quality_sql

    q = quality_sql("d.text")
    return f"""
WITH cc AS ({dedup_clusters_sql(theta_permille)}),
keepers AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text))
SELECT d.doc_id
FROM documents d
JOIN keepers k ON k.doc_id = d.doc_id
LEFT JOIN cc ON cc.doc_id = d.doc_id
WHERE d.lang = 'en'
  AND {q['is_short']} = 0
  AND {q['stop_permille']} BETWEEN 10 AND 400
  AND (cc.doc_id IS NULL OR cc.cluster_id = cc.doc_id)
"""


def contamination_flags_sql() -> str:
    from .queries import CONTAM_MIN_SHARED, N_BENCH_DOCS

    return f"""
WITH {_doc_shingles_ctes()},
bdocs AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT {N_BENCH_DOCS}),
bsh AS (SELECT DISTINCT s.sh FROM sh s JOIN bdocs b ON b.doc_id = s.doc_id),
shared AS (
    SELECT s.doc_id, COUNT(*) AS n_shared
    FROM sh s JOIN bsh ON bsh.sh = s.sh GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE(x.n_shared, 0) AS BIGINT) AS n_shared,
       CAST(CASE WHEN COALESCE(x.n_shared, 0) >= {CONTAM_MIN_SHARED}
                 THEN 1 ELSE 0 END AS BIGINT) AS contaminated
FROM documents d LEFT JOIN shared x ON x.doc_id = d.doc_id
"""


def redact_documents_sql() -> str:
    from .queries import REDACT_PATTERNS

    expr = "text"
    for pat, rep in REDACT_PATTERNS:
        # DuckDB single-quoted literals pass backslashes through verbatim
        p = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{rep}', 'g')"
    return f"""
SELECT doc_id,
       CAST(length({expr}) AS BIGINT) AS n_chars_redacted,
       md5({expr}) AS redacted_md5
FROM documents
"""


def doc_length_percentiles_sql() -> str:
    from .functions.text import token_count_sql
    from .queries import PERCENTILES_PM

    ps = ", ".join(f"({p})" for p in PERCENTILES_PM)
    return f"""
WITH t AS (SELECT {token_count_sql('text')} AS v FROM documents),
tot AS (SELECT COUNT(*) AS n FROM t),
c AS (SELECT v, COUNT(*) AS cnt FROM t GROUP BY 1),
cum AS (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum FROM c),
ps(p) AS (VALUES {ps})
SELECT CAST(ps.p AS BIGINT) AS p_permille,
       (SELECT MIN(cum.v) FROM cum, tot
        WHERE cum.cum >= (ps.p * tot.n + 999) // 1000) AS n_tokens
FROM ps
"""


def split_assignment_sql() -> str:
    return """
SELECT doc_id,
       CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val' ELSE 'test' END AS split
FROM (SELECT doc_id, ((doc_id * 2654435761) % 4294967296) % 100 AS h FROM documents)
"""


def doc_rolling_fp_sql() -> str:
    from .functions.text import rolling_fingerprint_sql

    return (
        f"SELECT doc_id, {rolling_fingerprint_sql('text')} AS rolling_fp "
        "FROM documents"
    )


def media_features_sql() -> str:
    """Metadata surface of the media feature stage over the docs-derived
    media table (stages/multimodal.py FEATURE_DIM is the pinned dim)."""
    from .stages.multimodal import FEATURE_DIM

    return f"""
SELECT doc_id AS media_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
           AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST({FEATURE_DIM} AS BIGINT) AS feat_dim
FROM documents
"""


def media_frames_sql(frame_bytes: int = 256, every: int = 4) -> str:
    """Frame-sampling arithmetic replicated exactly: n_frames =
    max(bytes // frame, 1); sampled indices 0, every, ...; last frame may
    be short (least/greatest clamp)."""
    return f"""
WITH media AS (
    SELECT doc_id AS media_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents WHERE doc_id % 3 = 2
),
f AS (
    SELECT media_id, n_bytes, greatest(n_bytes // {frame_bytes}, 1) AS n_frames
    FROM media
),
s AS (
    SELECT media_id, n_bytes,
           unnest(generate_series(0, n_frames - 1, {every})) AS fi
    FROM f
)
SELECT media_id, COUNT(*) AS n_frames_sampled,
       CAST(SUM(greatest(least({frame_bytes}, n_bytes - fi * {frame_bytes}), 0)) AS BIGINT)
           AS sampled_bytes
FROM s GROUP BY 1
"""


def dedup_exact_sql() -> str:
    return (
        "SELECT md5(text) AS fp, MIN(doc_id) AS keep_doc_id, COUNT(*) AS dup_count "
        "FROM documents GROUP BY 1"
    )


# ---------------------------------------------------------------- ANN

def ann_topk_quantized_sql(k: int = 10, n_queries: int = 3, dim: int = 64) -> str:
    from .stages.ann import QUANT

    def q(col: str, i: int) -> str:
        return f"CAST(floor({col}.embedding[{i}] * {QUANT!r} + 0.5) AS BIGINT)"

    dot = " + ".join(f"{q('a', i)} * {q('b', i)}" for i in range(1, dim + 1))
    return f"""
WITH pairs AS (
    SELECT a.vec_id AS query_id, b.vec_id AS vec_id, {dot} AS dot_q
    FROM embeddings a CROSS JOIN embeddings b
    WHERE a.vec_id < {n_queries}
),
ranked AS (
    SELECT query_id, vec_id, dot_q,
           row_number() OVER (PARTITION BY query_id ORDER BY dot_q DESC, vec_id ASC) AS rank
    FROM pairs
)
SELECT query_id, rank, vec_id, dot_q FROM ranked WHERE rank <= {k}
"""


# --------------------------------------------------------------- events

def events_window_sql() -> str:
    return """
SELECT event_type, date_trunc('hour', ts) AS window_start,
       COUNT(*) AS n,
       CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY 1, 2
"""


def sessionize_sql() -> str:
    return """
WITH g AS (
    SELECT user_id, ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS gap
    FROM events
)
SELECT user_id, COUNT(*) AS n_events,
       CAST(1 + SUM(CASE WHEN gap > INTERVAL 30 MINUTE THEN 1 ELSE 0 END) AS BIGINT)
           AS n_sessions
FROM g GROUP BY user_id
"""


# ------------------------------------------------------------ relational

def q1_pricing_summary_sql() -> str:
    return """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_qty_cents,
       CAST(SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_price_cents,
       CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)
                     AS BIGINT)) AS BIGINT)
           AS sum_disc_price_cents
FROM lineitem GROUP BY 1, 2
"""


def top_customers_sql() -> str:
    return """
WITH agg AS (
    SELECT o_custkey AS c_custkey, COUNT(*) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM orders GROUP BY 1
)
SELECT a.c_custkey, c.c_name, a.n_orders, a.revenue_cents
FROM agg a JOIN customer c ON c.c_custkey = a.c_custkey
ORDER BY a.revenue_cents DESC, a.c_custkey ASC
LIMIT 10
"""


# ------------------------------------------ geocode parameter variants

def geocode_orders_centerlines_sql() -> str:
    return geocode_orders_sql(locators="roadCenterlines")


def geocode_orders_wgs84_sql() -> str:
    return geocode_orders_sql(wkid=4326)


def geocode_pobox_sql() -> str:
    from .pipelines.candidates import derive_pobox_sql

    return geocode_orders_sql(pobox="true", candidates_sql=derive_pobox_sql())


def geocode_orders_units_sql() -> str:
    from .pipelines.candidates import derive_units_sql

    return geocode_orders_sql(candidates_sql=derive_units_sql())


def geocode_orders_highways_sql() -> str:
    from .pipelines.candidates import derive_highways_sql

    return geocode_orders_sql(
        candidates_sql=derive_highways_sql(), include_highways=True
    )


def geocode_orders_intersections_sql() -> str:
    from .pipelines.candidates import derive_intersections_sql

    return geocode_orders_sql(
        candidates_sql=derive_intersections_sql(), include_intersections=True
    )


def geocode_join_orders_sql() -> str:
    """J5: join the geocode output back to its source rows on primary_key —
    the large-large hash-join path."""
    return f"""
WITH output AS ({geocode_orders_sql()})
SELECT o.primary_key, o.score, o.message,
       CAST(floor(r.o_totalprice * 100.0 + 0.5) AS BIGINT) AS o_totalprice_cents,
       r.o_orderpriority
FROM output o
JOIN orders r ON CAST(r.o_orderkey AS VARCHAR) = o.primary_key
"""


def cell_skew_topk_sql(k: int = 20) -> str:
    """N2 skew report: top-k cells by matched-candidate count."""
    return f"""
WITH output AS ({geocode_orders_sql()}),
cells AS (
    SELECT {cell_encode_sql('x', 'y')} AS cell
    FROM output WHERE message IS NULL
),
counts AS (SELECT cell, COUNT(*) AS n FROM cells GROUP BY 1)
SELECT cell, n FROM counts ORDER BY n DESC, cell ASC LIMIT {k}
"""


def sample_orders_sql(pct: int = 5) -> str:
    """N3 deterministic sampling: multiplicative-hash mod-100 filter (the
    same integer arithmetic on both engines — unlike engine-native RNG
    sampling, this is oracle-checkable)."""
    return (
        "SELECT o_orderkey, o_custkey FROM orders "
        f"WHERE ((o_orderkey * 2654435761) % 4294967296) % 100 < {pct}"
    )


def tile_raster_sparse_sql() -> str:
    from .stages.raster import TILE_PX, global_pixel_sql

    gx, gy = global_pixel_sql("qx", "qy")
    return f"""
WITH qpts AS ({_uniform_points_select()}),
gp AS (SELECT {gx} AS gx, {gy} AS gy FROM qpts)
SELECT gx // {TILE_PX} AS tile_x, gy // {TILE_PX} AS tile_y,
       gx % {TILE_PX} AS px_x, gy % {TILE_PX} AS px_y,
       COUNT(*) AS n
FROM gp GROUP BY 1, 2, 3, 4
"""


def events_sliding_window_sql() -> str:
    return """
WITH w AS (
    SELECT event_type, time_bucket(INTERVAL 30 MINUTE, ts) AS w0,
           CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
    FROM events
),
expanded AS (
    SELECT event_type, w0 AS window_start, c FROM w
    UNION ALL
    SELECT event_type, w0 - INTERVAL 30 MINUTE AS window_start, c FROM w
)
SELECT event_type, window_start, COUNT(*) AS n,
       CAST(SUM(c) AS BIGINT) AS value_cents
FROM expanded GROUP BY 1, 2
"""


def streaming_user_state_sql() -> str:
    """Batch equivalent of the incremental keyed-actor state: per-user
    count, cents sum, and last-seen timestamp (ordered feed -> max ts)."""
    return """
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents,
       CAST(epoch_us(MAX(ts)) AS BIGINT) AS last_ts_us
FROM events GROUP BY 1
"""


def streaming_watermark_sql() -> str:
    """Watermark drop rule as one window function: per-user running max
    ts over the SAME deterministic arrival order (16-block reversal of
    event_id — stages/streaming.py arrival_key), an event is late when
    its ts trails that max by more than the allowed lateness."""
    from .stages.streaming import WATERMARK_LATENESS_US

    return f"""
WITH w AS (
    SELECT user_id, epoch_us(ts) AS tsu,
           CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
           MAX(epoch_us(ts)) OVER (
               PARTITION BY user_id
               ORDER BY (event_id // 16) * 16 + 15 - (event_id % 16)
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS wm
    FROM events
),
f AS (
    SELECT *,
           CASE WHEN wm IS NOT NULL AND tsu < wm - {WATERMARK_LATENESS_US}
                THEN 1 ELSE 0 END AS late
    FROM w
)
SELECT user_id,
       CAST(SUM(1 - late) AS BIGINT) AS n_kept,
       CAST(COALESCE(SUM(CASE WHEN late = 0 THEN cents END), 0) AS BIGINT)
           AS kept_cents,
       CAST(SUM(late) AS BIGINT) AS n_late
FROM f GROUP BY 1
"""


def events_asof_join_sql() -> str:
    return """
WITH purchases AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
signups AS (SELECT user_id, ts FROM events WHERE event_type = 'signup')
SELECT p.event_id, p.user_id, p.ts, s.ts AS signup_ts
FROM purchases p
ASOF LEFT JOIN signups s ON p.user_id = s.user_id AND p.ts >= s.ts
"""


def value_band_join_sql() -> str:
    from .queries import VALUE_BANDS

    rows = ", ".join(f"('{n}', {lo!r}, {hi!r})" for n, lo, hi in VALUE_BANDS)
    return f"""
WITH bands(band, lo, hi) AS (VALUES {rows})
SELECT e.event_id, b.band
FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
"""


def top_orders_per_customer_sql() -> str:
    return """
WITH c AS (
    SELECT o_custkey, o_orderkey,
           CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
    FROM orders
),
r AS (
    SELECT *, row_number() OVER (
        PARTITION BY o_custkey ORDER BY cents DESC, o_orderkey ASC
    ) AS rnk
    FROM c
)
SELECT o_custkey, o_orderkey, cents, rnk FROM r WHERE rnk <= 2
"""


def knn_topk_join_sql(k: int = 3) -> str:
    return f"""
WITH {address_points_values_sql('ap')},
{_anchored_points_cte()},
qd AS (SELECT DISTINCT query_id, qx, qy FROM qpts),
pairs AS (
    SELECT q.query_id, ap.point_id,
           (q.qx - ap.x) * (q.qx - ap.x) + (q.qy - ap.y) * (q.qy - ap.y) AS d2
    FROM qd q CROSS JOIN ap
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY d2 ASC, point_id ASC
    ) AS rank
    FROM pairs
),
best AS (SELECT query_id, rank, point_id FROM ranked WHERE rank <= {k})
SELECT q.query_id, b.rank, b.point_id AS nn_point_id
FROM qpts q JOIN best b ON b.query_id = q.query_id
"""


def bpe_token_count_documents_sql() -> str:
    from .functions.text import bpe_token_count_sql

    return f"SELECT doc_id, {bpe_token_count_sql('text')} AS n_bpe_tokens FROM documents"


def quality_filter_documents_sql() -> str:
    from .functions.text import quality_sql

    q = quality_sql("text")
    return f"""
WITH f AS (
    SELECT doc_id, {q['n_tokens']} AS n_tokens,
           {q['stop_permille']} AS sp, {q['is_short']} AS sh
    FROM documents
)
SELECT doc_id, n_tokens FROM f WHERE sh = 0 AND sp >= 10 AND sp <= 400
"""


def documents_deduped_sql() -> str:
    return "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)"


def top_tiles_sorted_sql() -> str:
    return (
        "WITH t AS (" + tile_counts_sql() + ") "
        "SELECT tile_x, tile_y, n FROM t "
        "ORDER BY n DESC, tile_x ASC, tile_y ASC LIMIT 20"
    )


def distinct_event_types_sql() -> str:
    return "SELECT DISTINCT event_type FROM events"


def orders_without_lineitems_sql() -> str:
    return """
SELECT o.o_orderkey,
       CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS o_totalprice_cents
FROM orders o
ANTI JOIN lineitem l ON l.l_orderkey = o.o_orderkey
"""


def stratified_sample_events_sql(per_group: int = 3) -> str:
    return f"""
WITH r AS (
    SELECT event_type, event_id,
           row_number() OVER (
               PARTITION BY event_type
               ORDER BY (event_id * 2654435761) % 4294967296 ASC, event_id ASC
           ) AS rn
    FROM events
)
SELECT event_type, event_id FROM r WHERE rn <= {per_group}
"""


def weighted_sample_orders_sql() -> str:
    """Weighted deterministic sampling: identical multiplicative-hash +
    whole-dollar-weight integer arithmetic as the engine kernel."""
    from .queries import WEIGHT_SAMPLE_SCALE

    return (
        "SELECT o_orderkey, o_custkey FROM orders "
        f"WHERE ((o_orderkey * 2654435761) % 4294967296) % {WEIGHT_SAMPLE_SCALE} "
        "< CAST(floor(o_totalprice + 0.5) AS BIGINT)"
    )


def orders_range_join_sql() -> str:
    """Interval self-join reference: straight SQL range predicate; the
    engine's bucketed searchsorted must count identically (microsecond
    timestamp arithmetic is exact on both sides)."""
    return """
SELECT a.o_orderkey,
       CAST(COUNT(b.o_orderkey) AS BIGINT) AS n_repeat
FROM orders a
LEFT JOIN orders b
  ON b.o_custkey = a.o_custkey
 AND b.o_orderkey <> a.o_orderkey
 AND b.o_orderdate >= a.o_orderdate
 AND b.o_orderdate < a.o_orderdate + INTERVAL 30 DAY
GROUP BY a.o_orderkey
"""


def pages_domain_cap_sql(cap: int | None = None) -> str:
    """Per-domain cap over the SQL-regenerated pages corpus: host from the
    same url layout, rank = row_number() per host ordered by url."""
    from .queries import DOMAIN_CAP

    cap = DOMAIN_CAP if cap is None else cap
    return f"""
WITH {_pages_corpus_ctes()},
ph AS (
    SELECT url, regexp_extract(url, 'https://([^/]+)/', 1) AS host FROM pgtext
),
pr AS (
    SELECT host, url,
           row_number() OVER (PARTITION BY host ORDER BY url ASC) AS rnk
    FROM ph
)
SELECT host, url, rnk FROM pr WHERE rnk <= {cap}
"""


def orders_price_percentiles_sql() -> str:
    """Per-priority exact percentiles of price cents — same integer
    percentile definition as doc_length_percentiles (smallest v with
    cumulative count >= ceil(p * n / 1000))."""
    from .queries import PERCENTILES_PM

    ps = ", ".join(f"({p})" for p in PERCENTILES_PM)
    return f"""
WITH t AS (
    SELECT o_orderpriority AS prio,
           CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
    FROM orders
),
tot AS (SELECT prio, COUNT(*) AS n FROM t GROUP BY 1),
c AS (SELECT prio, cents, COUNT(*) AS cnt FROM t GROUP BY 1, 2),
cum AS (
    SELECT prio, cents,
           SUM(cnt) OVER (PARTITION BY prio ORDER BY cents) AS cum
    FROM c
),
ps(p) AS (VALUES {ps})
SELECT tot.prio AS o_orderpriority,
       CAST(ps.p AS BIGINT) AS p_permille,
       (SELECT MIN(cum.cents) FROM cum
        WHERE cum.prio = tot.prio AND cum.cum >= (ps.p * tot.n + 999) // 1000)
           AS price_cents
FROM tot, ps
"""


def bpe_pair_counts_sql(k: int = 50) -> str:
    """Adjacent-token-pair top-k: identical RE2 tokenization as the engine
    (WS_SPLIT_PATTERN), pairs joined with a single space, same
    (n DESC, pair ASC) tie-break."""
    return f"""
WITH toks0 AS (
    SELECT list_filter(regexp_split_to_array(lower(text), '{WS_SPLIT_PATTERN}'), x -> x <> '') AS ts
    FROM documents
),
pr AS (
    SELECT ts[i] || ' ' || ts[i + 1] AS pair
    FROM (SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS i FROM toks0)
),
c AS (SELECT pair, COUNT(*) AS n FROM pr GROUP BY 1)
SELECT pair, n FROM c ORDER BY n DESC, pair ASC LIMIT {k}
"""


def pages_host_reputation_sql(min_avg_tokens: int | None = None) -> str:
    """Host-reputation gate over the SQL-regenerated pages corpus: same
    integer cross-multiplied threshold (SUM(tokens) >= T * COUNT(*)) as
    the engine — no float average on either side."""
    from .functions.text import token_count_sql
    from .queries import HOST_MIN_AVG_TOKENS

    t = HOST_MIN_AVG_TOKENS if min_avg_tokens is None else min_avg_tokens
    return f"""
WITH {_pages_corpus_ctes()},
ph AS (
    SELECT url, regexp_extract(url, 'https://([^/]+)/', 1) AS host,
           {token_count_sql('text')} AS n_tokens
    FROM pgtext
),
hs AS (
    SELECT host, CAST(SUM(n_tokens) AS BIGINT) AS s, COUNT(*) AS c
    FROM ph GROUP BY 1
),
good AS (SELECT host FROM hs WHERE s >= {t} * c)
SELECT ph.url, ph.host FROM ph JOIN good USING (host)
"""


def pagerank_suppliers_sql(iters: int | None = None) -> str:
    """Exact-integer PageRank replica: K unrolled iteration CTEs built from
    the SAME constants as stages/graph.py (scale, damping ratio, customer
    offset).  Every step is BIGINT floor division (`//`) so both engines
    compute bit-identical ranks; SUM is cast back from HUGEINT."""
    from .stages.graph import (
        PR_CUST_OFFSET,
        PR_DAMP_DEN,
        PR_DAMP_NUM,
        PR_ITERS,
        PR_SCALE,
    )

    k = PR_ITERS if iters is None else iters
    its = []
    for i in range(1, k + 1):
        its.append(
            f"""r{i} AS (
    SELECT n.node_id,
           CAST({PR_DAMP_DEN - PR_DAMP_NUM} * ({PR_SCALE} // nn.n) // {PR_DAMP_DEN}
                + {PR_DAMP_NUM} * COALESCE(i.inc, 0) // {PR_DAMP_DEN} AS BIGINT)
               AS pr_score
    FROM nodes n CROSS JOIN nn
    LEFT JOIN (
        SELECT e.dst AS node_id, CAST(SUM(r.pr_score // d.d) AS BIGINT) AS inc
        FROM edges e
        JOIN r{i - 1} r ON r.node_id = e.src
        JOIN deg d ON d.src = e.src
        GROUP BY e.dst
    ) i ON i.node_id = n.node_id
)"""
        )
    chain = ",\n".join(its)
    return f"""
WITH e0 AS (
    SELECT DISTINCT CAST(l.l_suppkey AS BIGINT) AS s,
           CAST(o.o_custkey AS BIGINT) AS c
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
edges AS (
    SELECT s AS src, {PR_CUST_OFFSET} + c AS dst FROM e0
    UNION ALL
    SELECT {PR_CUST_OFFSET} + c AS src, s AS dst FROM e0
),
nodes AS (SELECT DISTINCT src AS node_id FROM edges),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY src),
r0 AS (
    SELECT node_id, CAST({PR_SCALE} // nn.n AS BIGINT) AS pr_score
    FROM nodes CROSS JOIN nn
),
{chain}
SELECT node_id, pr_score FROM r{k} ORDER BY node_id
"""


def _doc_tokens_cte() -> str:
    """Lowercased RE2-exact whitespace token list per document (the shared
    tokenization every text oracle splits with)."""
    return f"""toks AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text), '{WS_SPLIT_PATTERN}'),
                       x -> x <> '') AS ts
    FROM documents
)"""


def repetition_signals_documents_sql() -> str:
    """Gopher-style repetition signals: identical integer floor arithmetic
    (`//`) and the same keep thresholds as the engine constants."""
    from .queries import REP_BIGRAM_MAX_PERMILLE, REP_DUP_MAX_PERMILLE

    return f"""
WITH {_doc_tokens_cte()},
base AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n FROM toks),
dst AS (
    SELECT doc_id, CAST(COUNT(DISTINCT t) AS BIGINT) AS d
    FROM (SELECT doc_id, unnest(ts) AS t FROM toks) GROUP BY 1
),
bg AS (
    SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_n
    FROM (
        SELECT doc_id, ts[i] || ' ' || ts[i + 1] AS pair, COUNT(*) AS c
        FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 1)) AS i
              FROM toks)
        GROUP BY 1, 2
    ) GROUP BY 1
),
sig AS (
    SELECT b.doc_id, b.n AS n_tokens,
           CASE WHEN b.n > 0
                THEN (1000 * (b.n - COALESCE(d.d, 0))) // b.n
                ELSE CAST(0 AS BIGINT) END AS dup_token_permille,
           CASE WHEN b.n >= 2
                THEN (1000 * COALESCE(bg.top_n, 0)) // (b.n - 1)
                ELSE CAST(0 AS BIGINT) END AS top_bigram_permille
    FROM base b
    LEFT JOIN dst d USING (doc_id)
    LEFT JOIN bg USING (doc_id)
)
SELECT doc_id, n_tokens, dup_token_permille, top_bigram_permille,
       CAST(CASE WHEN dup_token_permille <= {REP_DUP_MAX_PERMILLE}
                  AND top_bigram_permille <= {REP_BIGRAM_MAX_PERMILLE}
            THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM sig ORDER BY doc_id
"""


def feature_hash_documents_sql() -> str:
    """Signed feature hashing replica: the SAME rolling polynomial hash
    (functions/text.py) drives dim = h % K and the sign bit (h // K) % 2;
    zero-cancelled weights are dropped on both sides."""
    from .functions.text import rolling_fingerprint_sql
    from .queries import FEAT_HASH_DIMS

    K = FEAT_HASH_DIMS
    return f"""
WITH {_doc_tokens_cte()},
tk AS (SELECT doc_id, unnest(ts) AS t FROM toks),
h AS (SELECT doc_id, {rolling_fingerprint_sql('t')} AS hv FROM tk),
f AS (
    SELECT doc_id, hv % {K} AS dim,
           CASE WHEN (hv // {K}) % 2 = 0 THEN 1 ELSE -1 END AS s
    FROM h
)
SELECT doc_id, dim, CAST(SUM(s) AS BIGINT) AS weight
FROM f GROUP BY 1, 2 HAVING SUM(s) <> 0
ORDER BY doc_id, dim
"""


def tfidf_search_topk_sql(k: int | None = None) -> str:
    """Integer tf-idf search replica: exact-token df / tf, integer idf
    (SCALE // df), deterministic (score DESC, doc_id ASC) top-k."""
    from .queries import TFIDF_SCALE, TFIDF_TERMS, TFIDF_TOPK

    kk = TFIDF_TOPK if k is None else k
    in_list = ", ".join(f"'{t}'" for t in TFIDF_TERMS)
    return f"""
WITH {_doc_tokens_cte()},
tk AS (SELECT doc_id, unnest(ts) AS t FROM toks),
df AS (
    SELECT t, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
    FROM tk WHERE t IN ({in_list}) GROUP BY 1
),
tf AS (
    SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf
    FROM tk WHERE t IN ({in_list}) GROUP BY 1, 2
),
sc AS (
    SELECT tf.doc_id,
           CAST(SUM(tf.tf * ({TFIDF_SCALE} // df.df)) AS BIGINT) AS score
    FROM tf JOIN df USING (t) GROUP BY 1
)
SELECT doc_id, score FROM sc
WHERE score > 0
ORDER BY score DESC, doc_id ASC
LIMIT {kk}
"""


def order_lineitem_revenue_sql() -> str:
    """Shared oracle for BOTH hash-join strategies (broadcast and
    bucketed co-group must be output-invisible): per-row cents
    quantization, BIGINT-cast sums."""
    return """
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1 ORDER BY 1
"""


def events_resample_ffill_sql() -> str:
    """Hourly resample + forward fill replica: dense per-user hour grid
    via generate_series, deterministic last-event pick arg_max(cents,
    (ts, event_id)), window IGNORE NULLS forward fill."""
    return """
WITH b AS (
    SELECT user_id, ts, event_id, date_trunc('hour', ts) AS hour,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
    FROM events
),
hb AS (
    SELECT user_id, hour, CAST(n AS BIGINT) AS n, cents AS last_cents
    FROM (
        SELECT user_id, hour, cents,
               COUNT(*) OVER (PARTITION BY user_id, hour) AS n,
               ROW_NUMBER() OVER (PARTITION BY user_id, hour
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM b
    ) WHERE rn = 1
),
spans AS (SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM hb GROUP BY 1),
grid AS (
    SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
    FROM spans
),
j AS (
    SELECT g.user_id, g.hour, COALESCE(hb.n, 0) AS n, hb.last_cents
    FROM grid g LEFT JOIN hb USING (user_id, hour)
)
SELECT user_id, hour, CAST(n AS BIGINT) AS n,
       CAST(last_value(last_cents IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY hour
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS last_cents
FROM j ORDER BY user_id, hour
"""


def q3_shipping_priority_sql(k: int = 10) -> str:
    """TPC-H-Q3-shaped oracle: same segment/date constants as the engine
    (queries.Q3_SEGMENT / Q3_CUTOFF), per-row discounted cents, top-k
    with (revenue DESC, o_orderkey ASC) tie-break."""
    from .queries import Q3_CUTOFF, Q3_SEGMENT

    return f"""
SELECT l.l_orderkey AS o_orderkey,
       o.o_orderdate,
       o.o_orderpriority,
       CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = '{Q3_SEGMENT}'
  AND o.o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
  AND l.l_shipdate > TIMESTAMP '{Q3_CUTOFF}'
GROUP BY 1, 2, 3
ORDER BY revenue_cents DESC, o_orderkey ASC
LIMIT {k}
"""


def orders_price_ntile_sql(tiles: int | None = None) -> str:
    """Equi-depth binning replica: explicit rank formula (NOT NTILE —
    its remainder placement differs) over the identical (cents,
    orderkey) order."""
    from .queries import NTILE_TILES

    t = NTILE_TILES if tiles is None else tiles
    return f"""
WITH r AS (
    SELECT o_orderkey,
           ROW_NUMBER() OVER (
               ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT),
                        o_orderkey) AS rnk,
           COUNT(*) OVER () AS n
    FROM orders
)
SELECT o_orderkey, CAST(((rnk - 1) * {t}) // n + 1 AS BIGINT) AS quartile
FROM r ORDER BY o_orderkey
"""


def customer_running_total_sql() -> str:
    return """
SELECT o_orderkey,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS running_cents
FROM orders ORDER BY o_orderkey
"""


def orders_interorder_gap_sql() -> str:
    """Engine's day_num diff == date_diff('day') for epoch-positive
    timestamps (both count midnight boundaries)."""
    return """
SELECT o_orderkey,
       CAST(COALESCE(date_diff('day',
           LAG(o_orderdate) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           o_orderdate), -1) AS BIGINT) AS gap_days
FROM orders ORDER BY o_orderkey
"""


def lineitem_moments_sql() -> str:
    return """
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_qty_cents,
       CAST(SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)
                * CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sumsq_qty_cents
FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
"""


def user_mode_event_type_sql() -> str:
    return """
WITH c AS (
    SELECT user_id, event_type, COUNT(*) AS cnt
    FROM events GROUP BY 1, 2
), r AS (
    SELECT user_id, event_type, cnt,
           ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY cnt DESC, event_type ASC) AS rn
    FROM c
)
SELECT user_id, event_type AS mode_event_type, CAST(cnt AS BIGINT) AS n_events
FROM r WHERE rn = 1 ORDER BY user_id
"""


def pages_boilerplate_strip_sql() -> str:
    """Full SQL replica of the CCNet-style strip: identical '. ' split,
    per-page-distinct df, and the SAME integer threshold constant."""
    from .queries import BOILER_DF_DENOM

    return f"""
WITH {_pages_corpus_ctes()},
pfrag AS (
    SELECT i, url,
           UNNEST(generate_series(1, len(string_split(text, '. ')))) AS j,
           string_split(text, '. ') AS l
    FROM pgtext
),
fr AS (SELECT i, url, j, l[j] AS frag FROM pfrag),
fdf AS (SELECT frag, COUNT(DISTINCT i) AS df FROM fr GROUP BY 1),
boiler AS (
    SELECT frag FROM fdf
    WHERE df * {BOILER_DF_DENOM} >= (SELECT COUNT(*) FROM pgtext)
),
kept AS (
    SELECT f.i, f.url, f.j, f.frag FROM fr f
    WHERE f.frag NOT IN (SELECT frag FROM boiler)
),
tot AS (SELECT i, COUNT(*) AS n_frag FROM fr GROUP BY 1)
SELECT k.url,
       string_agg(k.frag, '. ' ORDER BY k.j) AS clean_text,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(MAX(t.n_frag) - COUNT(*) AS BIGINT) AS n_removed
FROM kept k JOIN tot t USING (i)
GROUP BY k.url
ORDER BY k.url
"""


def embedding_centroids_sql() -> str:
    from .queries import EMB_Q_SCALE

    return f"""
WITH e AS (
    SELECT label,
           UNNEST(generate_series(1, len(embedding))) AS j,
           embedding AS l
    FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label, CAST(j AS BIGINT) AS dim,
       CAST(SUM(CAST(floor(l[j] * {EMB_Q_SCALE} + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_q,
       CAST(COUNT(*) AS BIGINT) AS n
FROM e GROUP BY 1, 2 ORDER BY 1, 2
"""


def orders_validation_report_sql() -> str:
    return """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) FILTER (o_custkey IS NULL) AS BIGINT) AS null_custkey,
       CAST(COUNT(*) FILTER (o_totalprice <= 0) AS BIGINT) AS nonpositive_price,
       CAST(COUNT(*) FILTER (o_orderstatus NOT IN ('O', 'F', 'P')) AS BIGINT)
           AS bad_status,
       CAST(COUNT(*) FILTER (o_custkey <= 0) AS BIGINT) AS nonpositive_custkey
FROM orders
"""


def revenue_rollup_sql() -> str:
    return """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
ORDER BY 1, 2
"""


def order_fulfillment_left_sql() -> str:
    """Shared by both join strategies (strategy must be output-invisible)."""
    return """
WITH agg AS (
    SELECT l_orderkey AS o_orderkey,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS item_cents
    FROM lineitem GROUP BY 1
)
SELECT o.o_orderkey, o.o_orderstatus,
       CAST(COALESCE(a.n_items, 0) AS BIGINT) AS n_items,
       CAST(COALESCE(a.item_cents, 0) AS BIGINT) AS item_cents
FROM orders o LEFT JOIN agg a USING (o_orderkey)
ORDER BY o.o_orderkey
"""


def user_event_pivot_sql() -> str:
    from .queries import PIVOT_EVENT_TYPES

    cols = ",\n       ".join(
        f"CAST(COUNT(*) FILTER (event_type = '{t}') AS BIGINT) AS n_{t}"
        for t in PIVOT_EVENT_TYPES
    )
    return f"""
SELECT user_id,
       {cols}
FROM events GROUP BY 1 ORDER BY 1
"""


def view_purchase_funnel_sql() -> str:
    return """
WITH u AS (SELECT DISTINCT user_id FROM events),
v AS (
    SELECT user_id, MIN(ts) AS t1 FROM events
    WHERE event_type = 'view' GROUP BY 1
),
c AS (
    SELECT e.user_id, MIN(e.ts) AS t2
    FROM events e JOIN v ON v.user_id = e.user_id AND e.ts >= v.t1
    WHERE e.event_type = 'click' GROUP BY 1
),
p AS (
    SELECT e.user_id, MIN(e.ts) AS t3
    FROM events e JOIN c ON c.user_id = e.user_id AND e.ts >= c.t2
    WHERE e.event_type = 'purchase' GROUP BY 1
)
SELECT u.user_id,
       CAST(CASE WHEN v.user_id IS NULL THEN 0
                 WHEN c.user_id IS NULL THEN 1
                 WHEN p.user_id IS NULL THEN 2
                 ELSE 3 END AS BIGINT) AS funnel_stage
FROM u
LEFT JOIN v USING (user_id)
LEFT JOIN c USING (user_id)
LEFT JOIN p USING (user_id)
ORDER BY 1
"""


def orders_price_histogram_sql() -> str:
    from .queries import HIST_BIN_CENTS

    return f"""
WITH t AS (
    SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // {HIST_BIN_CENTS}
        AS bin
    FROM orders
)
SELECT bin, CAST(bin * {HIST_BIN_CENTS} AS BIGINT) AS lo_cents,
       CAST(COUNT(*) AS BIGINT) AS n
FROM t GROUP BY 1 ORDER BY 1
"""


def orders_above_customer_avg_sql() -> str:
    return """
WITH t AS (
    SELECT o_orderkey, o_custkey,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
    FROM orders
),
a AS (
    SELECT o_custkey, CAST(SUM(cents) AS BIGINT) AS s,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM t GROUP BY 1
)
SELECT t.o_orderkey
FROM t JOIN a USING (o_custkey)
WHERE t.cents * a.n > a.s
ORDER BY 1
"""


def customers_per_region_sql() -> str:
    return """
SELECT r.r_name,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS acctbal_cents
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY 1 ORDER BY 1
"""


def knn_graph_sql(k: int | None = None, dim: int = 64) -> str:
    """kNN-graph reference: full self join on the identical quantized
    integer dot product used by stages/ann.knn_graph_quantized (exact in
    BIGINT — every element < 2^31, every product < 2^62)."""
    from .queries import KNN_GRAPH_K
    from .stages.ann import QUANT

    k = KNN_GRAPH_K if k is None else k

    def q(col: str, i: int) -> str:
        return f"CAST(floor({col}.embedding[{i}] * {QUANT!r} + 0.5) AS BIGINT)"

    dot = " + ".join(f"{q('a', i)} * {q('b', i)}" for i in range(1, dim + 1))
    return f"""
WITH pairs AS (
    SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id, {dot} AS dot_q
    FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
),
ranked AS (
    SELECT vec_id, nbr_id, dot_q,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot_q DESC, nbr_id ASC) AS rank
    FROM pairs
)
SELECT vec_id, CAST(rank AS BIGINT) AS rank, nbr_id, dot_q
FROM ranked WHERE rank <= {k}
"""


def training_mixture_sql() -> str:
    """Mixture reference: the engine's per-tier CASE tables verbatim +
    the shared multiplicative-hash keep filter + a correlated
    generate_series for the epoch expansion."""
    from .queries import MIX_EPOCHS, MIX_RATES

    rate_case = (
        f"CASE tier WHEN 0 THEN {MIX_RATES[0]} WHEN 1 THEN {MIX_RATES[1]} "
        f"ELSE {MIX_RATES[2]} END"
    )
    ep_case = (
        f"CASE tier WHEN 0 THEN {MIX_EPOCHS[0]} WHEN 1 THEN {MIX_EPOCHS[1]} "
        f"ELSE {MIX_EPOCHS[2]} END"
    )
    return f"""
WITH t AS (
    SELECT doc_id, source, CAST(SUBSTR(source, 4) AS BIGINT) % 3 AS tier
    FROM documents
)
SELECT doc_id, source, tier,
       UNNEST(generate_series(1, {ep_case})) AS epoch
FROM t
WHERE ((doc_id * 2654435761) % 4294967296) % 100 < {rate_case}
"""


def user_journeys_sql() -> str:
    return """
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       string_agg(event_type, '>' ORDER BY ts, event_id) AS journey
FROM events GROUP BY user_id
"""


def customers_with_orders_sql(negate: bool = False) -> str:
    word = "NOT EXISTS" if negate else "EXISTS"
    return f"""
SELECT c_custkey, c_nationkey FROM customer
WHERE {word} (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def revenue_cube_sql() -> str:
    return """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
ORDER BY 1, 2
"""


def token_heavy_hitters_sql(cap: int | None = None) -> str:
    """Heavy-hitter reference: plain exact HAVING over the shared RE2
    tokenization — valid for the engine because the Misra-Gries phase
    only proposes candidates; the exact recount decides."""
    from .queries import HH_CAP

    cap = HH_CAP if cap is None else cap
    return f"""
WITH toks0 AS (
    SELECT list_filter(regexp_split_to_array(lower(text), '{WS_SPLIT_PATTERN}'), x -> x <> '') AS ts
    FROM documents
),
tok AS (SELECT unnest(ts) AS token FROM toks0),
c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY 1),
tot AS (SELECT COUNT(*) AS t FROM tok)
SELECT token, n FROM c, tot WHERE n * {cap} > t
"""


def delta_new_documents_sql() -> str:
    """Snapshot-diff reference: identical rolling-fp polynomial on both
    engines (fp collisions, if any, are shared so hashes still match)."""
    from .functions.text import rolling_fingerprint_sql

    fp = rolling_fingerprint_sql("text")
    return f"""
WITH f AS (SELECT doc_id, {fp} AS fp FROM documents)
SELECT doc_id, fp FROM f
WHERE doc_id % 2 = 1
  AND fp NOT IN (SELECT fp FROM f WHERE doc_id % 2 = 0)
"""


def orders_price_outliers_sql() -> str:
    """Outlier reference: the engine's exact integer percentile rule
    (smallest v with cum >= ceil(p*n/1000)), then a strict > filter."""
    from .queries import OUTLIER_PM

    return f"""
WITH t AS (
    SELECT o_orderkey,
           CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents
    FROM orders
),
tot AS (SELECT COUNT(*) AS n FROM t),
c AS (SELECT price_cents, COUNT(*) AS cnt FROM t GROUP BY 1),
cum AS (
    SELECT price_cents, SUM(cnt) OVER (ORDER BY price_cents) AS cum FROM c
),
thr AS (
    SELECT MIN(price_cents) AS v FROM cum, tot
    WHERE cum >= ({OUTLIER_PM} * n + 999) // 1000
)
SELECT t.o_orderkey, t.price_cents FROM t, thr WHERE t.price_cents > thr.v
"""


def order_route_l1_sql() -> str:
    """Route-length reference: LAG window over the identical integer
    lattice indices; ties in (l_linenumber, l_partkey) share coordinates
    so the window order is well-defined despite duplicate keys."""
    return """
WITH p AS (
    SELECT l_orderkey,
           (l_orderkey * 131 + l_linenumber * 17) % 4096 AS ix,
           (l_orderkey * 241 + l_partkey * 13) % 4096 AS iy,
           l_linenumber, l_partkey
    FROM lineitem
),
d AS (
    SELECT l_orderkey,
           abs(ix - lag(ix) OVER w) + abs(iy - lag(iy) OVER w) AS step
    FROM p WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey)
)
SELECT l_orderkey,
       CAST(COALESCE(SUM(step), 0) * 125 AS BIGINT) AS path_m,
       CAST(COUNT(*) AS BIGINT) AS n_stops
FROM d GROUP BY 1
"""


def tile_cover_lineitem_sql() -> str:
    from .functions.tiles import tile_assign_sql
    from .queries import TILE_COVER_BUFFER_M

    b = repr(TILE_COVER_BUFFER_M)
    tx0, ty0 = tile_assign_sql(f"(qx - {b})", f"(qy + {b})")
    tx1, ty1 = tile_assign_sql(f"(qx + {b})", f"(qy - {b})")
    return f"""
WITH qpts AS ({_uniform_points_select()}),
c AS (
    SELECT query_id, {tx0} AS tx0, {ty0} AS ty0, {tx1} AS tx1, {ty1} AS ty1
    FROM qpts
),
ex AS (
    SELECT query_id, UNNEST(generate_series(tx0, tx1)) AS tile_x, ty0, ty1
    FROM c
)
SELECT query_id, tile_x, UNNEST(generate_series(ty0, ty1)) AS tile_y FROM ex
"""


def events_props_extract_sql() -> str:
    return """
WITH k AS (
    SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(k) AS BIGINT) AS k_sum, MAX(k) AS k_max
FROM k GROUP BY 1
"""


def orders_profile_sql() -> str:
    from .queries import PROFILE_COLS

    parts = []
    for c in PROFILE_COLS:
        expr = (
            f"CAST(floor({c} * 100.0 + 0.5) AS BIGINT)"
            if c == "o_totalprice"
            else f"CAST({c} AS BIGINT)"
        )
        parts.append(
            f"SELECT '{c}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n, "
            f"CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null, "
            f"MIN({expr}) AS min_v, MAX({expr}) AS max_v FROM orders"
        )
    return " UNION ALL ".join(parts)


def events_recent_pruned_sql(days: int | None = None) -> str:
    """Pruned-read reference: calendar cutoff from MAX(ts).  Valid
    against the engine's trailing-directory pick because the synthetic
    events table is day-dense (30 contiguous days)."""
    from .queries import PRUNED_DAYS

    days = PRUNED_DAYS if days is None else days
    return f"""
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS value_cents
FROM events
WHERE date_trunc('day', ts) >=
      (SELECT date_trunc('day', MAX(ts)) FROM events) - INTERVAL {days - 1} DAY
GROUP BY 1, 2
"""


def orders_upsert_sql() -> str:
    from .queries import UPSERT_BUMP_CENTS, UPSERT_PCT

    return f"""
WITH b AS (
    SELECT o_orderkey, CAST(1 AS BIGINT) AS version,
           CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents
    FROM orders
),
u AS (
    SELECT o_orderkey, CAST(2 AS BIGINT) AS version,
           price_cents + {UPSERT_BUMP_CENTS} AS price_cents
    FROM b WHERE ((o_orderkey * 2654435761) % 4294967296) % 100 < {UPSERT_PCT}
),
a AS (SELECT * FROM b UNION ALL SELECT * FROM u)
SELECT o_orderkey, version, price_cents FROM a
QUALIFY row_number() OVER (PARTITION BY o_orderkey ORDER BY version DESC) = 1
"""


def events_dedup_hourly_sql() -> str:
    return """
SELECT event_id, user_id, event_type,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour
FROM events
QUALIFY row_number() OVER (
    PARTITION BY user_id, event_type, date_trunc('hour', ts)
    ORDER BY ts, event_id
) = 1
"""


def token_cooccurrence_sql(topk: int | None = None) -> str:
    """Co-occurrence reference: top-K vocabulary from the shared
    histogram rule (n DESC, token ASC), distinct doc-token incidence,
    unordered self-join."""
    from .queries import COOC_TOP

    topk = COOC_TOP if topk is None else topk
    return f"""
WITH toks0 AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text), '{WS_SPLIT_PATTERN}'), x -> x <> '') AS ts
    FROM documents
),
tok AS (SELECT doc_id, unnest(ts) AS token FROM toks0),
hist AS (
    SELECT token, COUNT(*) AS n FROM tok GROUP BY 1
    ORDER BY n DESC, token ASC LIMIT {topk}
),
dt AS (
    SELECT DISTINCT doc_id, token FROM tok
    WHERE token IN (SELECT token FROM hist)
)
SELECT a.token AS token_a, b.token AS token_b,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.token < b.token
GROUP BY 1, 2
"""


def name_typo_pairs_sql() -> str:
    """SymSpell reference: the SAME deletion-neighborhood candidate
    generation in SQL (variant = delete one char), then DuckDB's
    levenshtein() as the exact verify."""
    return """
WITH vocab AS (SELECT DISTINCT lower(c_name) AS t FROM customer),
var AS (
    SELECT t, t AS v FROM vocab
    UNION ALL
    SELECT t, concat(substr(t, 1, i - 1), substr(t, i + 1)) AS v
    FROM vocab, UNNEST(generate_series(1, length(t))) AS u(i)
),
cand AS (
    SELECT DISTINCT a.t AS ta, b.t AS tb
    FROM var a JOIN var b ON a.v = b.v AND a.t < b.t
)
SELECT ta, tb FROM cand WHERE levenshtein(ta, tb) <= 1
"""


def orders_price_rank_sql() -> str:
    return """
SELECT o_orderkey,
       CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents,
       CAST(RANK() OVER (ORDER BY floor(o_totalprice * 100.0 + 0.5)) AS BIGINT)
           AS rank
FROM orders
"""


def supplier_triangles_sql() -> str:
    """Triangle reference: identical incidence -> weights -> median
    threshold (shared ceil-rank rule) -> strict-filter edges -> 3-way
    self-join count."""
    return """
WITH p AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
w AS (
    SELECT a.l_suppkey AS sa, b.l_suppkey AS sb, CAST(COUNT(*) AS BIGINT) AS wt
    FROM p a JOIN p b ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    GROUP BY 1, 2
),
tot AS (SELECT COUNT(*) AS n FROM w),
c AS (SELECT wt, COUNT(*) AS cnt FROM w GROUP BY 1),
cum AS (SELECT wt, SUM(cnt) OVER (ORDER BY wt) AS cum FROM c),
thr AS (
    SELECT MIN(wt) AS v FROM cum, tot WHERE cum >= (500 * n + 999) // 1000
),
e AS (SELECT sa, sb FROM w, thr WHERE w.wt > thr.v)
SELECT (SELECT v FROM thr) AS threshold_w,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
       (SELECT CAST(COUNT(*) AS BIGINT)
        FROM e e1 JOIN e e2 ON e1.sb = e2.sa
        JOIN e e3 ON e1.sa = e3.sa AND e2.sb = e3.sb) AS n_triangles
"""


def orders_table_checksum_sql() -> str:
    from .queries import CHECKSUM_K, CHECKSUM_M

    return f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(((o_orderkey % {CHECKSUM_M}) * {CHECKSUM_K}
                 + CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) % {CHECKSUM_M})
                % {CHECKSUM_M}) AS BIGINT) AS checksum
FROM orders
"""


def events_hourly_median_sql() -> str:
    return """
WITH t AS (
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
           CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
    FROM events
),
tot AS (SELECT hour, COUNT(*) AS n FROM t GROUP BY 1),
c AS (SELECT hour, cents, COUNT(*) AS cnt FROM t GROUP BY 1, 2),
cum AS (
    SELECT hour, cents, SUM(cnt) OVER (PARTITION BY hour ORDER BY cents) AS cum
    FROM c
)
SELECT tot.hour,
       (SELECT MIN(cum.cents) FROM cum
        WHERE cum.hour = tot.hour AND cum.cum >= (500 * tot.n + 999) // 1000)
           AS p50_cents
FROM tot
"""


def event_transitions_sql() -> str:
    return """
WITH s AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
    FROM events
)
SELECT prev_type, event_type AS next_type, CAST(COUNT(*) AS BIGINT) AS n
FROM s WHERE prev_type IS NOT NULL
GROUP BY 1, 2
"""


def geocode_pages_tile_counts_sql() -> str:
    """North-star composition reference: the full pages flagship oracle
    as a CTE, matched rows tiled with the shared web-mercator formula."""
    from .functions.tiles import tile_assign_sql

    tx, ty = tile_assign_sql("x", "y")
    return f"""
WITH g AS ({geocode_pages_sql()})
SELECT {tx} AS tile_x, {ty} AS tile_y, CAST(COUNT(*) AS BIGINT) AS n
FROM g WHERE score > 0 GROUP BY 1, 2
"""


def pages_html_extract_verify_sql() -> str:
    """Extraction-invariant reference: in the SQL-regenerated corpus
    text == extract(html) holds by construction, so n_identical must
    equal n_pages and total_chars is the text length sum."""
    return f"""
WITH {_pages_corpus_ctes()}
SELECT CAST(COUNT(*) AS BIGINT) AS n_pages,
       CAST(COUNT(*) AS BIGINT) AS n_identical,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars
FROM pgtext
"""


def user_retention_cohorts_sql() -> str:
    return """
WITH d AS (
    SELECT DISTINCT user_id,
           strftime(date_trunc('day', ts), '%Y-%m-%d') AS day
    FROM events
),
c AS (SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY 1)
SELECT c.cohort_day, d.day AS active_day, CAST(COUNT(*) AS BIGINT) AS n_users
FROM d JOIN c USING (user_id) GROUP BY 1, 2
"""


def orders_trend_by_priority_sql() -> str:
    return """
WITH t AS (
    SELECT o_orderpriority AS prio,
           CAST(date_diff('day', DATE '2024-01-01',
                          date_trunc('day', o_orderdate)) AS BIGINT) AS x,
           CAST(floor(o_totalprice + 0.5) AS BIGINT) AS y
    FROM orders
),
s AS (
    SELECT prio, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
    FROM t GROUP BY 1
)
SELECT prio AS o_orderpriority, n,
       n * sxy - sx * sy AS slope_num,
       n * sxx - sx * sx AS slope_den
FROM s
"""


def q5_nation_revenue_sql() -> str:
    """TPC-H-Q5-shaped: local-supplier revenue per nation, identical
    per-row cents quantization to the engine partial."""
    return """
SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
WHERE c.c_nationkey = s.s_nationkey
GROUP BY 1 ORDER BY 1
"""


def customer_nation_bbox_sql() -> str:
    """ST_Extent analog over the customer lattice points; the lattice ->
    meters projection is the same pure-affine map as the engine (exact
    in float64)."""
    from .functions.cells import EXTENT, X0, Y0
    from .queries import BBOX_MULT_X, BBOX_MULT_Y

    step = EXTENT / 4096
    return f"""
WITH pts AS (
    SELECT CAST(c_nationkey AS BIGINT) AS n_nationkey,
           (c_custkey * {BBOX_MULT_X}) % 4096 AS ix,
           (c_custkey * {BBOX_MULT_Y}) % 4096 AS iy
    FROM customer
)
SELECT p.n_nationkey, n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       {X0!r} + MIN(ix) * {step!r} AS min_x,
       {X0!r} + MAX(ix) * {step!r} AS max_x,
       {Y0!r} + MIN(iy) * {step!r} AS min_y,
       {Y0!r} + MAX(iy) * {step!r} AS max_y
FROM pts p JOIN nation n ON n.n_nationkey = p.n_nationkey
GROUP BY 1, 2 ORDER BY 1
"""


def events_melt_sql() -> str:
    """Long-form twin of user_event_pivot_sql: the unpivot of the
    crosstab collapses to a plain grouped count over the declared
    types (zero cells drop out by construction)."""
    from .queries import PIVOT_EVENT_TYPES

    types = ", ".join(f"'{t}'" for t in PIVOT_EVENT_TYPES)
    return f"""
SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM events WHERE event_type IN ({types})
GROUP BY 1, 2 ORDER BY 1, 2
"""


def orders_keyset_page_sql() -> str:
    from .queries import PAGE_OFFSET, PAGE_SIZE

    return f"""
WITH r AS (
    SELECT o_orderkey,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
    FROM orders
),
ranked AS (
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY price_cents DESC, o_orderkey ASC)
                AS BIGINT) AS pos,
           o_orderkey, price_cents
    FROM r
)
SELECT pos, o_orderkey, price_cents FROM ranked
WHERE pos > {PAGE_OFFSET} AND pos <= {PAGE_OFFSET + PAGE_SIZE}
ORDER BY pos
"""


def fk_integrity_audit_sql() -> str:
    """One NOT IN anti-probe per FK relation (keys are non-null PKs);
    relation labels sorted to match the engine's FK_RELATIONS order."""
    from .queries import FK_RELATIONS

    parts = []
    for label, child_t, child_k, parent_t, parent_k in FK_RELATIONS:
        parts.append(
            f"""
SELECT '{label}' AS relation, CAST(COUNT(*) AS BIGINT) AS child_rows,
       CAST(SUM(CASE WHEN {child_k} NOT IN (SELECT {parent_k} FROM {parent_t})
                     THEN 1 ELSE 0 END) AS BIGINT) AS orphan_rows
FROM {child_t}"""
        )
    body = "\nUNION ALL\n".join(parts)
    return f"SELECT * FROM (\n{body}\n) ORDER BY relation"


def lineitem_weighted_median_sql() -> str:
    """Weighted-median replica: same ceil-rank rule (first cents whose
    cumulative quantity weight reaches ceil(W/2))."""
    return """
WITH g AS (
    SELECT l_returnflag AS flag,
           CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
           CAST(SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS w
    FROM lineitem GROUP BY 1, 2
),
c AS (
    SELECT flag, cents,
           SUM(w) OVER (PARTITION BY flag ORDER BY cents) AS cum,
           SUM(w) OVER (PARTITION BY flag) AS tot
    FROM g
)
SELECT flag AS l_returnflag, CAST(MIN(cents) AS BIGINT) AS wmedian_cents
FROM c WHERE cum >= (tot + 1) // 2
GROUP BY 1 ORDER BY 1
"""


def key_skew_report_sql() -> str:
    from .queries import SKEW_KEYS

    parts = []
    for label, table, col in SKEW_KEYS:
        parts.append(
            f"""
SELECT '{label}' AS key, CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(MAX(n) AS BIGINT) AS max_group_n
FROM (SELECT COUNT(*) AS n FROM {table} GROUP BY {col})"""
        )
    body = "\nUNION ALL\n".join(parts)
    return f"SELECT * FROM (\n{body}\n) ORDER BY key"


def cell_week_distinct_orders_sql() -> str:
    from .functions.cells import cell_encode_sql
    from .queries import CELLWEEK_DAY_OFFSET, CELLWEEK_RES

    cell = cell_encode_sql("qx", "qy", CELLWEEK_RES)
    off = CELLWEEK_DAY_OFFSET
    return f"""
WITH qpts AS (
    SELECT l_orderkey,
           ({X0!r} + CAST((l_orderkey * 131 + l_linenumber * 17) % 4096 AS DOUBLE) * 125.0) AS qx,
           ({Y0!r} + CAST((l_orderkey * 241 + l_partkey * 13) % 4096 AS DOUBLE) * 125.0) AS qy,
           (CAST(date_diff('day', DATE '2024-01-01',
                           date_trunc('day', l_shipdate)) AS BIGINT) + {off}) // 7
               - {off // 7} AS week
    FROM lineitem
)
SELECT {cell} AS cell, week, CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
FROM qpts GROUP BY 1, 2 ORDER BY 1, 2
"""


def raster_focal_sum_sql() -> str:
    """Focal 3x3 replica: raster rows replicate via a 9-row offsets cross
    join, equi-join back to occupied pixels (same sparse discipline as
    the engine — no dense grid anywhere)."""
    from .stages.raster import TILE_PX, global_pixel_sql

    gx, gy = global_pixel_sql("qx", "qy")
    return f"""
WITH qpts AS ({_uniform_points_select()}),
gp AS (SELECT {gx} AS gx, {gy} AS gy FROM qpts),
r AS (SELECT gx, gy, CAST(COUNT(*) AS BIGINT) AS n FROM gp GROUP BY 1, 2),
offs AS (
    SELECT dx.v AS dx, dy.v AS dy
    FROM (VALUES (-1), (0), (1)) dx(v), (VALUES (-1), (0), (1)) dy(v)
),
contrib AS (SELECT gx + dx AS tx, gy + dy AS ty, n FROM r, offs)
SELECT a.gx, a.gy, a.n, CAST(SUM(c.n) AS BIGINT) AS focal_n
FROM r a JOIN contrib c ON c.tx = a.gx AND c.ty = a.gy
GROUP BY 1, 2, 3
"""


def customer_latest_order_sql() -> str:
    return """
SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
    ) AS rn
    FROM orders
) WHERE rn = 1
ORDER BY o_custkey
"""


def repeat_customers_intersect_sql() -> str:
    from .queries import INTERSECT_CUTOFF

    return f"""
SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '{INTERSECT_CUTOFF}'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '{INTERSECT_CUTOFF}'
ORDER BY o_custkey
"""


def rolling_active_users_sql() -> str:
    """WAU replica: day grid over the observed span, trailing-window
    distinct count via a range join on day index."""
    from .queries import WAU_EPOCH, WAU_WINDOW_DAYS

    return f"""
WITH ud AS (
    SELECT DISTINCT
        CAST(date_diff('day', DATE '{WAU_EPOCH}', date_trunc('day', ts)) AS BIGINT) AS d,
        user_id
    FROM events
),
span AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM ud),
grid AS (
    SELECT unnest(generate_series(d0, d1)) AS d FROM span
)
SELECT TIMESTAMP '{WAU_EPOCH}' + to_days(CAST(g.d AS INTEGER)) AS day,
       CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS active_users
FROM grid g JOIN ud u ON u.d BETWEEN g.d - {WAU_WINDOW_DAYS - 1} AND g.d
GROUP BY 1 ORDER BY 1
"""


def order_od_matrix_sql() -> str:
    from .functions.cells import cell_encode_sql
    from .queries import OD_RES

    o_cell = cell_encode_sql("o_qx", "o_qy", OD_RES)
    d_cell = cell_encode_sql("d_qx", "d_qy", OD_RES)
    return f"""
WITH stops AS (
    SELECT l_orderkey,
           ({X0!r} + CAST((l_orderkey * 131 + l_linenumber * 17) % 4096 AS DOUBLE) * 125.0) AS qx,
           ({Y0!r} + CAST((l_orderkey * 241 + l_partkey * 13) % 4096 AS DOUBLE) * 125.0) AS qy,
           ROW_NUMBER() OVER (PARTITION BY l_orderkey
                              ORDER BY l_linenumber, l_partkey) AS rf,
           ROW_NUMBER() OVER (PARTITION BY l_orderkey
                              ORDER BY l_linenumber DESC, l_partkey DESC) AS rl
    FROM lineitem
),
ends AS (
    SELECT f.l_orderkey, f.qx AS o_qx, f.qy AS o_qy, l.qx AS d_qx, l.qy AS d_qy
    FROM (SELECT * FROM stops WHERE rf = 1) f
    JOIN (SELECT * FROM stops WHERE rl = 1) l USING (l_orderkey)
)
SELECT {o_cell} AS o_cell, {d_cell} AS d_cell,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM ends GROUP BY 1, 2 ORDER BY 1, 2
"""


def supplier_bfs_distance_sql() -> str:
    """BFS replica: recursive CTE expands (node, dist) rows depth-capped
    at BFS_MAX_DEPTH; MIN(dist) per node is the hop distance.  Source =
    minimum edge endpoint, same sampled co-supply edges as the engine."""
    from .queries import BFS_MAX_DEPTH, BFS_ORDER_MOD

    return f"""
WITH RECURSIVE inc AS (
    SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
    FROM lineitem WHERE l_orderkey % {BFS_ORDER_MOD} = 0
),
edges AS (
    SELECT DISTINCT a.sk AS sa, b.sk AS sb
    FROM inc a JOIN inc b USING (ok) WHERE a.sk <> b.sk
),
src AS (SELECT MIN(sa) AS s FROM edges),
bfs(node, dist) AS (
    SELECT s, 0 FROM src
    UNION
    SELECT e.sb, bfs.dist + 1
    FROM bfs JOIN edges e ON e.sa = bfs.node
    WHERE bfs.dist < {BFS_MAX_DEPTH}
)
SELECT CAST(node AS BIGINT) AS s_suppkey, CAST(MIN(dist) AS BIGINT) AS dist
FROM bfs GROUP BY 1 ORDER BY 1
"""


def documents_store_compaction_sql() -> str:
    """Compaction audit twin: the per-lang counts and order-invariant
    checksum computed straight from the source table — a correct
    compaction is invisible to both."""
    from .functions.text import rolling_fingerprint_sql
    from .queries import COMPACT_CHECKSUM_K

    fp = rolling_fingerprint_sql("text")
    return f"""
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id * {COMPACT_CHECKSUM_K} + {fp}) AS BIGINT) AS checksum
FROM documents GROUP BY 1 ORDER BY 1
"""


def part_brand_target_encoding_sql() -> str:
    return """
WITH enc AS (
    SELECT p.p_brand,
           CAST(COUNT(l.l_partkey) AS BIGINT) AS n,
           CAST(COALESCE(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)), 0)
                AS BIGINT) AS sum_cents
    FROM (SELECT DISTINCT p_brand FROM part) p
    LEFT JOIN part pt ON pt.p_brand = p.p_brand
    LEFT JOIN lineitem l ON l.l_partkey = pt.p_partkey
    GROUP BY 1
)
SELECT pt.p_partkey, pt.p_brand,
       e.sum_cents AS enc_sum_cents, e.n AS enc_n
FROM part pt JOIN enc e ON e.p_brand = pt.p_brand
ORDER BY pt.p_partkey
"""


def events_daily_dense_sql() -> str:
    from .queries import PIVOT_EVENT_TYPES, WAU_EPOCH

    types = ", ".join(f"('{t}')" for t in PIVOT_EVENT_TYPES)
    return f"""
WITH e AS (
    SELECT CAST(date_diff('day', DATE '{WAU_EPOCH}', date_trunc('day', ts)) AS BIGINT) AS d,
           event_type
    FROM events WHERE event_type IN (SELECT t FROM (VALUES {types}) v(t))
),
span AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM e),
grid AS (
    SELECT unnest(generate_series(d0, d1)) AS d, t AS event_type
    FROM span, (VALUES {types}) v(t)
),
c AS (SELECT d, event_type, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY 1, 2)
SELECT TIMESTAMP '{WAU_EPOCH}' + to_days(CAST(g.d AS INTEGER)) AS day,
       g.event_type, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
FROM grid g LEFT JOIN c ON c.d = g.d AND c.event_type = g.event_type
ORDER BY 1, 2
"""


def doc_sentence_stats_sql() -> str:
    from .queries import SENTENCE_SPLIT_PATTERN

    pat = SENTENCE_SPLIT_PATTERN  # DuckDB single-quoted literals keep backslashes
    return f"""
SELECT doc_id,
       CAST(len(regexp_split_to_array(text, '{pat}')) AS BIGINT) AS n_sentences,
       CAST(list_max(list_transform(regexp_split_to_array(text, '{pat}'),
                                    s -> length(s))) AS BIGINT) AS max_sentence_chars
FROM documents
"""


def orders_top_prices_with_ties_sql() -> str:
    from .queries import TIES_TOPK

    return f"""
SELECT o_orderkey, o_orderpriority, price_cents, CAST(dr AS BIGINT) AS price_rank
FROM (
    SELECT o_orderkey, o_orderpriority,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents,
           DENSE_RANK() OVER (PARTITION BY o_orderpriority
                              ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                                  DESC) AS dr
    FROM orders
) WHERE dr <= {TIES_TOPK}
ORDER BY o_orderpriority, price_cents DESC, o_orderkey
"""


def user_time_weighted_value_sql() -> str:
    """TWA replica: lead() over the same (ts, event_id) order, identical
    floor-divided second gaps, COALESCE for the per-user last event."""
    return """
WITH e AS (
    SELECT user_id, epoch_us(ts) AS us,
           CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
           lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_us
    FROM events
)
SELECT user_id,
       CAST(SUM(cents * COALESCE((next_us - us) // 1000000, 0)) AS BIGINT)
           AS twa_num,
       CAST((MAX(us) - MIN(us)) // 1000000 AS BIGINT) AS twa_den_s
FROM e GROUP BY 1 ORDER BY 1
"""


def curate_then_pack_sql(theta_permille: int = 500, max_len: int | None = None) -> str:
    """Composition twin: the curated keep-set CTE (same gates, clusters,
    md5 keepers) feeds the packing window cumsum, ordered by doc_id."""
    from .functions.text import token_count_sql
    from .queries import SEQ_PACK_MAXLEN

    ml = SEQ_PACK_MAXLEN if max_len is None else max_len
    return f"""
WITH kept AS ({curated_documents_sql(theta_permille)}),
c AS (
    SELECT d.doc_id, {token_count_sql('d.text')} AS n_tokens
    FROM documents d JOIN kept k ON k.doc_id = d.doc_id
),
s AS (
    SELECT doc_id, n_tokens,
           CAST(COALESCE(SUM(n_tokens) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS cum
    FROM c
)
SELECT doc_id, n_tokens,
       CAST(cum // {ml} AS BIGINT) AS seq_id,
       CAST(cum % {ml} AS BIGINT) AS seq_offset
FROM s
"""


def points_in_bbox_pruned_sql() -> str:
    """Bbox twin over the full derivation — dir-pick pruning must be
    output-invisible (partition cells strictly cover the box)."""
    from .queries import BBOX_QUERY

    x0, y0, x1, y1 = BBOX_QUERY
    return f"""
WITH qpts AS ({_uniform_points_select()})
SELECT query_id, qx, qy FROM qpts
WHERE qx >= {x0!r} AND qx <= {x1!r} AND qy >= {y0!r} AND qy <= {y1!r}
"""


def customer_order_streaks_sql() -> str:
    from .queries import STREAK_GAP_DAYS

    return f"""
WITH o AS (
    SELECT o_custkey, epoch_us(o_orderdate) AS us,
           lag(epoch_us(o_orderdate)) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS prev_us
    FROM orders
)
SELECT o_custkey,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(1 + SUM(CASE WHEN prev_us IS NOT NULL
                          AND (us - prev_us) // {86_400 * 1_000_000}
                              >= {STREAK_GAP_DAYS}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_streaks
FROM o GROUP BY 1 ORDER BY 1
"""


def nation_revenue_share_sql() -> str:
    return f"""
WITH base AS ({q5_nation_revenue_sql()})
SELECT n_name, revenue_cents,
       CAST(SUM(revenue_cents) OVER () AS BIGINT) AS total_cents,
       CAST(revenue_cents * 1000 // GREATEST(SUM(revenue_cents) OVER (), 1)
            AS BIGINT) AS share_permille
FROM base ORDER BY n_name
"""


def parcel_proximity_pairs_sql() -> str:
    """Rect proximity twin: identical dilated-box floats (same literal
    constants, same left-assoc arithmetic), full pairwise predicate —
    the engine's cell-bucket candidates + report-once rule must be
    output-invisible."""
    from .queries import PARCEL_PROX_D
    from .sources.synthetic import PARCEL_HALF

    half = PARCEL_PROX_D / 2.0
    return f"""
WITH {address_points_values_sql('ap')},
p AS (
    SELECT point_id AS pid,
           x - {PARCEL_HALF!r} - {half!r} AS ex0, x + {PARCEL_HALF!r} + {half!r} AS ex1,
           y - {PARCEL_HALF!r} - {half!r} AS ey0, y + {PARCEL_HALF!r} + {half!r} AS ey1
    FROM ap
)
SELECT CAST(a.pid AS BIGINT) AS pa, CAST(b.pid AS BIGINT) AS pb
FROM p a JOIN p b ON a.pid < b.pid
WHERE a.ex0 < b.ex1 AND b.ex0 < a.ex1 AND a.ey0 < b.ey1 AND b.ey0 < a.ey1
ORDER BY 1, 2
"""


def user_cusum_alarm_sql() -> str:
    from .queries import CUSUM_SLOPE_CENTS

    return f"""
WITH e AS (
    SELECT user_id, event_id,
           SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS BIGINT) AS pos
    FROM events
),
a AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY pos) AS rn
    FROM e WHERE run > {CUSUM_SLOPE_CENTS} * pos
)
SELECT user_id, event_id AS alarm_event_id, pos AS alarm_pos,
       CAST(run AS BIGINT) AS run_cents
FROM a WHERE rn = 1 ORDER BY user_id
"""


def embedding_norm_quantized_sql() -> str:
    from .stages.ann import QUANT

    q = f"CAST(floor(CAST(x AS DOUBLE) * {QUANT!r} + 0.5) AS BIGINT)"
    return f"""
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dims,
       CAST(list_sum(list_transform(embedding, x -> {q} * {q})) AS BIGINT)
           AS norm2_q
FROM embeddings
"""


def events_top2_gap_sql() -> str:
    return """
WITH r AS (
    SELECT user_id, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                                  DESC) AS rn
    FROM events
)
SELECT user_id,
       CAST(MAX(CASE WHEN rn = 1 THEN cents END) AS BIGINT) AS max_cents,
       CAST(MAX(CASE WHEN rn = 2 THEN cents END) AS BIGINT) AS second_cents,
       CAST(MAX(CASE WHEN rn = 1 THEN cents END)
            - MAX(CASE WHEN rn = 2 THEN cents END) AS BIGINT) AS gap_cents
FROM r WHERE rn <= 2
GROUP BY 1 HAVING COUNT(*) >= 2
ORDER BY 1
"""


def orders_quarterly_revenue_sql() -> str:
    return """
SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
       CAST((month(o_orderdate) - 1) // 3 + 1 AS BIGINT) AS quarter,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM orders GROUP BY 1, 2 ORDER BY 1, 2
"""


def lineitem_ship_delay_histogram_sql() -> str:
    from .queries import DELAY_BIN_DAYS

    return f"""
SELECT CAST((date_diff('day', date_trunc('day', o.o_orderdate),
                       date_trunc('day', l.l_shipdate)) + 300000)
            // {DELAY_BIN_DAYS} - {300_000 // DELAY_BIN_DAYS} AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1 ORDER BY 1
"""


# ------------------- TPC-H-shaped wave (round 4) — constants imported
# from queries.py so engine and oracle can never drift.

def q4_order_priority_sql() -> str:
    from .queries import Q4_END, Q4_START

    return f"""
SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{Q4_START}'
  AND o.o_orderdate < TIMESTAMP '{Q4_END}'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY 1 ORDER BY 1
"""


def q10_returned_revenue_sql() -> str:
    from .queries import Q10_END, Q10_START, Q10_TOPK

    return f"""
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '{Q10_START}'
  AND o.o_orderdate < TIMESTAMP '{Q10_END}'
GROUP BY 1, 2, 3
ORDER BY revenue_cents DESC, c.c_custkey ASC
LIMIT {Q10_TOPK}
"""


def q12_late_lines_sql() -> str:
    from .queries import Q12_DELAY_DAYS, Q12_HIGH_PRIORITIES

    high = ", ".join(f"'{p}'" for p in Q12_HIGH_PRIORITIES)
    return f"""
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ({high}) THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ({high}) THEN 0 ELSE 1 END)
            AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= o.o_orderdate + INTERVAL {Q12_DELAY_DAYS} DAY
GROUP BY 1 ORDER BY 1
"""


def q13_customer_distribution_sql() -> str:
    return """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
    SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
    FROM customer c
    LEFT JOIN orders o
      ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '4-NOT SPECIFIED'
    GROUP BY 1
)
GROUP BY 1 ORDER BY custdist DESC, c_count DESC
"""


def q14_promo_revenue_sql() -> str:
    from .queries import Q14_END, Q14_START

    return f"""
WITH j AS (
    SELECT CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                AS BIGINT) AS cents,
           (p.p_type = 'PROMO') AS is_promo
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '{Q14_START}'
      AND l.l_shipdate < TIMESTAMP '{Q14_END}'
)
SELECT CAST(SUM(CASE WHEN is_promo THEN cents ELSE 0 END) AS BIGINT) AS promo_cents,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST(SUM(CASE WHEN is_promo THEN cents ELSE 0 END) * 1000
            // SUM(cents) AS BIGINT) AS promo_permille
FROM j
"""


def q16_brand_supplier_count_sql() -> str:
    from .queries import Q16_EXCLUDED_BRAND, Q16_SIZES

    sizes = ", ".join(str(s) for s in Q16_SIZES)
    return f"""
SELECT p.p_brand, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> '{Q16_EXCLUDED_BRAND}'
  AND p.p_size IN ({sizes})
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2
ORDER BY supplier_cnt DESC, p_brand ASC, p_size ASC
"""


def q18_large_orders_sql() -> str:
    from .queries import Q18_MIN_QTY

    return f"""
WITH big AS (
    SELECT l_orderkey, CAST(SUM(CAST(floor(l_quantity + 0.5) AS BIGINT))
                            AS BIGINT) AS sum_qty
    FROM lineitem GROUP BY 1
    HAVING SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)) >= {Q18_MIN_QTY}
)
SELECT o.o_custkey AS c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
       CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS o_totalprice_cents,
       b.sum_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o_totalprice_cents DESC, o.o_orderkey ASC
LIMIT 100
"""


def q19_disjunctive_revenue_sql() -> str:
    from .queries import Q19_DISJUNCTS

    clauses = " OR ".join(
        f"(p.p_brand = '{b}' AND p.p_size BETWEEN {slo} AND {shi} "
        f"AND CAST(floor(l.l_quantity + 0.5) AS BIGINT) BETWEEN {qlo} AND {qhi})"
        for b, slo, shi, qlo, qhi in Q19_DISJUNCTS
    )
    return f"""
SELECT CAST(COALESCE(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                                    + 0.5) AS BIGINT)), 0) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE {clauses}
"""


def q22_idle_customers_sql() -> str:
    from .queries import Q22_ACTIVE_SINCE, Q22_CODE_MOD, Q22_CODES

    codes = ", ".join(str(c) for c in Q22_CODES)
    return f"""
WITH base AS (
    SELECT c_custkey, c_custkey % {Q22_CODE_MOD} AS cntrycode,
           CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal
    FROM customer WHERE c_custkey % {Q22_CODE_MOD} IN ({codes})
),
st AS (
    SELECT CAST(SUM(bal) AS BIGINT) AS s, COUNT(*) AS n FROM base WHERE bal > 0
)
SELECT CAST(b.cntrycode AS BIGINT) AS cntrycode,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(b.bal) AS BIGINT) AS totacctbal_cents
FROM base b, st
WHERE b.bal * st.n > st.s
  AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = b.c_custkey
        AND o.o_orderdate >= TIMESTAMP '{Q22_ACTIVE_SINCE}'
  )
GROUP BY 1 ORDER BY 1
"""


# ---------------- round-4 spatial geometry wave

def parcel_area_by_grid_sql() -> str:
    """Shoelace area == (xmax-xmin)*(ymax-ymin) for the rectangle layer;
    bbox centroid == the anchor point.  All integral meters — exact."""
    return f"""
WITH {address_points_values_sql('ap')},
{parcels_bbox_values_sql('parcels')},
j AS (
    SELECT p.*, a.address_grid
    FROM parcels p
    JOIN ap a ON a.point_id = CAST(substr(p.parcel_id, 2) AS BIGINT)
)
SELECT address_grid,
       CAST(COUNT(*) AS BIGINT) AS n_parcels,
       SUM((xmax - xmin) * (ymax - ymin)) AS total_area_m2,
       SUM((xmin + xmax) / 2) AS sum_cx,
       SUM((ymin + ymax) / 2) AS sum_cy
FROM j GROUP BY 1 ORDER BY 1
"""


def points_outside_parcels_sql() -> str:
    return f"""
WITH {address_points_values_sql('ap')},
{parcels_bbox_values_sql('parcels')},
{_anchored_points_cte()}
SELECT q.query_id
FROM qpts q
WHERE NOT EXISTS (
    SELECT 1 FROM parcels p
    WHERE q.qx > p.xmin AND q.qx < p.xmax AND q.qy > p.ymin AND q.qy < p.ymax
)
"""


def parcel_cell_coverage_sql() -> str:
    """Exact clipped-intersection replica: same floor cell arithmetic,
    LEAST/GREATEST clipping, integral meters throughout; the lateral
    expansion uses the 2-step UNNEST(generate_series) pattern (DuckDB
    lacks lateral generate_series)."""
    from .functions.cells import EXTENT, X0, Y0
    from .queries import COVERAGE_RES
    from .sources.synthetic import PARCEL_HALF

    n = 1 << COVERAGE_RES
    s = EXTENT / n
    return f"""
WITH {address_points_values_sql('ap')},
pb AS (
    SELECT x - {PARCEL_HALF!r} AS x0, x + {PARCEL_HALF!r} AS x1,
           y - {PARCEL_HALF!r} AS y0, y + {PARCEL_HALF!r} AS y1
    FROM ap
),
rng AS (
    SELECT *,
           CAST(floor((x0 - {X0!r}) / {s!r}) AS BIGINT) AS ix0,
           CAST(floor((x1 - {X0!r}) / {s!r}) AS BIGINT) AS ix1,
           CAST(floor((y0 - {Y0!r}) / {s!r}) AS BIGINT) AS iy0,
           CAST(floor((y1 - {Y0!r}) / {s!r}) AS BIGINT) AS iy1
    FROM pb
),
ex AS (
    SELECT *, UNNEST(generate_series(ix0, ix1)) AS tix FROM rng
),
cells AS (
    SELECT *, UNNEST(generate_series(iy0, iy1)) AS tiy FROM ex
)
SELECT tiy * {n} + tix AS cell,
       CAST(COUNT(*) AS BIGINT) AS n_parcels,
       SUM((LEAST(x1, {X0!r} + tix * {s!r} + {s!r}) - GREATEST(x0, {X0!r} + tix * {s!r}))
         * (LEAST(y1, {Y0!r} + tiy * {s!r} + {s!r}) - GREATEST(y0, {Y0!r} + tiy * {s!r})))
           AS covered_area_m2
FROM cells GROUP BY 1 ORDER BY 1
"""


def events_moving_sum_sql() -> str:
    from .queries import MOVING_WINDOW_ROWS

    return f"""
SELECT event_id,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN {MOVING_WINDOW_ROWS - 1} PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS w3_cents
FROM events
"""


def media_dedup_report_sql() -> str:
    """Content identity needs no SQL-replicable hash: DISTINCT text per
    type replicates the 128-bit-hash dedup exactly (md5 collisions are
    out of model on both sides)."""
    return """
WITH m AS (
    SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
               AS media_type,
           text,
           CAST(octet_length(encode(text)) AS BIGINT) AS nb
    FROM documents
),
u AS (SELECT media_type, text, MAX(nb) AS nb FROM m GROUP BY 1, 2)
SELECT m.media_type,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM u WHERE u.media_type = m.media_type)
           AS n_unique,
       CAST(SUM(m.nb) AS BIGINT) AS total_bytes,
       (SELECT CAST(SUM(u.nb) AS BIGINT) FROM u WHERE u.media_type = m.media_type)
           AS unique_bytes
FROM m GROUP BY 1 ORDER BY 1
"""


def orders_skyline_sql() -> str:
    """Pareto frontier via NOT EXISTS dominator; day bucketing matches
    the engine's epoch_us // 86_400e6 integer day."""
    return """
WITH pts AS (
    SELECT o_orderkey,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents,
           CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day_num
    FROM orders
)
SELECT a.o_orderkey, a.price_cents, a.day_num
FROM pts a
WHERE NOT EXISTS (
    SELECT 1 FROM pts b
    WHERE b.price_cents >= a.price_cents AND b.day_num >= a.day_num
      AND (b.price_cents > a.price_cents OR b.day_num > a.day_num)
)
ORDER BY a.o_orderkey
"""


def snap_points_to_roads_sql() -> str:
    """Same integer rational distance, same float64 comparator (every
    in-radius d2_num < 2^53, so the double division is exact on both
    sides), same seg_id tie-break."""
    from .queries import SNAP_RADIUS_M
    from .sources.synthetic import road_segments_values_sql

    r2 = SNAP_RADIUS_M * SNAP_RADIUS_M
    return f"""
WITH {address_points_values_sql('ap')},
{road_segments_values_sql('segs')},
{_anchored_points_cte()},
c AS (
    SELECT q.query_id, s.seg_id, s.len2,
           CAST(q.qx - s.ax AS BIGINT) AS dxa, CAST(q.qy - s.ay AS BIGINT) AS dya,
           CAST(q.qx - s.bx AS BIGINT) AS dxb, CAST(q.qy - s.by AS BIGINT) AS dyb,
           CAST(s.bx - s.ax AS BIGINT) AS abx, CAST(s.by - s.ay AS BIGINT) AS aby
    FROM qpts q CROSS JOIN segs s
),
n AS (
    SELECT query_id, seg_id, len2,
           CASE WHEN dxa * abx + dya * aby <= 0
                    THEN (dxa * dxa + dya * dya) * len2
                WHEN dxa * abx + dya * aby >= len2
                    THEN (dxb * dxb + dyb * dyb) * len2
                ELSE (dxa * dxa + dya * dya) * len2
                     - (dxa * abx + dya * aby) * (dxa * abx + dya * aby)
           END AS d2_num
    FROM c
),
r AS (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY CAST(d2_num AS DOUBLE) / len2, seg_id
    ) AS rn
    FROM (SELECT DISTINCT * FROM n) WHERE d2_num <= CAST({r2} AS BIGINT) * len2
),
w AS (SELECT query_id, seg_id, d2_num, len2 FROM r WHERE rn = 1)
-- per-INPUT-ROW semantics: derived query_ids collide in the synthetic
-- lineitem, so winners join back to every input row
SELECT q.query_id, w.seg_id, w.d2_num, w.len2
FROM qpts q JOIN w ON w.query_id = q.query_id
"""


def user_event_gini_sql() -> str:
    return """
WITH c AS (
    SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
)
SELECT user_id,
       CAST(SUM(c) AS BIGINT) AS n_events,
       CAST(SUM(c) * SUM(c) - SUM(c * c) AS BIGINT) AS gini_num
FROM c GROUP BY 1
"""


def q7_volume_shipping_sql() -> str:
    """TPC-H-Q7-shaped cross-border volume; identical cents quantization
    and calendar-year extraction to queries.q7_volume_shipping."""
    return """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
WHERE c.c_nationkey <> s.s_nationkey
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def q8_market_share_sql() -> str:
    """TPC-H-Q8-shaped market share with the engine's exact rational
    share_ppm = target*1000000 // total (both positive -> trunc == floor)."""
    from .queries import Q8_PART_TYPE, Q8_REGION_KEY, Q8_TARGET_NATION

    return f"""
WITH r AS (
    SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT) AS cents,
           s.s_nationkey
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN part p     ON p.p_partkey = l.l_partkey
    WHERE cn.n_regionkey = {Q8_REGION_KEY} AND p.p_type = '{Q8_PART_TYPE}'
)
SELECT o_year,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST(SUM(CASE WHEN s_nationkey = {Q8_TARGET_NATION} THEN cents ELSE 0 END) AS BIGINT)
           AS target_cents,
       CAST(SUM(CASE WHEN s_nationkey = {Q8_TARGET_NATION} THEN cents ELSE 0 END)
            * 1000000 // SUM(cents) AS BIGINT) AS share_ppm
FROM r GROUP BY 1 ORDER BY 1
"""


def q9_product_profit_sql() -> str:
    """TPC-H-Q9-shaped profit (unit cost = p_retailprice; no partsupp in
    the synthetic schema); qty_centi*retail_cents//100 is positive ->
    DuckDB trunc == floor, matching the engine."""
    from .queries import Q9_NAME_SUBSTR

    return f"""
SELECT n.n_name,
       CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)
                - CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT)
                  * CAST(floor(p.p_retailprice * 100 + 0.5) AS BIGINT) // 100)
            AS BIGINT) AS profit_cents
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%{Q9_NAME_SUBSTR}%'
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q15_top_supplier_sql() -> str:
    """TPC-H-Q15-shaped top supplier(s) by exact integer cents, ties kept."""
    return """
WITH r AS (
    SELECT l_suppkey,
           CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                         AS BIGINT)) AS BIGINT) AS total_revenue_cents
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, r.total_revenue_cents
FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue_cents = (SELECT MAX(total_revenue_cents) FROM r)
ORDER BY 1
"""


def q17_small_quantity_sql() -> str:
    """TPC-H-Q17-shaped: the exact cross-multiplied 20%%-of-average
    predicate 5*qty_centi*cnt < sum_qty_centi, per part of the brand."""
    from .queries import Q17_BRAND

    return f"""
WITH l AS (
    SELECT l.l_partkey,
           CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT) AS qc,
           CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS pc
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = '{Q17_BRAND}'
), s AS (
    SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(qc) AS BIGINT) AS sq
    FROM l GROUP BY 1
)
SELECT CAST(COALESCE(SUM(l.pc), 0) AS BIGINT) AS total_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(COALESCE(SUM(l.pc), 0) // 7 AS BIGINT) AS avg_yearly_cents
FROM l JOIN s USING (l_partkey)
WHERE l.qc * 5 * s.cnt < s.sq
"""


def basket_brand_pairs_sql() -> str:
    """Market-basket pair support + directed confidences; the engine's
    'Brand#' || code reconstruction round-trips exactly because codes are
    parsed from these same strings."""
    return """
WITH ob AS (
    SELECT DISTINCT l.l_orderkey, p.p_brand
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
), bs AS (
    SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n FROM ob GROUP BY 1
), pairs AS (
    SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, CAST(COUNT(*) AS BIGINT) AS pair_support
    FROM ob a JOIN ob b
      ON a.l_orderkey = b.l_orderkey
     AND CAST(substr(a.p_brand, 7) AS BIGINT) < CAST(substr(b.p_brand, 7) AS BIGINT)
    GROUP BY 1, 2
)
SELECT p.brand_a, p.brand_b, p.pair_support,
       CAST(p.pair_support * 1000000 // sa.n AS BIGINT) AS conf_ab_ppm,
       CAST(p.pair_support * 1000000 // sb.n AS BIGINT) AS conf_ba_ppm
FROM pairs p
JOIN bs sa ON sa.p_brand = p.brand_a
JOIN bs sb ON sb.p_brand = p.brand_b
ORDER BY 1, 2
"""


def orders_record_highs_sql() -> str:
    """Strict running-max records per customer; (o_orderdate, o_orderkey)
    is a total order (orderkey unique) so the window is deterministic."""
    return """
WITH t AS (
    SELECT o_orderkey, o_custkey,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
           MAX(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS prior_max
    FROM orders
)
SELECT o_orderkey, o_custkey, cents AS price_cents
FROM t WHERE prior_max IS NULL OR cents > prior_max
"""


def events_value_trend_slope_sql() -> str:
    """Exact integer rational per-user trend slope; x offsets to the
    user's first event so n*Sxx stays under 2^63 (engine invariant)."""
    return """
WITH e AS (
    SELECT user_id,
           (epoch_us(ts) - MIN(epoch_us(ts)) OVER (PARTITION BY user_id)) // 1000000 AS x,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
    FROM events
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS BIGINT) AS slope_num,
       CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS BIGINT) AS slope_den
FROM e GROUP BY 1
"""


def orders_equidepth_bins_sql() -> str:
    """NTILE-equivalent equi-depth bins: per-bin MAX and count are
    deterministic regardless of tie placement (the sorted multiset is
    unique even when the ORDER BY has duplicate keys)."""
    from .queries import EQUIDEPTH_K

    return f"""
WITH t AS (
    SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
           NTILE({EQUIDEPTH_K}) OVER (ORDER BY floor(o_totalprice * 100 + 0.5)) AS bin
    FROM orders
)
SELECT CAST(bin AS BIGINT) AS bin, CAST(MAX(cents) AS BIGINT) AS upper_cents,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM t GROUP BY 1 ORDER BY 1
"""


def nation_point_diameter_sql() -> str:
    """O(n^2) self-join ground truth for the hull-reduced diameter (the
    engine never materializes all pairs; the oracle may at sf scale)."""
    from .queries import BBOX_MULT_X, BBOX_MULT_Y

    return f"""
WITH p AS (
    SELECT CAST(c_nationkey AS BIGINT) AS n_nationkey,
           CAST((c_custkey * {BBOX_MULT_X}) % 4096 AS BIGINT) AS ix,
           CAST((c_custkey * {BBOX_MULT_Y}) % 4096 AS BIGINT) AS iy
    FROM customer
)
SELECT a.n_nationkey,
       CAST(COUNT(DISTINCT a.rid) AS BIGINT) AS n_customers,
       CAST(MAX((a.ix - b.ix) * (a.ix - b.ix) + (a.iy - b.iy) * (a.iy - b.iy)) AS BIGINT)
           AS diameter_sq
FROM (SELECT *, ROW_NUMBER() OVER () AS rid FROM p) a
JOIN p b USING (n_nationkey)
GROUP BY 1 ORDER BY 1
"""


def part_min_cost_supplier_sql() -> str:
    """Argmin supplier per shipped part, tie -> smallest suppkey; cents
    quantization floor(x*100+0.5) is negative-safe (floor both sides)."""
    return """
WITH ps AS (
    SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
), c AS (
    SELECT ps.l_partkey, ps.l_suppkey,
           CAST(floor(s.s_acctbal * 100 + 0.5) AS BIGINT) AS bal
    FROM ps JOIN supplier s ON s.s_suppkey = ps.l_suppkey
)
SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey, bal AS bal_cents
FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY l_partkey ORDER BY bal, l_suppkey) AS rn
    FROM c
) WHERE rn = 1
"""


def embedding_covariance_sql() -> str:
    """Exact integer Gram matrix over QUANT-quantized embeddings
    (1-based dims via generate_subscripts, i <= j upper triangle)."""
    from .stages.ann import QUANT

    q = f"CAST(floor(CAST(e AS DOUBLE) * {QUANT!r} + 0.5) AS BIGINT)"
    return f"""
WITH q AS (
    SELECT vec_id, CAST(i AS BIGINT) AS i, {q} AS qv
    FROM (
        SELECT vec_id, unnest(embedding) AS e, generate_subscripts(embedding, 1) AS i
        FROM embeddings
    )
)
SELECT a.i AS i, b.i AS j, CAST(SUM(a.qv * b.qv) AS BIGINT) AS dot_sum
FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
GROUP BY 1, 2 ORDER BY 1, 2
"""


def orders_daily_open_count_sql() -> str:
    """Dense per-day open-interval counts; the oracle pays the
    O(orders x window) inequality join the engine's difference array
    avoids.  Day numbering = epoch_us // 86400e6 (dates are midnight)."""
    from .queries import OPEN_WINDOW_DAYS

    return f"""
WITH o AS (
    SELECT epoch_us(o_orderdate) // 86400000000 AS d FROM orders
), days AS (
    SELECT UNNEST(generate_series((SELECT MIN(d) FROM o),
                                  (SELECT MAX(d) FROM o) + {OPEN_WINDOW_DAYS} - 1)) AS day_num
)
SELECT CAST(day_num AS BIGINT) AS day_num,
       CAST(COUNT(o.d) AS BIGINT) AS open_count
FROM days LEFT JOIN o ON o.d <= day_num AND day_num < o.d + {OPEN_WINDOW_DAYS}
GROUP BY 1 ORDER BY 1
"""


def order_brand_list_sql() -> str:
    """Per-order distinct brand list sorted by numeric code; dedup in a
    CTE because string_agg(DISTINCT ... ORDER BY ...) is restricted."""
    return """
WITH ob AS (
    SELECT DISTINCT l.l_orderkey, p.p_brand,
           CAST(substr(p.p_brand, 7) AS BIGINT) AS code
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
)
SELECT l_orderkey AS o_orderkey,
       CAST(COUNT(*) AS BIGINT) AS n_brands,
       string_agg(p_brand, ',' ORDER BY code) AS brands_csv
FROM ob GROUP BY 1
"""


def nation_trade_balance_sql() -> str:
    """Unordered-pair trade matrix with exact per-direction sums and the
    anti-symmetric balance; identical cents quantization to the engine."""
    return """
WITH f AS (
    SELECT s.s_nationkey AS s_nat, c.c_nationkey AS c_nat,
           CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT) AS cents
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE c.c_nationkey <> s.s_nationkey
), g AS (
    SELECT LEAST(s_nat, c_nat) AS lo, GREATEST(s_nat, c_nat) AS hi,
           CAST(SUM(CASE WHEN s_nat < c_nat THEN cents ELSE 0 END) AS BIGINT) AS rev_ab_cents,
           CAST(SUM(CASE WHEN s_nat > c_nat THEN cents ELSE 0 END) AS BIGINT) AS rev_ba_cents
    FROM f GROUP BY 1, 2
)
SELECT na.n_name AS nation_a, nb.n_name AS nation_b,
       g.rev_ab_cents, g.rev_ba_cents,
       CAST(g.rev_ab_cents - g.rev_ba_cents AS BIGINT) AS balance_cents
FROM g JOIN nation na ON na.n_nationkey = g.lo
       JOIN nation nb ON nb.n_nationkey = g.hi
ORDER BY 1, 2
"""


def custkey_prefix_rollup_sql() -> str:
    """Prefix-tree rollup via an explicit (level, divisor) values list
    (10^k as exact integers, no float power); custkey positive ->
    // is floor in both engines."""
    from .queries import PREFIX_LEVELS

    values = ", ".join(f"({k}, {10**k})" for k in range(PREFIX_LEVELS))
    return f"""
WITH lv(level, div) AS (VALUES {values})
SELECT CAST(lv.level AS BIGINT) AS level,
       CAST(c.c_custkey // lv.div AS BIGINT) AS prefix,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS bal_cents
FROM customer c CROSS JOIN lv
GROUP BY 1, 2
"""


def orders_winsorized_total_sql() -> str:
    """Rank-selected 1% winsorization bounds + clamped sum (k-th order
    statistics via ORDER BY ... OFFSET, fully deterministic on cents)."""
    return """
WITH t AS (
    SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c FROM orders
), p AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n, GREATEST(COUNT(*) // 100, 1) AS k FROM t
), lo AS (
    SELECT c FROM t ORDER BY c LIMIT 1 OFFSET (SELECT k - 1 FROM p)
), hi AS (
    SELECT c FROM t ORDER BY c DESC LIMIT 1 OFFSET (SELECT k - 1 FROM p)
)
SELECT (SELECT n FROM p) AS n,
       (SELECT c FROM lo) AS lo_cents,
       (SELECT c FROM hi) AS hi_cents,
       CAST(SUM(LEAST(GREATEST(t.c, (SELECT c FROM lo)), (SELECT c FROM hi))) AS BIGINT)
           AS winsorized_sum_cents
FROM t
"""


def orders_price_minmax_scaled_sql() -> str:
    """Per-priority min-max scaling to ppm; numerator >= 0 so DuckDB //
    (trunc) == floor == the engine."""
    return """
WITH t AS (
    SELECT o_orderkey, o_orderpriority,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c,
           MIN(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
               OVER (PARTITION BY o_orderpriority) AS mn,
           MAX(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
               OVER (PARTITION BY o_orderpriority) AS mx
    FROM orders
)
SELECT o_orderkey, o_orderpriority, c AS price_cents,
       CAST(CASE WHEN mx = mn THEN 0 ELSE (c - mn) * 1000000 // (mx - mn) END AS BIGINT)
           AS scaled_ppm
FROM t
"""


def zorder_encode_lineitem_sql() -> str:
    """Morton interleave as an explicit per-bit sum, generated from the
    same ZORDER_BITS constant as the engine kernel."""
    from .queries import ZORDER_BITS

    terms = " + ".join(
        f"((ix // {1 << b}) % 2) * {1 << (2 * b)} + ((iy // {1 << b}) % 2) * {1 << (2 * b + 1)}"
        for b in range(ZORDER_BITS)
    )
    return f"""
WITH p AS (
    SELECT l_orderkey * 10 + l_linenumber AS query_id,
           (l_orderkey * 131 + l_linenumber * 17) % 4096 AS ix,
           (l_orderkey * 241 + l_partkey * 13) % 4096 AS iy
    FROM lineitem
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST({terms} AS BIGINT) AS zcode
FROM p
"""


def embedding_dim_stats_sql() -> str:
    """Per-dimension quantized stats; unnest and generate_subscripts must
    sit in the SAME select list to zip element-wise (split across levels
    they cross-product)."""
    from .stages.ann import QUANT

    q = f"CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {QUANT!r} + 0.5) AS BIGINT)"
    return f"""
SELECT CAST(i AS BIGINT) AS i,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(qv) AS BIGINT) AS qsum,
       CAST(MIN(qv) AS BIGINT) AS qmin,
       CAST(MAX(qv) AS BIGINT) AS qmax
FROM (
    SELECT generate_subscripts(embedding, 1) AS i, {q} AS qv
    FROM embeddings
)
GROUP BY 1 ORDER BY 1
"""


def orders_daily_autocorr_sql() -> str:
    """Dense zero-filled daily series; exact integer lag components via a
    self-join on the generated day range."""
    from .queries import AUTOCORR_MAX_LAG

    return f"""
WITH o AS (
    SELECT epoch_us(o_orderdate) // 86400000000 AS day, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY 1
), days AS (
    SELECT UNNEST(generate_series((SELECT MIN(day) FROM o), (SELECT MAX(day) FROM o))) AS day
), dense AS (
    SELECT d.day, COALESCE(o.n, 0) AS n FROM days d LEFT JOIN o USING (day)
), lags AS (
    SELECT UNNEST(generate_series(1, {AUTOCORR_MAX_LAG})) AS lag
)
SELECT CAST(l.lag AS BIGINT) AS lag,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(a.n * b.n) AS BIGINT) AS dot,
       CAST(SUM(a.n) AS BIGINT) AS sum_a,
       CAST(SUM(b.n) AS BIGINT) AS sum_b,
       CAST(SUM(a.n * a.n) AS BIGINT) AS sumsq_a,
       CAST(SUM(b.n * b.n) AS BIGINT) AS sumsq_b
FROM lags l
JOIN dense a ON TRUE
JOIN dense b ON b.day = a.day + l.lag
GROUP BY 1 ORDER BY 1
"""


def lineitem_price_mad_sql() -> str:
    """Lower-median MAD per return flag via two ROW_NUMBER rank picks —
    the same (n+1)//2 rank rule as the engine."""
    return """
WITH t AS (
    SELECT l_returnflag AS f,
           CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
    FROM lineitem
), m AS (
    SELECT f, c,
           ROW_NUMBER() OVER (PARTITION BY f ORDER BY c) AS rn,
           COUNT(*) OVER (PARTITION BY f) AS n
    FROM t
), med AS (
    SELECT f, c AS median_cents, CAST(n AS BIGINT) AS n FROM m WHERE rn = (n + 1) // 2
), d AS (
    SELECT t.f, ABS(t.c - med.median_cents) AS dc FROM t JOIN med USING (f)
), m2 AS (
    SELECT f, dc,
           ROW_NUMBER() OVER (PARTITION BY f ORDER BY dc) AS rn,
           COUNT(*) OVER (PARTITION BY f) AS n
    FROM d
)
SELECT med.f AS l_returnflag, med.n, med.median_cents, m2.dc AS mad_cents
FROM m2 JOIN med USING (f) WHERE m2.rn = (m2.n + 1) // 2
ORDER BY 1
"""


def supplier_clustering_coeff_sql() -> str:
    """Per-node degree + triangle count over the SAME thresholded edge
    set as supplier_triangles; zero-triangle nodes kept via LEFT JOIN."""
    return """
WITH p AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
w AS (
    SELECT a.l_suppkey AS sa, b.l_suppkey AS sb, CAST(COUNT(*) AS BIGINT) AS wt
    FROM p a JOIN p b ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    GROUP BY 1, 2
),
tot AS (SELECT COUNT(*) AS n FROM w),
c AS (SELECT wt, COUNT(*) AS cnt FROM w GROUP BY 1),
cum AS (SELECT wt, SUM(cnt) OVER (ORDER BY wt) AS cum FROM c),
thr AS (SELECT MIN(wt) AS v FROM cum, tot WHERE cum >= (500 * n + 999) // 1000),
e AS (SELECT sa, sb FROM w, thr WHERE w.wt > thr.v),
u AS (SELECT sa AS s, sb AS t FROM e UNION ALL SELECT sb, sa FROM e),
deg AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS deg FROM u GROUP BY 1),
tri AS (
    SELECT u1.s AS s, CAST(COUNT(*) AS BIGINT) AS n_tri
    FROM u u1 JOIN u u2 ON u1.s = u2.s AND u1.t < u2.t
    JOIN e ON e.sa = u1.t AND e.sb = u2.t
    GROUP BY 1
)
SELECT deg.s AS s_suppkey, deg.deg, CAST(COALESCE(tri.n_tri, 0) AS BIGINT) AS n_tri
FROM deg LEFT JOIN tri USING (s)
ORDER BY 1
"""


def split_leakage_pairs_sql() -> str:
    """Near-dup pairs x split labels; the split CASE is the same
    multiplicative-hash rule as split_assignment_sql."""
    case = (
        "CASE WHEN (({col} * 2654435761) % 4294967296) % 100 < 80 THEN 'train' "
        "WHEN (({col} * 2654435761) % 4294967296) % 100 < 90 THEN 'val' "
        "ELSE 'test' END"
    )
    return f"""
WITH pairs AS ({minhash_dup_pairs_sql()})
SELECT {case.format(col='doc_a')} AS split_a,
       {case.format(col='doc_b')} AS split_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pairs GROUP BY 1, 2 ORDER BY 1, 2
"""


def dedup_cluster_size_histogram_sql() -> str:
    """Cluster-size histogram over the recursive-CTE component labels."""
    return f"""
WITH labels AS ({dedup_clusters_sql()}),
sizes AS (
    SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
    FROM labels GROUP BY 1
)
SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
FROM sizes GROUP BY 1 ORDER BY 1
"""


def prefix_count_share_sql() -> str:
    """Percent-of-parent over the prefix rollup (root level excluded);
    counts positive -> // is floor in both engines."""
    from .queries import PREFIX_LEVELS

    values = ", ".join(f"({k}, {10**k})" for k in range(PREFIX_LEVELS))
    return f"""
WITH lv(level, div) AS (VALUES {values}),
r AS (
    SELECT lv.level, c.c_custkey // lv.div AS prefix, CAST(COUNT(*) AS BIGINT) AS n
    FROM customer c CROSS JOIN lv
    GROUP BY 1, 2
)
SELECT CAST(ch.level AS BIGINT) AS level,
       CAST(ch.prefix AS BIGINT) AS prefix,
       ch.n,
       pa.n AS parent_n,
       CAST(ch.n * 1000000 // pa.n AS BIGINT) AS share_ppm
FROM r ch JOIN r pa
  ON pa.level = ch.level + 1 AND pa.prefix = ch.prefix // 10
WHERE ch.level < {PREFIX_LEVELS - 1}
"""


def events_value_percentrank_by_type_sql() -> str:
    """Per-type RANK (ties = min) + partition size — the exact integer
    components of percent_rank."""
    return """
SELECT event_id, event_type,
       CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents,
       CAST(RANK() OVER (PARTITION BY event_type
                         ORDER BY CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rnk,
       CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_type
FROM events
"""


def session_stats_sql() -> str:
    """Per-session gaps-and-islands: LAG gap > 30 min starts a session;
    session_idx is the 0-based per-user running count."""
    from .queries import SESSION_GAP_US

    return f"""
WITH e AS (
    SELECT user_id, epoch_us(ts) AS t,
           CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts) > {SESSION_GAP_US}
                THEN 1 ELSE 0 END AS brk
    FROM events
), s AS (
    SELECT user_id, t,
           SUM(brk) OVER (PARTITION BY user_id ORDER BY t
                          ROWS UNBOUNDED PRECEDING) AS session_idx
    FROM e
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(t) - MIN(t) AS BIGINT) AS duration_us
FROM s GROUP BY 1, 2
"""


def radius_pair_distance_histogram_sql() -> str:
    """floor(d2/125^2) ring histogram over the within-radius pair set;
    d2 is bit-identical in both engines, so floor matches exactly."""
    from .queries import LATTICE_D2_DIV

    return f"""
WITH pairs AS ({points_within_radius_sql()})
SELECT CAST(floor(d2 / {LATTICE_D2_DIV!r}) AS BIGINT) AS ring_d2,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pairs GROUP BY 1 ORDER BY 1
"""


def docs_with_all_tokens_sql() -> str:
    """Inverted-index AND: docs containing every query token."""
    from .functions.text import WS_SPLIT_PATTERN
    from .queries import BOOL_QUERY_TOKENS

    toks = ", ".join(f"'{t}'" for t in BOOL_QUERY_TOKENS)
    return f"""
WITH toks AS (
    SELECT doc_id,
           unnest(list_filter(regexp_split_to_array(lower(text), '{WS_SPLIT_PATTERN}'),
                              x -> x <> '')) AS t
    FROM documents
)
SELECT doc_id FROM toks
WHERE t IN ({toks})
GROUP BY 1 HAVING COUNT(DISTINCT t) = {len(BOOL_QUERY_TOKENS)}
"""


def tile_choropleth_classes_sql() -> str:
    """Quantile classing against equi-depth boundaries computed with the
    same (tot//K)*i + LEAST(i, tot%K) cumulative-rank rule; class =
    1 + #boundaries strictly below the value (tie-deterministic)."""
    from .queries import CHORO_CLASSES

    ks = ", ".join(f"({i})" for i in range(1, CHORO_CLASSES))
    return f"""
WITH tc AS ({tile_counts_sql()}),
ord AS (
    SELECT n, ROW_NUMBER() OVER (ORDER BY n) AS rn, COUNT(*) OVER () AS tot FROM tc
),
ks(i) AS (VALUES {ks}),
bounds AS (
    SELECT o.n AS ub
    FROM ks JOIN ord o
      ON o.rn = (o.tot // {CHORO_CLASSES}) * ks.i + LEAST(ks.i, o.tot % {CHORO_CLASSES})
)
SELECT tc.tile_x, tc.tile_y, tc.n,
       CAST(1 + (SELECT COUNT(*) FROM bounds b WHERE b.ub < tc.n) AS BIGINT) AS cls
FROM tc
"""


def user_burst_peak_sql() -> str:
    """Max 5-minute anchored-window event count per user (self-join count
    per anchor, MAX per user) — the engine's two-pointer sweep, paid
    quadratically."""
    from .queries import BURST_WINDOW_US

    return f"""
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t FROM events),
c AS (
    SELECT a.user_id, a.event_id, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM e a JOIN e b
      ON a.user_id = b.user_id AND b.t >= a.t AND b.t < a.t + {BURST_WINDOW_US}
    GROUP BY 1, 2
)
SELECT user_id, CAST(MAX(cnt) AS BIGINT) AS peak_5min FROM c GROUP BY 1
"""


def documents_ipc_roundtrip_sql() -> str:
    """Roundtrip identity: the same order-independent checksum over the
    ORIGINAL documents table."""
    from .queries import CHECKSUM_K, CHECKSUM_M

    return f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(((doc_id % {CHECKSUM_M}) * {CHECKSUM_K}
                 + length(text) % {CHECKSUM_M}) % {CHECKSUM_M}) AS BIGINT) AS checksum
FROM documents
"""


def tile_quadkey_lineitem_sql() -> str:
    """Quadkey strings: per-bit digit concatenation from the same
    DEFAULT_ZOOM constant and tile expressions as the engine."""
    from .functions.tiles import DEFAULT_ZOOM, tile_assign_sql

    tx, ty = tile_assign_sql("qx", "qy")
    digits = " || ".join(
        f"CAST(((tx // {1 << b}) % 2) + 2 * ((ty // {1 << b}) % 2) AS VARCHAR)"
        for b in range(DEFAULT_ZOOM - 1, -1, -1)
    )
    return (
        "WITH qpts AS (" + _uniform_points_select() + "), "
        f"t AS (SELECT query_id, {tx} AS tx, {ty} AS ty FROM qpts) "
        f"SELECT query_id, {digits} AS quadkey FROM t"
    )


def partkey_f2_moment_sql() -> str:
    """F0/F1/F2 of the partkey stream; F2 == exact self-join size."""
    return """
WITH c AS (
    SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n FROM lineitem GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(SUM(n * n) AS BIGINT) AS selfjoin_pairs
FROM c
"""


def orders_benford_digits_sql() -> str:
    """Leading decimal digit via substr of the integer string — exact."""
    return """
SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR), 1, 1)
            AS BIGINT) AS digit,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY 1 ORDER BY 1
"""


def customer_revenue_pareto_sql() -> str:
    """Smallest prefix of (revenue DESC, custkey ASC)-ordered customers
    reaching >= 80% of total revenue, cross-multiplied."""
    from .queries import PARETO_DEN, PARETO_NUM

    return f"""
WITH r AS (
    SELECT o_custkey,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY 1
), o AS (
    SELECT cents,
           SUM(cents) OVER (ORDER BY cents DESC, o_custkey ASC
                            ROWS UNBOUNDED PRECEDING) AS cum,
           ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey ASC) AS rn,
           SUM(cents) OVER () AS total,
           COUNT(*) OVER () AS n
    FROM r
), hit AS (
    SELECT MIN(rn) AS k FROM o WHERE cum * {PARETO_DEN} >= total * {PARETO_NUM}
)
SELECT CAST((SELECT k FROM hit) AS BIGINT) AS n_customers_80,
       CAST((SELECT MAX(n) FROM o) AS BIGINT) AS n_customers,
       CAST((SELECT MAX(total) FROM o) AS BIGINT) AS total_cents,
       CAST((SELECT cum FROM o, hit WHERE o.rn = hit.k) AS BIGINT) AS top_cents
"""


def doc_top_tokens_sql() -> str:
    """Per-doc top-k tokens (count DESC, token ASC) comma-joined."""
    from .functions.text import WS_SPLIT_PATTERN
    from .queries import DOC_TOP_K

    return f"""
WITH toks AS (
    SELECT doc_id,
           unnest(list_filter(regexp_split_to_array(lower(text), '{WS_SPLIT_PATTERN}'),
                              x -> x <> '')) AS t
    FROM documents
), c AS (
    SELECT doc_id, t, COUNT(*) AS n FROM toks GROUP BY 1, 2
), r AS (
    SELECT doc_id, t,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n DESC, t ASC) AS rn
    FROM c
), agg AS (
    SELECT doc_id, string_agg(t, ',' ORDER BY rn) AS top_tokens
    FROM r WHERE rn <= {DOC_TOP_K} GROUP BY 1
)
SELECT d.doc_id, COALESCE(agg.top_tokens, '') AS top_tokens
FROM documents d LEFT JOIN agg USING (doc_id)
"""


def segment_nation_contingency_sql() -> str:
    """Contingency cells with row/column/grand totals (exact chi-square
    components)."""
    return """
WITH cells AS (
    SELECT c_mktsegment, CAST(c_nationkey AS BIGINT) AS n_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_cell
    FROM customer GROUP BY 1, 2
)
SELECT c_mktsegment, n_nationkey, n_cell,
       CAST(SUM(n_cell) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS n_segment,
       CAST(SUM(n_cell) OVER (PARTITION BY n_nationkey) AS BIGINT) AS n_nation,
       CAST(SUM(n_cell) OVER () AS BIGINT) AS n_total
FROM cells ORDER BY 1, 2
"""


def parts_discovery_curve_sql() -> str:
    """First-seen week per part -> dense weekly new/cumulative counts."""
    return """
WITH f AS (
    SELECT l_partkey, MIN(epoch_us(l_shipdate) // 604800000000) AS w
    FROM lineitem GROUP BY 1
), per AS (
    SELECT w, CAST(COUNT(*) AS BIGINT) AS new_parts FROM f GROUP BY 1
), weeks AS (
    SELECT UNNEST(generate_series((SELECT MIN(w) FROM per), (SELECT MAX(w) FROM per))) AS week
)
SELECT CAST(weeks.week AS BIGINT) AS week,
       CAST(COALESCE(per.new_parts, 0) AS BIGINT) AS new_parts,
       CAST(SUM(COALESCE(per.new_parts, 0)) OVER (ORDER BY weeks.week
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_parts
FROM weeks LEFT JOIN per ON per.w = weeks.week
ORDER BY 1
"""


def events_hour_weekday_heatmap_sql() -> str:
    """(weekday, hour) heatmap from raw epoch integer arithmetic."""
    return """
SELECT CAST((epoch_us(ts) // 86400000000 + 4) % 7 AS BIGINT) AS dow,
       CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


def events_ohlc_6h_sql() -> str:
    """OHLC per 6-hour bin; open/close via ROW_NUMBER over the total
    (ts, event_id) order."""
    from .queries import OHLC_BIN_US

    return f"""
WITH e AS (
    SELECT epoch_us(ts) // {OHLC_BIN_US} AS bin, epoch_us(ts) AS t, event_id,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
    FROM events
), r AS (
    SELECT *,
           ROW_NUMBER() OVER (PARTITION BY bin ORDER BY t, event_id) AS rf,
           ROW_NUMBER() OVER (PARTITION BY bin ORDER BY t DESC, event_id DESC) AS rl
    FROM e
)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(MAX(CASE WHEN rf = 1 THEN v END) AS BIGINT) AS open_cents,
       CAST(MAX(v) AS BIGINT) AS high_cents,
       CAST(MIN(v) AS BIGINT) AS low_cents,
       CAST(MAX(CASE WHEN rl = 1 THEN v END) AS BIGINT) AS close_cents,
       CAST(COUNT(*) AS BIGINT) AS n
FROM r GROUP BY 1 ORDER BY 1
"""


def supplier_portfolio_jaccard_sql() -> str:
    """Exact portfolio Jaccard per supplier pair sharing >= 1 part."""
    return """
WITH inc AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
sz AS (SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS sz FROM inc GROUP BY 1),
p AS (
    SELECT a.l_suppkey AS sa, b.l_suppkey AS sb, CAST(COUNT(*) AS BIGINT) AS inter
    FROM inc a JOIN inc b ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
    GROUP BY 1, 2
)
SELECT p.sa, p.sb, p.inter,
       CAST(za.sz + zb.sz - p.inter AS BIGINT) AS n_union,
       CAST(p.inter * 1000 // (za.sz + zb.sz - p.inter) AS BIGINT) AS jac_permille
FROM p JOIN sz za ON za.l_suppkey = p.sa
       JOIN sz zb ON zb.l_suppkey = p.sb
ORDER BY 1, 2
"""


def orders_price_drift_deciles_sql() -> str:
    """Early/late decile boundaries + signed shift; identical rank rule."""
    from .queries import DRIFT_DECILES

    ks = ", ".join(f"({i})" for i in range(1, DRIFT_DECILES + 1))
    half = """
    SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS rn, COUNT(*) OVER () AS tot
    FROM (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
          FROM orders WHERE o_orderdate {op} TIMESTAMP '1998-01-01')
"""
    return f"""
WITH ks(i) AS (VALUES {ks}),
e AS ({half.format(op='<')}),
l AS ({half.format(op='>=')}),
be AS (
    SELECT ks.i, e.c FROM ks JOIN e
      ON e.rn = (e.tot // {DRIFT_DECILES}) * ks.i + LEAST(ks.i, e.tot % {DRIFT_DECILES})
),
bl AS (
    SELECT ks.i, l.c FROM ks JOIN l
      ON l.rn = (l.tot // {DRIFT_DECILES}) * ks.i + LEAST(ks.i, l.tot % {DRIFT_DECILES})
)
SELECT CAST(be.i AS BIGINT) AS decile,
       be.c AS bound_early, bl.c AS bound_late,
       CAST(bl.c - be.c AS BIGINT) AS shift_cents
FROM be JOIN bl USING (i) ORDER BY 1
"""


def road_segment_load_sql() -> str:
    """Per-segment snapped-point load over the map-matching output."""
    return f"""
WITH snapped AS ({snap_points_to_roads_sql()})
SELECT seg_id,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(SUM(d2_num) AS BIGINT) AS sum_d2_num,
       CAST(MIN(len2) AS BIGINT) AS len2
FROM snapped GROUP BY 1 ORDER BY 1
"""


def nation_revenue_hhi_sql() -> str:
    """HHI via HUGEINT arithmetic (SUM of BIGINT products), floor-exact."""
    return """
WITH r AS (
    SELECT o_custkey,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY 1
), n AS (
    SELECT CAST(c.c_nationkey AS BIGINT) AS n_nationkey, r.cents
    FROM r JOIN customer c ON c.c_custkey = r.o_custkey
)
SELECT n_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST(SUM(cents * cents) * 1000000 // (SUM(cents) * SUM(cents)) AS BIGINT) AS hhi_ppm
FROM n GROUP BY 1 ORDER BY 1
"""


def tile_anomalies_sql() -> str:
    """Child-vs-parent hotspot ratio over the exact halving rollup."""
    from .queries import ANOMALY_RATIO_PPM

    return f"""
WITH tc AS ({tile_counts_sql()}),
p AS (
    SELECT tile_x // 2 AS px, tile_y // 2 AS py, CAST(SUM(n) AS BIGINT) AS parent_n
    FROM tc GROUP BY 1, 2
)
SELECT tc.tile_x, tc.tile_y, tc.n, p.parent_n,
       CAST(tc.n * 4 * 1000000 // p.parent_n AS BIGINT) AS ratio_ppm
FROM tc JOIN p ON p.px = tc.tile_x // 2 AND p.py = tc.tile_y // 2
WHERE tc.n * 4 * 1000000 // p.parent_n >= {ANOMALY_RATIO_PPM}
ORDER BY 1, 2
"""


def supplier_kcore_sql() -> str:
    """Unrolled simultaneous-peel k-core (KCORE_ROUNDS rounds, the
    PageRank unrolled-CTE discipline — the engine asserts it converges
    within the same round budget): e_{i+1} keeps edges whose BOTH
    endpoints have degree >= k in e_i.  Every per-round CTE is
    MATERIALIZED — each round references the previous THREE times, so
    un-materialized CTE inlining re-expands the base lineitem self-join
    3^rounds times (measured: fd exhaustion at rounds=6)."""
    from .queries import KCORE_K, KCORE_ROUNDS

    parts = [
        """
WITH p AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
w AS MATERIALIZED (
    SELECT a.l_suppkey AS sa, b.l_suppkey AS sb, CAST(COUNT(*) AS BIGINT) AS wt
    FROM p a JOIN p b ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    GROUP BY 1, 2
),
tot AS (SELECT COUNT(*) AS n FROM w),
c AS (SELECT wt, COUNT(*) AS cnt FROM w GROUP BY 1),
cum AS (SELECT wt, SUM(cnt) OVER (ORDER BY wt) AS cum FROM c),
thr AS (SELECT MIN(wt) AS v FROM cum, tot WHERE cum >= (500 * n + 999) // 1000),
e0 AS MATERIALIZED (SELECT sa, sb FROM w, thr WHERE w.wt > thr.v)"""
    ]
    for i in range(KCORE_ROUNDS):
        parts.append(f""",
d{i} AS MATERIALIZED (
    SELECT s, CAST(COUNT(*) AS BIGINT) AS deg
    FROM (SELECT sa AS s FROM e{i} UNION ALL SELECT sb FROM e{i})
    GROUP BY 1
),
ok{i} AS MATERIALIZED (SELECT s FROM d{i} WHERE deg >= {KCORE_K}),
e{i + 1} AS MATERIALIZED (
    SELECT e.sa, e.sb FROM e{i} e
    JOIN ok{i} a ON a.s = e.sa
    JOIN ok{i} b ON b.s = e.sb
)""")
    last = KCORE_ROUNDS
    parts.append(f"""
SELECT s AS s_suppkey, CAST(COUNT(*) AS BIGINT) AS core_deg
FROM (SELECT sa AS s FROM e{last} UNION ALL SELECT sb FROM e{last})
GROUP BY 1 ORDER BY 1
""")
    return "".join(parts)


def lang_confusion_matrix_sql() -> str:
    """Confusion cells over the same lang_id expression."""
    from .functions.text import lang_id_sql

    return f"""
SELECT lang AS lang_true, {lang_id_sql('text')} AS lang_pred,
       CAST(COUNT(*) AS BIGINT) AS n
FROM documents GROUP BY 1, 2 ORDER BY 1, 2
"""


def cosupply_edge_churn_sql() -> str:
    """Edge churn between the before/after-cutoff co-supply snapshots
    (pairs must co-occur on an order WITHIN the same period)."""
    return """
WITH inc AS (
    SELECT DISTINCT l_orderkey, l_suppkey,
           CASE WHEN l_shipdate >= TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END AS late
    FROM lineitem
), p AS (
    SELECT DISTINCT a.l_suppkey AS sa, b.l_suppkey AS sb, a.late
    FROM inc a JOIN inc b
      ON a.l_orderkey = b.l_orderkey AND a.late = b.late AND a.l_suppkey < b.l_suppkey
), f AS (
    SELECT sa, sb,
           MAX(CASE WHEN late = 0 THEN 1 ELSE 0 END) AS e,
           MAX(late) AS l
    FROM p GROUP BY 1, 2
)
SELECT CAST(SUM(CASE WHEN e = 1 AND l = 0 THEN 1 ELSE 0 END) AS BIGINT) AS only_early,
       CAST(SUM(CASE WHEN e = 0 AND l = 1 THEN 1 ELSE 0 END) AS BIGINT) AS only_late,
       CAST(SUM(CASE WHEN e = 1 AND l = 1 THEN 1 ELSE 0 END) AS BIGINT) AS both_periods
FROM f
"""


def documents_dedup_keep_longest_sql() -> str:
    """Keep-longest (tie -> min doc_id) per exact-content group."""
    return """
WITH r AS (
    SELECT doc_id, n_chars, md5(text) AS fp,
           ROW_NUMBER() OVER (PARTITION BY md5(text)
                              ORDER BY n_chars DESC, doc_id ASC) AS rn,
           COUNT(*) OVER (PARTITION BY md5(text)) AS dup_count
    FROM documents
)
SELECT doc_id AS keep_doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(dup_count AS BIGINT) AS dup_count
FROM r WHERE rn = 1
"""


def near_threshold_pairs_sql() -> str:
    """Exact-Jaccard band audit via the LOWER-theta complete pair set."""
    from .queries import NEAR_THETA_HI, NEAR_THETA_LO

    return f"""
WITH pairs AS ({ngram_jaccard_exact_pairs_sql(NEAR_THETA_LO)})
SELECT doc_a, doc_b, jaccard_permille
FROM pairs WHERE jaccard_permille < {NEAR_THETA_HI}
"""


def geohash_prefix_rollup_sql() -> str:
    """Prefix rollup over the same term-by-term geohash expression."""
    from .queries import GH_ROLLUP_LEVELS

    values = ", ".join(f"({lv})" for lv in GH_ROLLUP_LEVELS)
    inner = geohash_lineitem_sql()
    return f"""
WITH gh AS ({inner}),
lv(level) AS (VALUES {values})
SELECT CAST(lv.level AS BIGINT) AS level,
       substr(gh.geohash, 1, lv.level) AS prefix,
       CAST(COUNT(*) AS BIGINT) AS n
FROM gh CROSS JOIN lv
GROUP BY 1, 2 ORDER BY 1, 2
"""


def nation_brand_weighted_jaccard_sql() -> str:
    """Weighted Jaccard via a dense (nation-pair x brand) grid with
    COALESCE-0 counts (missing brands contribute min 0 / max present)."""
    return """
WITH cells AS (
    SELECT CAST(c.c_nationkey AS BIGINT) AS nat, p.p_brand AS brand,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN part p     ON p.p_partkey = l.l_partkey
    GROUP BY 1, 2
), nats AS (SELECT DISTINCT nat FROM cells),
brands AS (SELECT DISTINCT brand FROM cells),
grid AS (
    SELECT a.nat AS nat_a, b.nat AS nat_b, br.brand,
           COALESCE(ca.n, 0) AS na, COALESCE(cb.n, 0) AS nb
    FROM nats a JOIN nats b ON a.nat < b.nat
    CROSS JOIN brands br
    LEFT JOIN cells ca ON ca.nat = a.nat AND ca.brand = br.brand
    LEFT JOIN cells cb ON cb.nat = b.nat AND cb.brand = br.brand
)
SELECT nat_a, nat_b,
       CAST(SUM(LEAST(na, nb)) AS BIGINT) AS sum_min,
       CAST(SUM(GREATEST(na, nb)) AS BIGINT) AS sum_max,
       CAST(SUM(LEAST(na, nb)) * 1000 // SUM(GREATEST(na, nb)) AS BIGINT) AS wj_permille
FROM grid GROUP BY 1, 2 ORDER BY 1, 2
"""


def revenue_longest_rise_sql() -> str:
    """Longest strictly-rising dense-daily-revenue run (gaps = 0), tie ->
    earliest start, via gaps-and-islands on the rise flag."""
    return """
WITH d AS (
    SELECT epoch_us(o_orderdate) // 86400000000 AS day,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY 1
), days AS (
    SELECT UNNEST(generate_series((SELECT MIN(day) FROM d), (SELECT MAX(day) FROM d))) AS day
), dense AS (
    SELECT days.day, COALESCE(d.cents, 0) AS cents FROM days LEFT JOIN d USING (day)
), f AS (
    SELECT day, cents,
           CASE WHEN cents > LAG(cents) OVER (ORDER BY day) THEN 0 ELSE 1 END AS brk
    FROM dense
), g AS (
    SELECT day, SUM(brk) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS grp FROM f
), runs AS (
    SELECT grp, MIN(day) AS start_day, CAST(COUNT(*) AS BIGINT) AS run_days
    FROM g GROUP BY 1
)
SELECT start_day, run_days FROM runs
ORDER BY run_days DESC, start_day ASC LIMIT 1
"""


def nation_top3_share_sql() -> str:
    """Top-k customer revenue share per nation, exact permille."""
    from .queries import NATION_TOPK

    return f"""
WITH r AS (
    SELECT o_custkey,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY 1
), n AS (
    SELECT CAST(c.c_nationkey AS BIGINT) AS n_nationkey, r.o_custkey, r.cents,
           ROW_NUMBER() OVER (PARTITION BY c.c_nationkey
                              ORDER BY r.cents DESC, r.o_custkey ASC) AS rn
    FROM r JOIN customer c ON c.c_custkey = r.o_custkey
)
SELECT n_nationkey,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST(SUM(CASE WHEN rn <= {NATION_TOPK} THEN cents ELSE 0 END) AS BIGINT) AS top3_cents,
       CAST(SUM(CASE WHEN rn <= {NATION_TOPK} THEN cents ELSE 0 END) * 1000
            // SUM(cents) AS BIGINT) AS top3_share_permille
FROM n GROUP BY 1 ORDER BY 1
"""


def customer_rfm_segments_sql() -> str:
    """RFM classes via the shared (tot//K)*i + LEAST rank-boundary rule
    and strict-below counting (tie-deterministic, unlike NTILE labels)."""
    from .queries import RFM_CLASSES

    ks = ", ".join(f"({i})" for i in range(1, RFM_CLASSES))

    def _cls(col: str, cte: str) -> str:
        return f"""
{cte}_ord AS (
    SELECT {col} AS v, ROW_NUMBER() OVER (ORDER BY {col}) AS rn, COUNT(*) OVER () AS tot
    FROM rfm
),
{cte}_b AS (
    SELECT o.v AS ub FROM ks JOIN {cte}_ord o
      ON o.rn = (o.tot // {RFM_CLASSES}) * ks.i + LEAST(ks.i, o.tot % {RFM_CLASSES})
)"""

    return f"""
WITH rfm AS (
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents,
           CAST(MAX(epoch_us(o_orderdate) // 86400000000) AS BIGINT) AS last_day
    FROM orders GROUP BY 1
),
ks(i) AS (VALUES {ks}),{_cls('last_day', 'r')},{_cls('n_orders', 'f')},{_cls('cents', 'm')}
SELECT o_custkey,
       CAST(1 + (SELECT COUNT(*) FROM r_b WHERE r_b.ub < rfm.last_day) AS BIGINT) AS r_class,
       CAST(1 + (SELECT COUNT(*) FROM f_b WHERE f_b.ub < rfm.n_orders) AS BIGINT) AS f_class,
       CAST(1 + (SELECT COUNT(*) FROM m_b WHERE m_b.ub < rfm.cents) AS BIGINT) AS m_class
FROM rfm
"""


def route_bearing_octants_sql() -> str:
    """Heading-class histogram: the same quadrant x dominant-axis CASE
    ladder over per-order consecutive-stop deltas."""
    return """
WITH p AS (
    SELECT l_orderkey,
           (l_orderkey * 131 + l_linenumber * 17) % 4096 AS ix,
           (l_orderkey * 241 + l_partkey * 13) % 4096 AS iy,
           ROW_NUMBER() OVER (PARTITION BY l_orderkey
                              ORDER BY l_linenumber, l_partkey) AS rn
    FROM lineitem
), legs AS (
    SELECT b.ix - a.ix AS dx, b.iy - a.iy AS dy
    FROM p a JOIN p b ON b.l_orderkey = a.l_orderkey AND b.rn = a.rn + 1
)
SELECT CAST(CASE WHEN dx = 0 AND dy = 0 THEN 8 ELSE
         (CASE WHEN dy < 0 THEN 4 ELSE 0 END)
       + (CASE WHEN dx < 0 THEN 2 ELSE 0 END)
       + (CASE WHEN ABS(dx) >= ABS(dy) THEN 1 ELSE 0 END) END AS BIGINT) AS octant,
       CAST(COUNT(*) AS BIGINT) AS n
FROM legs GROUP BY 1 ORDER BY 1
"""


def orders_time_pyramid_sql() -> str:
    """Three calendar grains from the same epoch arithmetic (month code =
    (year-1970)*12 + month-1, matching numpy datetime64[M])."""
    return """
WITH b AS (
    SELECT epoch_us(o_orderdate) // 86400000000 AS day,
           epoch_us(o_orderdate) // 86400000000 // 7 AS week,
           (CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) - 1970) * 12
             + CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) - 1 AS month
    FROM orders
)
SELECT CAST(0 AS BIGINT) AS grain, day AS bucket_id, CAST(COUNT(*) AS BIGINT) AS n
FROM b GROUP BY 2
UNION ALL
SELECT CAST(1 AS BIGINT), week, CAST(COUNT(*) AS BIGINT) FROM b GROUP BY 2
UNION ALL
SELECT CAST(2 AS BIGINT), month, CAST(COUNT(*) AS BIGINT) FROM b GROUP BY 2
ORDER BY 1, 2
"""


def events_mad_outliers_sql() -> str:
    """Per-type lower-median MAD screen, |v - med| > K*MAD."""
    from .queries import MAD_OUTLIER_MULT

    return f"""
WITH t AS (
    SELECT event_id, event_type AS f,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
    FROM events
), m AS (
    SELECT f, c, ROW_NUMBER() OVER (PARTITION BY f ORDER BY c) AS rn,
           COUNT(*) OVER (PARTITION BY f) AS n
    FROM t
), med AS (
    SELECT f, c AS median_c FROM m WHERE rn = (n + 1) // 2
), d AS (
    SELECT t.f, ABS(t.c - med.median_c) AS dc FROM t JOIN med USING (f)
), m2 AS (
    SELECT f, dc, ROW_NUMBER() OVER (PARTITION BY f ORDER BY dc) AS rn,
           COUNT(*) OVER (PARTITION BY f) AS n
    FROM d
), mad AS (
    SELECT f, dc AS mad_c FROM m2 WHERE rn = (n + 1) // 2
)
SELECT t.event_id, t.f AS event_type, t.c AS value_cents
FROM t JOIN med USING (f) JOIN mad USING (f)
WHERE ABS(t.c - med.median_c) > {MAD_OUTLIER_MULT} * mad.mad_c
"""


def price_qty_copula_grid_sql() -> str:
    """Empirical copula cells via two boundary CTEs with the shared rank
    rule and strict-below classing."""
    from .queries import COPULA_BINS

    ks = ", ".join(f"({i})" for i in range(1, COPULA_BINS))
    return f"""
WITH t AS (
    SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS p,
           CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS q
    FROM lineitem
),
ks(i) AS (VALUES {ks}),
po AS (SELECT p AS v, ROW_NUMBER() OVER (ORDER BY p) AS rn, COUNT(*) OVER () AS tot FROM t),
pb AS (SELECT o.v AS ub FROM ks JOIN po o
        ON o.rn = (o.tot // {COPULA_BINS}) * ks.i + LEAST(ks.i, o.tot % {COPULA_BINS})),
qo AS (SELECT q AS v, ROW_NUMBER() OVER (ORDER BY q) AS rn, COUNT(*) OVER () AS tot FROM t),
qb AS (SELECT o.v AS ub FROM ks JOIN qo o
        ON o.rn = (o.tot // {COPULA_BINS}) * ks.i + LEAST(ks.i, o.tot % {COPULA_BINS}))
SELECT CAST(1 + (SELECT COUNT(*) FROM pb WHERE pb.ub < t.p) AS BIGINT) AS price_decile,
       CAST(1 + (SELECT COUNT(*) FROM qb WHERE qb.ub < t.q) AS BIGINT) AS qty_decile,
       CAST(COUNT(*) AS BIGINT) AS n
FROM t GROUP BY 1, 2 ORDER BY 1, 2
"""


def orders_price_ranksum_drift_sql() -> str:
    """Exact doubled-midrank Mann-Whitney components from the grouped
    value histogram."""
    return """
WITH t AS (
    SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c,
           CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END AS late
    FROM orders
), h AS (
    SELECT c,
           CAST(SUM(CASE WHEN late = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
           CAST(COUNT(*) AS BIGINT) AS nv
    FROM t GROUP BY 1
), o AS (
    SELECT *, SUM(nv) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) - nv AS cume FROM h
), s AS (
    SELECT CAST(SUM(n0) AS BIGINT) AS n_early,
           CAST(SUM(nv - n0) AS BIGINT) AS n_late,
           CAST(SUM(n0 * (2 * cume + nv + 1)) AS BIGINT) AS r1_x2
    FROM o
)
SELECT n_early, n_late, r1_x2,
       CAST(r1_x2 - n_early * (n_early + 1) AS BIGINT) AS u1_x2
FROM s
"""


def customers_at_churn_risk_sql() -> str:
    """Gap > exact p90 (rank ceil(0.9n)) of all customers' gaps."""
    from .queries import CHURN_GAP_RANK_DEN, CHURN_GAP_RANK_NUM

    return f"""
WITH l AS (
    SELECT o_custkey, MAX(epoch_us(o_orderdate) // 86400000000) AS last_day
    FROM orders GROUP BY 1
), g AS (
    SELECT o_custkey, (SELECT MAX(last_day) FROM l) - last_day AS gap_days FROM l
), o AS (
    SELECT gap_days, ROW_NUMBER() OVER (ORDER BY gap_days) AS rn, COUNT(*) OVER () AS n
    FROM g
), p AS (
    SELECT gap_days AS p90 FROM o
    WHERE rn = ({CHURN_GAP_RANK_NUM} * n + {CHURN_GAP_RANK_DEN} - 1) // {CHURN_GAP_RANK_DEN}
)
SELECT g.o_custkey, CAST(g.gap_days AS BIGINT) AS gap_days
FROM g, p WHERE g.gap_days > p.p90
ORDER BY 1
"""


def customer_lorenz_curve_sql() -> str:
    """Lorenz points at decile ranks (revenue ASC, custkey ASC)."""
    from .queries import LORENZ_POINTS

    ks = ", ".join(f"({i})" for i in range(1, LORENZ_POINTS + 1))
    return f"""
WITH r AS (
    SELECT o_custkey,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY 1
), o AS (
    SELECT cents,
           ROW_NUMBER() OVER (ORDER BY cents ASC, o_custkey ASC) AS rn,
           SUM(cents) OVER (ORDER BY cents ASC, o_custkey ASC
                            ROWS UNBOUNDED PRECEDING) AS cum,
           COUNT(*) OVER () AS n, SUM(cents) OVER () AS total
    FROM r
), ks(i) AS (VALUES {ks})
SELECT CAST(ks.i AS BIGINT) AS decile,
       CAST(o.rn AS BIGINT) AS cum_customers,
       CAST(o.cum AS BIGINT) AS cum_cents,
       CAST(o.total AS BIGINT) AS total_cents
FROM ks JOIN o
  ON o.rn = (o.n // {LORENZ_POINTS}) * ks.i + LEAST(ks.i, o.n % {LORENZ_POINTS})
ORDER BY 1
"""


def doc_hapax_ratio_sql() -> str:
    """Per-doc token totals and singleton-token counts."""
    from .functions.text import WS_SPLIT_PATTERN

    return f"""
WITH toks AS (
    SELECT doc_id,
           unnest(list_filter(regexp_split_to_array(lower(text), '{WS_SPLIT_PATTERN}'),
                              x -> x <> '')) AS t
    FROM documents
), c AS (
    SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY 1, 2
), agg AS (
    SELECT doc_id,
           CAST(SUM(n) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
    FROM c GROUP BY 1
)
SELECT d.doc_id, COALESCE(agg.n_tokens, 0) AS n_tokens, COALESCE(agg.n_hapax, 0) AS n_hapax
FROM documents d LEFT JOIN agg USING (doc_id)
"""


def customer_revenue_gini_sql() -> str:
    """Rank-weighted exact Gini components over the same total order."""
    return """
WITH r AS (
    SELECT o_custkey,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY 1
), o AS (
    SELECT cents, ROW_NUMBER() OVER (ORDER BY cents ASC, o_custkey ASC) AS rn FROM r
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST(2 * SUM(rn * cents) - (COUNT(*) + 1) * SUM(cents) AS BIGINT) AS gini_num,
       CAST(COUNT(*) * SUM(cents) AS BIGINT) AS gini_den
FROM o
"""


# ------------------------------------------------ round-5 additions

def q21_waiting_suppliers_sql() -> str:
    """TPC-H q21 adaptation: the sole late supplier on multi-supplier
    orders (late = shipped > Q21_LATE_DAYS after the order date)."""
    from .queries import Q21_LATE_DAYS

    return f"""
WITH per AS (
    SELECT l.l_orderkey, l.l_suppkey,
           MAX(CASE WHEN date_diff('day', date_trunc('day', o.o_orderdate),
                                   date_trunc('day', l.l_shipdate)) > {Q21_LATE_DAYS}
                    THEN 1 ELSE 0 END) AS late
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2
),
per_order AS (
    SELECT l_orderkey, COUNT(*) AS n_supp, SUM(late) AS n_late,
           MAX(CASE WHEN late = 1 THEN l_suppkey END) AS late_supp
    FROM per GROUP BY 1
),
waits AS (
    SELECT late_supp AS s_suppkey, COUNT(*) AS numwait
    FROM per_order WHERE n_supp >= 2 AND n_late = 1 GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, CAST(w.numwait AS BIGINT) AS numwait
FROM waits w JOIN supplier s ON s.s_suppkey = w.s_suppkey
"""


def route_road_crossings_sql() -> str:
    """Proper segment-crossing counts via strict orientation SIGN tests
    (never cross-product products — nothing overflows int64)."""
    from .functions.cells import X0, Y0
    from .sources.synthetic import road_segments_values_sql

    def cs(ox, oy, px, py, qx, qy):
        return f"sign(({px} - {ox}) * ({qy} - {oy}) - ({py} - {oy}) * ({qx} - {ox}))"

    d1 = cs("p1x", "p1y", "p2x", "p2y", "CAST(s.ax AS BIGINT)", "CAST(s.ay AS BIGINT)")
    d2 = cs("p1x", "p1y", "p2x", "p2y", "CAST(s.bx AS BIGINT)", "CAST(s.by AS BIGINT)")
    d3 = cs("CAST(s.ax AS BIGINT)", "CAST(s.ay AS BIGINT)",
            "CAST(s.bx AS BIGINT)", "CAST(s.by AS BIGINT)", "p1x", "p1y")
    d4 = cs("CAST(s.ax AS BIGINT)", "CAST(s.ay AS BIGINT)",
            "CAST(s.bx AS BIGINT)", "CAST(s.by AS BIGINT)", "p2x", "p2y")
    return f"""
WITH {road_segments_values_sql('segs')},
q AS (
    SELECT l_orderkey * 10 + l_linenumber AS query_id,
           CAST({X0!r} + ((l_orderkey * 131 + l_linenumber * 17) % 4096) * 125 AS BIGINT) AS p1x,
           CAST({Y0!r} + ((l_orderkey * 241 + l_linenumber * 13) % 4096) * 125 AS BIGINT) AS p1y,
           CAST({X0!r} + ((l_orderkey * 131 + l_linenumber * 17 + 1777) % 4096) * 125 AS BIGINT) AS p2x,
           CAST({Y0!r} + ((l_orderkey * 241 + l_linenumber * 13 + 911) % 4096) * 125 AS BIGINT) AS p2y
    FROM lineitem
),
qd AS (SELECT DISTINCT * FROM q),
hits AS (
    SELECT qd.query_id,
           CASE WHEN ({d1}) * ({d2}) < 0 AND ({d3}) * ({d4}) < 0
                THEN 1 ELSE 0 END AS hit
    FROM qd CROSS JOIN segs s
),
cnt AS (SELECT query_id, CAST(SUM(hit) AS BIGINT) AS n_crossings FROM hits GROUP BY 1)
-- per-INPUT-ROW semantics: join back so duplicate (orderkey, linenumber)
-- rows keep their multiplicity (query_id is injective: linenumber <= 9)
SELECT q.query_id, c.n_crossings
FROM q JOIN cnt c ON c.query_id = q.query_id
"""


def users_all_event_types_sql() -> str:
    return """
WITH per AS (
    SELECT user_id, COUNT(DISTINCT event_type) AS n FROM events GROUP BY 1
)
SELECT user_id FROM per
WHERE n = (SELECT COUNT(DISTINCT event_type) FROM events)
"""


def doc_mean_token_df_sql() -> str:
    """Mean token document-frequency per doc: distinctness and df both
    over the shared ROLL_* fingerprint (identical collision behavior)."""
    from .functions.text import rolling_fingerprint_sql
    from .queries import MEAN_DF_SCALE

    return f"""
WITH {_doc_tokens_cte()},
tk AS (SELECT doc_id, unnest(ts) AS t FROM toks),
h AS (SELECT DISTINCT doc_id, {rolling_fingerprint_sql('t')} AS fp FROM tk),
dfreq AS (SELECT fp, CAST(COUNT(*) AS BIGINT) AS df FROM h GROUP BY 1),
agg AS (
    SELECT h.doc_id,
           CAST(SUM(d.df) AS BIGINT) AS tot,
           CAST(COUNT(*) AS BIGINT) AS n_distinct
    FROM h JOIN dfreq d ON d.fp = h.fp
    GROUP BY 1
)
SELECT doc_id, CAST({MEAN_DF_SCALE} * tot // n_distinct AS BIGINT) AS mean_df_scaled,
       n_distinct
FROM agg
"""


def token_budget_truncation_sql() -> str:
    """First-N-token truncation with the shared single-space
    re-serialization (list_slice + array_to_string over the RE2 split)."""
    from .functions.text import WS_SPLIT_PATTERN
    from .queries import TRUNC_BUDGET

    return f"""
WITH t AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(text, '{WS_SPLIT_PATTERN}'),
                       x -> x <> '') AS ts
    FROM documents
)
SELECT doc_id,
       array_to_string(list_slice(ts, 1, {TRUNC_BUDGET}), ' ') AS truncated_text,
       CAST(len(ts) AS BIGINT) AS n_tokens,
       CAST(least(len(ts), {TRUNC_BUDGET}) AS BIGINT) AS n_kept
FROM t
"""


def pack_efficiency_report_sql(max_len: int = 2048) -> str:
    """Per-sequence layout audit over the packing CTE: docs flat-map to
    the sequences their token span covers via generate_series (the
    2-step UNNEST recipe — DuckDB lacks lateral generate_series)."""
    return f"""
WITH packed AS ({sequence_packing_sql(max_len)}),
spans AS (
    SELECT seq_id AS s0,
           seq_id + (seq_offset + n_tokens - 1) // {max_len} AS s1,
           seq_id * {max_len} + seq_offset AS doc_lo,
           seq_id * {max_len} + seq_offset + n_tokens AS doc_hi
    FROM packed WHERE n_tokens > 0
),
ex AS (
    SELECT s0, s1, doc_lo, doc_hi, UNNEST(generate_series(s0, s1)) AS seq_id
    FROM spans
)
SELECT seq_id,
       CAST(SUM(least(doc_hi, (seq_id + 1) * {max_len})
                - greatest(doc_lo, seq_id * {max_len})) AS BIGINT) AS fill_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN seq_id = s0 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts
FROM ex GROUP BY 1
"""


def shard_manifest_documents_sql() -> str:
    from .functions.text import rolling_fingerprint_sql
    from .queries import N_SHARDS

    return f"""
SELECT doc_id % {N_SHARDS} AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM({rolling_fingerprint_sql('text')}) AS BIGINT) AS checksum
FROM documents GROUP BY 1
"""


def ngram_containment_pairs_sql(theta_permille: int = 500) -> str:
    """Jaccard pair SQL plus the two directional containment columns
    (identical float64 division + floor rounding)."""
    return f"""
WITH {_doc_shingles_ctes()},
n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
df AS (SELECT sh, COUNT(*) AS df FROM sh GROUP BY 1),
ranked AS (
    SELECT s.doc_id, s.sh,
           row_number() OVER (PARTITION BY s.doc_id ORDER BY d.df ASC, s.sh ASC) AS rn,
           nn.n_sh
    FROM sh s JOIN df d ON d.sh = s.sh JOIN n nn ON nn.doc_id = s.doc_id
),
pfx AS (
    SELECT * FROM ranked
    WHERE rn <= n_sh - (({theta_permille} * n_sh + 999) // 1000) + 1
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM pfx a JOIN pfx b ON a.sh = b.sh AND a.doc_id < b.doc_id
),
inter AS (
    SELECT c.doc_a, c.doc_b, COUNT(*) AS i
    FROM cand c
    JOIN sh sa ON sa.doc_id = c.doc_a
    JOIN sh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
    GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       CAST(floor(1000.0 * i.i / (na.n_sh + nb.n_sh - i.i) + 0.5) AS BIGINT)
           AS jaccard_permille,
       CAST(floor(1000.0 * i.i / na.n_sh + 0.5) AS BIGINT) AS cont_a_permille,
       CAST(floor(1000.0 * i.i / nb.n_sh + 0.5) AS BIGINT) AS cont_b_permille
FROM inter i
JOIN n na ON na.doc_id = i.doc_a
JOIN n nb ON nb.doc_id = i.doc_b
WHERE 1000 * i.i >= {theta_permille} * (na.n_sh + nb.n_sh - i.i)
"""


def weighted_pagerank_suppliers_sql(iters: int | None = None) -> str:
    """Weighted PageRank replica: same constants, per-edge BIGINT floor
    contribution rank * w // out_weight, K unrolled iteration CTEs."""
    from .stages.graph import (
        PR_CUST_OFFSET,
        PR_DAMP_DEN,
        PR_DAMP_NUM,
        PR_ITERS,
        PR_SCALE,
    )

    k = PR_ITERS if iters is None else iters
    its = []
    for i in range(1, k + 1):
        its.append(
            f"""r{i} AS (
    SELECT n.node_id,
           CAST({PR_DAMP_DEN - PR_DAMP_NUM} * ({PR_SCALE} // nn.n) // {PR_DAMP_DEN}
                + {PR_DAMP_NUM} * COALESCE(i.inc, 0) // {PR_DAMP_DEN} AS BIGINT)
               AS pr_score
    FROM nodes n CROSS JOIN nn
    LEFT JOIN (
        SELECT e.dst AS node_id,
               CAST(SUM(r.pr_score * e.w // d.ow) AS BIGINT) AS inc
        FROM edges e
        JOIN r{i - 1} r ON r.node_id = e.src
        JOIN ow d ON d.src = e.src
        GROUP BY e.dst
    ) i ON i.node_id = n.node_id
)"""
        )
    chain = ",\n".join(its)
    return f"""
WITH e0 AS (
    SELECT CAST(l.l_suppkey AS BIGINT) AS s,
           CAST(o.o_custkey AS BIGINT) AS c,
           CAST(COUNT(*) AS BIGINT) AS w
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
),
edges AS (
    SELECT s AS src, {PR_CUST_OFFSET} + c AS dst, w FROM e0
    UNION ALL
    SELECT {PR_CUST_OFFSET} + c AS src, s AS dst, w FROM e0
),
nodes AS (SELECT DISTINCT src AS node_id FROM edges),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
ow AS (SELECT src, CAST(SUM(w) AS BIGINT) AS ow FROM edges GROUP BY src),
r0 AS (
    SELECT node_id, CAST({PR_SCALE} // nn.n AS BIGINT) AS pr_score
    FROM nodes CROSS JOIN nn
),
{chain}
SELECT node_id, pr_score FROM r{k} ORDER BY node_id
"""


def minhash_recall_report_sql() -> str:
    """Confusion counts between the minhash pair SQL and the exact
    jaccard pair SQL (each embedded as a CTE-bearing subquery — DuckDB
    allows WITH inside a parenthesized FROM)."""
    return f"""
WITH x AS (SELECT doc_a, doc_b FROM ({ngram_jaccard_exact_pairs_sql()})),
m AS (SELECT doc_a, doc_b FROM ({minhash_dup_pairs_sql()})),
tp AS (SELECT COUNT(*) AS n FROM x JOIN m USING (doc_a, doc_b))
SELECT CAST((SELECT COUNT(*) FROM x) AS BIGINT) AS n_exact,
       CAST((SELECT COUNT(*) FROM m) AS BIGINT) AS n_minhash,
       CAST(tp.n AS BIGINT) AS true_pos,
       CAST((SELECT COUNT(*) FROM m) - tp.n AS BIGINT) AS false_pos,
       CAST((SELECT COUNT(*) FROM x) - tp.n AS BIGINT) AS false_neg
FROM tp
"""


def minhash_delta_near_dups_sql(est_permille: int = 500, cap: int | None = None) -> str:
    """Incremental-probe replica: the same signatures/bands as
    minhash_dup_pairs_sql, candidates restricted to delta x base sides,
    base-side star cap replicated via the runbase CTE."""
    from .functions.text import rolling_fingerprint_sql
    from .queries import DELTA_MOD
    from .stages.dedup import (
        BAND_K,
        MINHASH_A,
        MINHASH_B,
        MINHASH_P,
        MINHASH_PERMS,
        ROWS_PER_BAND,
        RUN_ALL_PAIRS_CAP,
    )

    if cap is None:
        cap = RUN_ALL_PAIRS_CAP
    perms = ", ".join(
        f"({i}, {int(a)}, {int(b)})"
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    )
    weights = ", ".join(
        f"({j}, {pow(BAND_K, ROWS_PER_BAND - 1 - j, MINHASH_P)})"
        for j in range(ROWS_PER_BAND)
    )
    return f"""
WITH {_doc_shingles_ctes()},
hashes AS (SELECT doc_id, {rolling_fingerprint_sql('sh')} AS h FROM sh),
perms(perm_id, a, b) AS (VALUES {perms}),
w(j, wt) AS (VALUES {weights}),
sig AS (
    SELECT hh.doc_id, p.perm_id, MIN((p.a * hh.h + p.b) % {MINHASH_P}) AS v
    FROM hashes hh CROSS JOIN perms p
    GROUP BY 1, 2
),
band AS (
    SELECT s.doc_id, s.perm_id // {ROWS_PER_BAND} AS band_id,
           SUM(((s.v % {MINHASH_P}) * w.wt) % {MINHASH_P}) % {MINHASH_P} AS band_hash
    FROM sig s JOIN w ON w.j = s.perm_id % {ROWS_PER_BAND}
    GROUP BY 1, 2
),
runbase AS (
    SELECT band_id, band_hash,
           COUNT(DISTINCT doc_id) AS nb, MIN(doc_id) AS mnb
    FROM band WHERE doc_id % {DELTA_MOD} <> 0 GROUP BY 1, 2
),
cand AS (
    SELECT DISTINCT d.doc_id AS delta_doc, b.doc_id AS base_doc
    FROM band d
    JOIN band b ON d.band_id = b.band_id AND d.band_hash = b.band_hash
    JOIN runbase r ON r.band_id = d.band_id AND r.band_hash = d.band_hash
    WHERE d.doc_id % {DELTA_MOD} = 0 AND b.doc_id % {DELTA_MOD} <> 0
      AND (r.nb <= {cap} OR b.doc_id = r.mnb)
),
eq AS (
    SELECT c.delta_doc, c.base_doc,
           COUNT(*) FILTER (WHERE sa.v = sb.v) AS neq
    FROM cand c
    JOIN sig sa ON sa.doc_id = c.delta_doc
    JOIN sig sb ON sb.doc_id = c.base_doc AND sb.perm_id = sa.perm_id
    GROUP BY 1, 2
)
SELECT delta_doc, base_doc,
       CAST(floor(1000.0 * neq / {MINHASH_PERMS} + 0.5) AS BIGINT)
           AS est_jaccard_permille
FROM eq
WHERE 1000 * neq >= {est_permille} * {MINHASH_PERMS}
"""


def doc_sentence_dedup_sql() -> str:
    """First-global-occurrence sentence dedup: same '. ' split, same
    ROLL_* sentence fingerprint, winner = MIN(doc_id * PACK + pos).
    unnest + generate_subscripts sit in the SAME select list (they
    cross-product when split across levels)."""
    from .functions.text import rolling_fingerprint_sql
    from .queries import SENT_PACK

    return f"""
WITH s AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(text, '\\. ')) AS frag,
           generate_subscripts(regexp_split_to_array(text, '\\. '), 1) AS pos
    FROM documents
),
h AS (
    SELECT doc_id, pos, frag,
           {rolling_fingerprint_sql('frag')} AS fp,
           doc_id * {SENT_PACK} + pos AS pack
    FROM s
),
w AS (SELECT fp, MIN(pack) AS minpack, COUNT(*) AS cnt FROM h GROUP BY 1),
kept AS (
    SELECT h.doc_id, h.pos, h.frag
    FROM h JOIN w ON w.fp = h.fp
    WHERE w.cnt < 2 OR h.pack = w.minpack
),
agg AS (
    SELECT doc_id, string_agg(frag, '. ' ORDER BY pos) AS clean_text,
           CAST(COUNT(*) AS BIGINT) AS n_kept
    FROM kept GROUP BY 1
),
tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM s GROUP BY 1)
SELECT d.doc_id,
       COALESCE(a.clean_text, '') AS clean_text,
       CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(t.n - COALESCE(a.n_kept, 0) AS BIGINT) AS n_dropped
FROM documents d
JOIN tot t ON t.doc_id = d.doc_id
LEFT JOIN agg a ON a.doc_id = d.doc_id
"""
