"""DuckDB oracle SQL — one ANSI-SQL twin per query in
``plans.analytics`` (and the text/dedup/similarity query wrappers).

Maintained in lockstep with the DataFrame implementations: same column
names, same explicit casts (counts BIGINT, calendar INT, money through
DECIMAL(18,2) → DOUBLE), same deterministic tie-breaks. See
analytics.py's module docstring for the determinism rules.
"""

from __future__ import annotations

# Exact money aggregation (matches analytics.dec/dsum/davg)
_DEC = "CAST({col} AS DECIMAL(18,2))"


def _dsum(col: str) -> str:
    return f"CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE)"


def _davg(col: str, nd: int = 6) -> str:
    return f"ROUND(CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE) / COUNT({col}), {nd})"


RELATIONAL_ORACLE: dict[str, str] = {}

RELATIONAL_ORACLE["q01_record_counts"] = """
SELECT * FROM (
  SELECT 'customer' AS table_name, COUNT(*) AS record_count FROM customer
  UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
  UNION ALL SELECT 'part', COUNT(*) FROM part
  UNION ALL SELECT 'orders', COUNT(*) FROM orders
  UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
  UNION ALL SELECT 'nation', COUNT(*) FROM nation
) ORDER BY table_name
"""

RELATIONAL_ORACLE["q02_orphaned_records"] = """
SELECT * FROM (
  SELECT 'lineitem_no_order' AS check_name, COUNT(*) AS orphans FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
  UNION ALL SELECT 'lineitem_no_part', COUNT(*) FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
  UNION ALL SELECT 'lineitem_no_supplier', COUNT(*) FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
  UNION ALL SELECT 'orders_no_customer', COUNT(*) FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
  UNION ALL SELECT 'customer_no_nation', COUNT(*) FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
) ORDER BY check_name
"""

RELATIONAL_ORACLE["q03_multi_line_orders"] = """
SELECT l_orderkey, COUNT(*) AS line_count
FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) > 1
ORDER BY line_count DESC, l_orderkey LIMIT 20
"""

RELATIONAL_ORACLE["q04_amount_quality"] = f"""
SELECT COUNT(l_extendedprice) AS total_count,
       CAST(MIN({_DEC.format(col='l_extendedprice')}) AS DOUBLE) AS min_amount,
       CAST(MAX({_DEC.format(col='l_extendedprice')}) AS DOUBLE) AS max_amount,
       {_davg('l_extendedprice')} AS avg_amount,
       ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 6) AS median_amount
FROM lineitem
"""

_CAL = """
  CAST(YEAR(o_orderdate) AS INT) AS year,
  CAST(QUARTER(o_orderdate) AS INT) AS quarter,
  CAST(MONTH(o_orderdate) AS INT) AS month,
  MONTHNAME(o_orderdate) AS month_name,
  CAST(ISODOW(o_orderdate) AS INT) AS day_of_week,
  DAYNAME(o_orderdate) AS day_name,
  ISODOW(o_orderdate) IN (6, 7) AS is_weekend
"""

RELATIONAL_ORACLE["q05_monthly_trends"] = f"""
WITH o AS (SELECT o_totalprice, {_CAL} FROM orders)
SELECT year, month, month_name,
       COUNT(*) AS transaction_count,
       {_dsum('o_totalprice')} AS total_amount,
       {_davg('o_totalprice')} AS avg_amount
FROM o GROUP BY year, month, month_name ORDER BY year, month
"""

RELATIONAL_ORACLE["q06_quarterly_comparison"] = f"""
WITH o AS (SELECT o_totalprice, {_CAL} FROM orders)
SELECT year, quarter,
       COUNT(*) AS transaction_count,
       {_dsum('o_totalprice')} AS total_amount
FROM o GROUP BY year, quarter ORDER BY year, quarter
"""

RELATIONAL_ORACLE["q07_day_of_week_patterns"] = f"""
WITH o AS (SELECT o_totalprice, {_CAL} FROM orders)
SELECT day_name, day_of_week,
       COUNT(*) AS transaction_count,
       {_dsum('o_totalprice')} AS total_amount,
       {_davg('o_totalprice')} AS avg_amount
FROM o GROUP BY day_name, day_of_week ORDER BY day_of_week
"""

RELATIONAL_ORACLE["q08_weekend_vs_weekday"] = f"""
WITH o AS (SELECT o_totalprice, {_CAL} FROM orders)
SELECT CASE WHEN is_weekend THEN 'Weekend' ELSE 'Weekday' END AS day_type,
       COUNT(*) AS transaction_count,
       {_dsum('o_totalprice')} AS total_amount,
       {_davg('o_totalprice')} AS avg_amount
FROM o GROUP BY day_type ORDER BY day_type
"""

RELATIONAL_ORACLE["q09_top_types_pct"] = """
WITH per_type AS (
  SELECT p_type, COUNT(*) AS transaction_count,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS td
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_type
)
SELECT p_type, transaction_count,
       CAST(td AS DOUBLE) AS total_amount,
       ROUND(CAST(td AS DOUBLE) * 100.0 /
             CAST((SELECT SUM(td) FROM per_type) AS DOUBLE), 2) AS pct_of_total
FROM per_type ORDER BY total_amount DESC, p_type
"""

RELATIONAL_ORACLE["q10_priority_by_month_pivot"] = """
WITH o AS (SELECT o_totalprice, o_orderpriority,
                  CAST(YEAR(o_orderdate) AS INT) AS year,
                  CAST(MONTH(o_orderdate) AS INT) AS month
           FROM orders)
SELECT year, month,
  CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS urgent_amount,
  CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS high_amount,
  CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS medium_amount,
  CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS low_amount
FROM o GROUP BY year, month ORDER BY year, month
"""

RELATIONAL_ORACLE["q11_top20_suppliers"] = f"""
SELECT s_name, n_name,
       COUNT(*) AS transaction_count,
       {_dsum('l_extendedprice')} AS total_amount,
       {_davg('l_extendedprice')} AS avg_amount
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY s_name, n_name
ORDER BY total_amount DESC, s_name LIMIT 20
"""

RELATIONAL_ORACLE["q12_supplier_customer_reach"] = f"""
SELECT s_name,
       COUNT(*) AS transaction_count,
       COUNT(DISTINCT o_custkey) AS unique_customers,
       {_dsum('l_extendedprice')} AS total_amount
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY unique_customers DESC, s_name LIMIT 15
"""

RELATIONAL_ORACLE["q13_priority_usage"] = f"""
SELECT o_orderpriority,
       COUNT(*) AS transaction_count,
       ROUND(COUNT(*) * 100.0 / (SELECT COUNT(*) FROM orders), 2) AS pct_of_transactions,
       {_dsum('o_totalprice')} AS total_amount,
       {_davg('o_totalprice')} AS avg_amount
FROM orders GROUP BY o_orderpriority
ORDER BY transaction_count DESC, o_orderpriority
"""

RELATIONAL_ORACLE["q14_status_by_priority"] = f"""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS transaction_count,
       {_dsum('o_totalprice')} AS total_amount
FROM orders GROUP BY o_orderstatus, o_orderpriority
ORDER BY o_orderstatus, o_orderpriority
"""

RELATIONAL_ORACLE["q15_top10_customers"] = f"""
SELECT c_custkey, c_name,
       COUNT(*) AS transaction_count,
       {_dsum('o_totalprice')} AS total_amount,
       {_davg('o_totalprice')} AS avg_amount,
       CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_amount
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY total_amount DESC, c_custkey LIMIT 10
"""

RELATIONAL_ORACLE["q16_top5_customers_by_type"] = f"""
SELECT o_custkey, p_type,
       COUNT(*) AS transaction_count,
       {_dsum('l_extendedprice')} AS total_amount
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
WHERE o_custkey IN (
  SELECT o_custkey FROM orders GROUP BY o_custkey
  ORDER BY SUM(CAST(o_totalprice AS DECIMAL(18,2))) DESC, o_custkey LIMIT 5
)
GROUP BY o_custkey, p_type
ORDER BY o_custkey, total_amount DESC, p_type
"""

RELATIONAL_ORACLE["q17_mom_growth"] = """
WITH monthly AS (
  SELECT CAST(YEAR(o_orderdate) AS INT) AS year,
         CAST(MONTH(o_orderdate) AS INT) AS month,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS td
  FROM orders GROUP BY 1, 2
), lagged AS (
  SELECT year, month, td, LAG(td) OVER (ORDER BY year, month) AS prev_td
  FROM monthly
)
SELECT year, month,
       CAST(td AS DOUBLE) AS total_spending,
       CAST(prev_td AS DOUBLE) AS prev_month_spending,
       ROUND(CAST(td AS DOUBLE) - CAST(prev_td AS DOUBLE), 2) AS mom_change,
       ROUND((CAST(td AS DOUBLE) - CAST(prev_td AS DOUBLE)) * 100.0 /
             NULLIF(CAST(prev_td AS DOUBLE), 0), 2) AS mom_pct_change
FROM lagged ORDER BY year, month
"""

RELATIONAL_ORACLE["q18_running_total_by_priority"] = """
WITH monthly AS (
  SELECT o_orderpriority,
         CAST(YEAR(o_orderdate) AS INT) AS year,
         CAST(MONTH(o_orderdate) AS INT) AS month,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS td
  FROM orders GROUP BY 1, 2, 3
)
SELECT o_orderpriority, year, month,
       CAST(td AS DOUBLE) AS monthly_amount,
       CAST(SUM(td) OVER (PARTITION BY o_orderpriority ORDER BY year, month
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
FROM monthly ORDER BY o_orderpriority, year, month
"""

RELATIONAL_ORACLE["q19_anomalous_lineitems"] = """
WITH joined AS (
  SELECT l_orderkey, l_linenumber, l_extendedprice, p_type
  FROM lineitem JOIN part ON l_partkey = p_partkey
), stats AS (
  SELECT p_type,
         ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(l_extendedprice), 10) AS a,
         STDDEV(l_extendedprice) AS s
  FROM joined GROUP BY p_type
)
SELECT l_orderkey, l_linenumber, j.p_type,
       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS amount,
       ROUND(a, 2) AS type_avg,
       ROUND((l_extendedprice - a) / NULLIF(s, 0), 2) AS z_score
FROM joined j JOIN stats USING (p_type)
WHERE l_extendedprice > a * 1.5
ORDER BY amount DESC, l_orderkey, l_linenumber LIMIT 50
"""

RELATIONAL_ORACLE["q20_star_join_sample"] = """
SELECT l_orderkey, l_linenumber, c_name, n_name, r_name, s_name, p_name,
       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS amount
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN part ON l_partkey = p_partkey
ORDER BY l_orderkey, l_linenumber LIMIT 5
"""

RELATIONAL_ORACLE["q21_events_hourly"] = f"""
SELECT DATE_TRUNC('hour', ts) AS hour, event_type,
       COUNT(*) AS event_count,
       {_dsum('value')} AS total_value
FROM events GROUP BY 1, 2 ORDER BY hour, event_type
"""

RELATIONAL_ORACLE["q22_user_sessions"] = """
WITH lagged AS (
  SELECT user_id, event_id, ts,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN prev IS NULL OR DATE_DIFF('second', prev, ts) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM lagged
), sessions AS (
  SELECT user_id,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS session_count,
       COUNT(*) AS event_count
FROM sessions GROUP BY user_id ORDER BY user_id
"""

_REVENUE = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"
)

RELATIONAL_ORACLE["q23_shipping_priority"] = f"""
SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
       {_REVENUE} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
"""

RELATIONAL_ORACLE["q24_regional_revenue"] = f"""
SELECT n.n_name, {_REVENUE} AS revenue, COUNT(*) AS lineitem_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name
ORDER BY revenue DESC, n.n_name
"""

RELATIONAL_ORACLE["q25_late_shipment_priority"] = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

RELATIONAL_ORACLE["q26_revenue_deciles"] = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM orders GROUP BY o_custkey
), tiled AS (
  SELECT o_custkey, revenue,
         CAST(NTILE(10) OVER (ORDER BY revenue DESC, o_custkey) AS INT) AS decile
  FROM per_cust
)
SELECT decile, COUNT(*) AS n_customers,
       ROUND(CAST(SUM(CAST(revenue AS DECIMAL(18,2))) AS DOUBLE), 2) AS decile_revenue,
       ROUND(MIN(revenue), 2) AS min_revenue,
       ROUND(MAX(revenue), 2) AS max_revenue
FROM tiled GROUP BY decile ORDER BY decile
"""

RELATIONAL_ORACLE["q27_cube_priority_status"] = """
SELECT o_orderpriority, o_orderstatus, COUNT(*) AS order_count,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST
"""

# events.ts is TIMESTAMP_NS in DuckDB but micro-truncated on the Spark
# side (see analytics.load); CAST(ts AS TIMESTAMP) truncates ns -> us so
# both engines compare identical instants.
RELATIONAL_ORACLE["aj01_asof_prior_click"] = """
WITH p AS (
  SELECT event_id AS purchase_id, user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id AS click_id
  FROM events WHERE event_type = 'click'
)
SELECT p.purchase_id, p.user_id, l.asof_click_id, l.gap_seconds
FROM p LEFT JOIN LATERAL (
  SELECT c.click_id AS asof_click_id,
         DATE_DIFF('second', c.ts, p.ts) AS gap_seconds
  FROM c WHERE c.user_id = p.user_id AND c.ts <= p.ts
  ORDER BY c.ts DESC, c.click_id DESC LIMIT 1
) l ON TRUE
ORDER BY purchase_id
"""

RELATIONAL_ORACLE["aj02_asof_next_purchase"] = """
WITH c AS (
  SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'click'
), p AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id AS purchase_id
  FROM events WHERE event_type = 'purchase'
)
SELECT c.click_id, c.user_id,
       CASE WHEN l.gap <= 600 THEN l.purchase_id END AS next_purchase_id,
       CASE WHEN l.gap <= 600 THEN l.gap END AS latency_seconds
FROM c LEFT JOIN LATERAL (
  SELECT p.purchase_id,
         CAST(FLOOR(epoch(p.ts)) AS BIGINT)
           - CAST(FLOOR(epoch(c.ts)) AS BIGINT) AS gap
  FROM p WHERE p.user_id = c.user_id AND p.ts >= c.ts
  ORDER BY p.ts ASC, p.purchase_id ASC LIMIT 1
) l ON TRUE
ORDER BY click_id
"""

# the Spark operator compares floor-epoch-seconds (ts CAST LONG), so the
# oracle floors epoch() the same way before the range predicate.
RELATIONAL_ORACLE["rj01_error_context_window"] = """
WITH e AS (
  SELECT event_id AS error_id, user_id,
         CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es
  FROM events WHERE event_type = 'error'
), p AS (
  SELECT user_id,
         CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ps
  FROM events WHERE event_type IN ('view', 'click')
)
SELECT e.error_id, e.user_id, COUNT(p.ps) AS n_preceding
FROM e LEFT JOIN p
  ON p.user_id = e.user_id AND p.ps >= e.es - 60 AND p.ps < e.es
GROUP BY e.error_id, e.user_id
ORDER BY error_id
"""

RELATIONAL_ORACLE["q28_top_customers_per_nation"] = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT n.n_name, p.o_custkey, p.revenue,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY n.n_name ORDER BY p.revenue DESC, p.o_custkey
         ) AS INT) AS rk
  FROM per_cust p
  JOIN customer c ON p.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
)
SELECT n_name, o_custkey, ROUND(revenue, 2) AS revenue, rk
FROM ranked WHERE rk <= 3 ORDER BY n_name, rk
"""

RELATIONAL_ORACLE["q29_promo_revenue"] = """
SELECT CAST(year(l_shipdate) AS INT) AS year,
       CAST(month(l_shipdate) AS INT) AS month,
       CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))
                     ELSE 0 END) AS DOUBLE) AS promo_revenue,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue,
       ROUND(CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))
                     ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) * 100, 6) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1, 2
ORDER BY year, month
"""

RELATIONAL_ORACLE["q30_revenue_forecast"] = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue_increase,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= CAST(0.05 AS DOUBLE)
  AND l_discount <= CAST(0.07 AS DOUBLE)
  AND l_quantity < 24
"""

RELATIONAL_ORACLE["q31_large_volume_customers"] = """
WITH big AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
)
SELECT c_name, o_orderkey, o_orderdate,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price,
       CAST(q AS DOUBLE) AS total_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey
LIMIT 20
"""

RELATIONAL_ORACLE["q32_daily_revenue_ma7"] = """
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
)
SELECT day,
       CAST(rev AS DOUBLE) AS revenue,
       ROUND(CAST(SUM(rev) OVER w AS DOUBLE) / COUNT(*) OVER w, 6) AS ma7_revenue
FROM daily
WINDOW w AS (ORDER BY datediff('day', TIMESTAMP '1990-01-01 00:00:00', day)
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
ORDER BY day
"""

RELATIONAL_ORACLE["q33_user_retention"] = """
WITH days AS (
  SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
), ret AS (
  SELECT a.day, COUNT(*) AS retained
  FROM days a JOIN days b
    ON b.day = a.day + INTERVAL 1 DAY AND b.user_id = a.user_id
  GROUP BY a.day
), act AS (
  SELECT day, COUNT(*) AS active_users FROM days GROUP BY day
)
SELECT act.day, act.active_users,
       COALESCE(ret.retained, 0) AS retained_users,
       ROUND(CAST(COALESCE(ret.retained, 0) AS DOUBLE) / act.active_users * 100, 6) AS retention_pct
FROM act LEFT JOIN ret ON act.day = ret.day
ORDER BY act.day
"""

# fn01 mirrors asof_join's tolerance semantics exactly: the lateral
# picks the latest match IGNORING the tolerance, then the match is
# nulled if older than the window (floor-epoch-second comparison, like
# the Spark operator's CAST(ts AS LONG) arithmetic).
RELATIONAL_ORACLE["fn01_purchase_funnel"] = """
WITH p AS (
  SELECT event_id AS purchase_id, user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id AS click_id
  FROM events WHERE event_type = 'click'
), v AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id AS view_id
  FROM events WHERE event_type = 'view'
), s1 AS (
  SELECT p.purchase_id, p.user_id, p.ts,
         CASE WHEN FLOOR(epoch(p.ts)) - FLOOR(epoch(l.cts)) <= 3600
              THEN l.click_id END AS click_id,
         CASE WHEN FLOOR(epoch(p.ts)) - FLOOR(epoch(l.cts)) <= 3600
              THEN l.cts END AS click_ts
  FROM p LEFT JOIN LATERAL (
    SELECT c.click_id, c.ts AS cts
    FROM c WHERE c.user_id = p.user_id AND c.ts <= p.ts
    ORDER BY c.ts DESC, c.click_id DESC LIMIT 1
  ) l ON TRUE
), s2 AS (
  SELECT s1.*,
         CASE WHEN FLOOR(epoch(s1.click_ts)) - FLOOR(epoch(m.vts)) <= 3600
              THEN m.view_id END AS view_id
  FROM s1 LEFT JOIN LATERAL (
    SELECT v.view_id, v.ts AS vts
    FROM v WHERE v.user_id = s1.user_id AND v.ts <= s1.click_ts
    ORDER BY v.ts DESC, v.view_id DESC LIMIT 1
  ) m ON TRUE
)
SELECT date_trunc('day', ts) AS day,
       COUNT(*) AS purchases,
       COUNT(click_id) AS with_prior_click,
       COUNT(view_id) AS full_chain,
       ROUND(CAST(COUNT(view_id) AS DOUBLE) / COUNT(*) * 100, 6) AS chain_pct
FROM s2
GROUP BY 1
ORDER BY day
"""

RELATIONAL_ORACLE["q35_top_percentile_orders"] = """
WITH ranked AS (
  SELECT o_orderpriority, o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price,
         ROUND(percent_rank() OVER w, 6) AS pct_rank,
         ROUND(cume_dist() OVER w, 6) AS cume_dist
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
)
SELECT * FROM ranked
WHERE cume_dist >= 0.99
ORDER BY o_orderpriority, o_orderkey
"""

RELATIONAL_ORACLE["q36_customer_cohort_setops"] = """
WITH y96 AS (
  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
), y97 AS (
  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997
)
SELECT segment, n_customers FROM (
  SELECT 'both_years' AS segment,
         (SELECT COUNT(*) FROM (SELECT * FROM y96 INTERSECT SELECT * FROM y97)) AS n_customers
  UNION ALL
  SELECT 'only_1996',
         (SELECT COUNT(*) FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y97))
  UNION ALL
  SELECT 'only_1997',
         (SELECT COUNT(*) FROM (SELECT * FROM y97 EXCEPT SELECT * FROM y96))
)
ORDER BY segment
"""

_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)

RELATIONAL_ORACLE["prof01_orders_profile"] = (
    "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS column_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
FROM orders"""
        for c in _PROFILE_COLS
    )
    + "\nORDER BY column_name"
)

# space-split title-case: exact on part's charset (see
# std01_standardized_parts docstring — RE2 has no lookarounds for the
# general letter-boundary split)
_SQL_TITLE = (
    "array_to_string(list_transform(string_split(trim({x}), ' '), "
    "w -> upper(w[1:1]) || lower(w[2:])), ' ')"
)

RELATIONAL_ORACLE["std01_standardized_parts"] = f"""
SELECT p_partkey,
       {_SQL_TITLE.format(x="p_name")} AS std_name,
       {_SQL_TITLE.format(x="p_type")} AS std_type,
       {_SQL_TITLE.format(x="p_brand")} AS std_brand
FROM part
ORDER BY p_partkey LIMIT 20
"""

RELATIONAL_ORACLE["q38_price_percentiles"] = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(PERCENTILE_CONT(0.5) WITHIN GROUP (
         ORDER BY CAST(o_totalprice AS DOUBLE)), 4) AS p50_total_price,
       ROUND(PERCENTILE_CONT(0.9) WITHIN GROUP (
         ORDER BY CAST(o_totalprice AS DOUBLE)), 4) AS p90_total_price,
       ROUND(PERCENTILE_CONT(0.99) WITHIN GROUP (
         ORDER BY CAST(o_totalprice AS DOUBLE)), 4) AS p99_total_price
FROM orders
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

RELATIONAL_ORACLE["q37_grouping_sets"] = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
ORDER BY gid, l_returnflag, l_linestatus
"""

# q39's oracle runs the TEXTBOOK correlated EXISTS / NOT EXISTS form —
# certifying that the Spark plan's aggregation rewrite is semantically
# identical to the reference formulation, not just self-consistent.
RELATIONAL_ORACLE["q39_sole_late_supplier"] = """
WITH l AS (
  SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate, o.o_orderdate
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
)
SELECT CAST(l1.l_suppkey AS BIGINT) AS suppkey,
       CAST(COUNT(DISTINCT l1.l_orderkey) AS BIGINT) AS n_blamed_orders
FROM l l1
WHERE l1.l_shipdate > l1.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM l l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM l l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > l3.o_orderdate + INTERVAL 60 DAY)
GROUP BY l1.l_suppkey
ORDER BY n_blamed_orders DESC, suppkey LIMIT 20
"""

# q40's oracle runs the TEXTBOOK nested-IN chain (TPC-H Q20's
# correlated-threshold shape) — certifying the Spark plan's
# decorrelated two-aggregate rewrite against the reference formulation.
RELATIONAL_ORACLE["q40_dominant_part_suppliers"] = """
WITH pq AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
  GROUP BY l_partkey, l_suppkey
), tot AS (
  SELECT l_partkey, SUM(sq) AS tq FROM pq GROUP BY l_partkey
)
SELECT CAST(s.s_suppkey AS BIGINT) AS suppkey, s.s_name
FROM supplier s
WHERE s.s_suppkey IN (
    SELECT pq.l_suppkey FROM pq JOIN tot ON pq.l_partkey = tot.l_partkey
    WHERE 2 * pq.sq > tot.tq)
  AND s.s_nationkey IN (
    SELECT n_nationkey FROM nation
    WHERE n_name IN ('NATION_0','NATION_1','NATION_2','NATION_3','NATION_4'))
ORDER BY suppkey
"""

# q41's oracle runs the textbook Q22 form: scalar-average subquery in
# multiply form (no division on either engine) + correlated NOT EXISTS.
RELATIONAL_ORACLE["q41_dormant_rich_customers"] = """
WITH panel AS (
  SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
  FROM customer WHERE c_nationkey IN (0,1,2,3,4,5,6,7,8,9)
), thresh AS (
  SELECT SUM(bal) AS s, CAST(COUNT(*) AS BIGINT) AS n
  FROM panel WHERE bal > 0
)
SELECT c_nationkey AS nation,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(bal) AS DOUBLE) AS totacctbal
FROM panel p, thresh t
WHERE p.bal * t.n > t.s
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = p.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey ORDER BY nation
"""

# q15-shape: the oracle keeps the textbook scalar-MAX-equality form.
RELATIONAL_ORACLE["q42_quarter_top_supplier"] = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT CAST(s.s_suppkey AS BIGINT) AS suppkey, s.s_name,
       CAST(r.total_revenue AS DOUBLE) AS total_revenue
FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
ORDER BY suppkey
"""

# q43's oracle runs the textbook Q2-style correlated scalar-MIN
# subquery — certifying the decorrelated groupBy+equality-join rewrite.
RELATIONAL_ORACLE["q43_first_supplier_per_part"] = """
SELECT CAST(l.l_partkey AS BIGINT) AS partkey, p.p_name,
       MIN(l.l_shipdate) AS first_ship,
       CAST(l.l_suppkey AS BIGINT) AS suppkey, s.s_name
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
WHERE p.p_size <= 5
  AND l.l_shipdate = (
    SELECT MIN(l2.l_shipdate) FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey)
GROUP BY l.l_partkey, p.p_name, l.l_suppkey, s.s_name
ORDER BY partkey, suppkey
"""

# q45's oracle runs the textbook Q17 correlated scalar-subquery form
# (threshold in exact multiply form: 5·qty·cnt < sum, so neither
# engine computes 0.2·AVG in floating point) — certifying the
# decorrelated per-part-aggregate + equality-join rewrite.
RELATIONAL_ORACLE["q45_small_quantity_revenue"] = """
SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0, 2) AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND CAST(l.l_quantity AS DECIMAL(9,2))
      * (SELECT COUNT(*) FROM lineitem l2
         WHERE l2.l_partkey = l.l_partkey) * 5
      < (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) FROM lineitem l2
         WHERE l2.l_partkey = l.l_partkey)
"""

# q46's oracle keeps the textbook Q11 scalar-subquery-in-HAVING form
# (threshold in multiply form over IEEE doubles — no division at the
# boundary; 1.5× the mean per-part value, Q11's 0.0001/SF
# re-expressed data-relatively).
RELATIONAL_ORACLE["q46_part_value_share"] = """
WITH per AS (
  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS val
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(l_partkey AS BIGINT) AS partkey,
       CAST(val AS DOUBLE) AS part_value,
       ROUND(CAST(val AS DOUBLE) * 100.0
             / CAST((SELECT SUM(val) FROM per) AS DOUBLE), 6) AS pct_of_total
FROM per
WHERE 2 * CAST(val AS DOUBLE) * (SELECT COUNT(*) FROM per)
      > 3 * CAST((SELECT SUM(val) FROM per) AS DOUBLE)
ORDER BY part_value DESC, partkey
"""

# q48's oracle states the textbook Q8 form — the flat 8-table join
# with nation appearing twice (n1 = customer market, n2 = selling
# nation) and the share as a conditional-sum ratio per order year —
# certifying the two-role broadcast star plan against it. The CASE
# sums the SAME decimal product as the total (no ELSE 0: SUM skips
# NULLs, and COALESCE maps an empty year to 0.0 after the double
# cast, exactly as the Spark side does).
RELATIONAL_ORACLE["q48_market_share"] = """
WITH sales AS (
  SELECT CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
         n2.n_name AS nation,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume
  FROM lineitem l, part p, orders o, customer c, supplier s,
       nation n1, nation n2, region r
  WHERE p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
    AND o.o_orderkey = l.l_orderkey
    AND c.c_custkey = o.o_custkey
    AND n1.n_nationkey = c.c_nationkey
    AND r.r_regionkey = n1.n_regionkey AND r.r_name = 'ASIA'
    AND s.s_suppkey = l.l_suppkey
    AND n2.n_nationkey = s.s_nationkey
)
SELECT o_year,
       COALESCE(CAST(SUM(CASE WHEN nation = 'NATION_2' THEN volume END)
                     AS DOUBLE), 0.0) AS nation_volume,
       CAST(SUM(volume) AS DOUBLE) AS total_volume,
       ROUND(COALESCE(CAST(SUM(CASE WHEN nation = 'NATION_2' THEN volume END)
                           AS DOUBLE), 0.0)
             / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
FROM sales
GROUP BY o_year
ORDER BY o_year
"""

# q47's oracle states the textbook Q19 OR-of-ANDs join predicate.
RELATIONAL_ORACLE["q47_disjunct_revenue"] = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 1 AND 15)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 5 AND 20
       AND l.l_quantity BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 10 AND 40
       AND l.l_quantity BETWEEN 20 AND 50)
"""

# q44's oracle runs the textbook Q13 form: left outer join with the
# exclusion in the JOIN CONDITION, then the count-of-counts histogram —
# certifying the aggregate-before-join rewrite against it.
RELATIONAL_ORACLE["q44_customer_order_distribution"] = """
WITH per AS (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM per GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""
