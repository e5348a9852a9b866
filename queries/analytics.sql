-- Analytics query corpus for the Spark star-schema warehouse.
-- Format mirrors the reference's corpus contract (SURVEY §3.2 /
-- reference src/run_queries.py:130-177): each query is preceded by a
-- `-- Purpose:` line, queries are separated by blank lines, and the
-- runner strips trailing semicolons. Dialect is Spark SQL (ANSI):
-- PERCENTILE_CONT is expressed as percentile(); everything else is
-- standard. Tables are the warehouse temp views registered by
-- Warehouse.register_views().

-- Purpose: Row counts of every warehouse table (Q1 record_counts)
SELECT 'dim_category' AS table_name, COUNT(*) AS row_count FROM dim_category
UNION ALL
SELECT 'dim_date' AS table_name, COUNT(*) AS row_count FROM dim_date
UNION ALL
SELECT 'dim_merchant' AS table_name, COUNT(*) AS row_count FROM dim_merchant
UNION ALL
SELECT 'dim_payment_method' AS table_name, COUNT(*) AS row_count FROM dim_payment_method
UNION ALL
SELECT 'dim_user' AS table_name, COUNT(*) AS row_count FROM dim_user
UNION ALL
SELECT 'fact_transactions' AS table_name, COUNT(*) AS row_count FROM fact_transactions
ORDER BY table_name;

-- Purpose: Referential integrity — fact rows with no matching dimension row (Q2 orphaned_records)
SELECT
  SUM(CASE WHEN NOT EXISTS (SELECT 1 FROM dim_date d WHERE d.date_key = f.date_key) THEN 1 ELSE 0 END) AS orphaned_date,
  SUM(CASE WHEN NOT EXISTS (SELECT 1 FROM dim_category c WHERE c.category_key = f.category_key) THEN 1 ELSE 0 END) AS orphaned_category,
  SUM(CASE WHEN NOT EXISTS (SELECT 1 FROM dim_merchant m WHERE m.merchant_key = f.merchant_key) THEN 1 ELSE 0 END) AS orphaned_merchant,
  SUM(CASE WHEN NOT EXISTS (SELECT 1 FROM dim_payment_method p WHERE p.payment_method_key = f.payment_method_key) THEN 1 ELSE 0 END) AS orphaned_payment_method,
  SUM(CASE WHEN NOT EXISTS (SELECT 1 FROM dim_user u WHERE u.user_key = f.user_key) THEN 1 ELSE 0 END) AS orphaned_user
FROM fact_transactions f;

-- Purpose: Duplicate natural keys in the fact table (Q3 duplicate_transaction_ids)
SELECT transaction_id, COUNT(*) AS occurrences
FROM fact_transactions
GROUP BY transaction_id
HAVING COUNT(*) > 1
ORDER BY occurrences DESC, transaction_id;

-- Purpose: Amount distribution quality profile (Q4 amount_quality)
SELECT
  COUNT(*) AS transaction_count,
  MIN(amount) AS min_amount,
  MAX(amount) AS max_amount,
  ROUND(AVG(amount), 2) AS avg_amount,
  ROUND(percentile(amount, 0.5), 2) AS median_amount
FROM fact_transactions;

-- Purpose: Monthly spending trends (Q5 monthly_trends)
SELECT d.year, d.month, d.month_name,
       COUNT(*) AS transaction_count,
       SUM(f.amount) AS total_spending,
       ROUND(AVG(f.amount), 2) AS avg_transaction
FROM fact_transactions f
JOIN dim_date d ON d.date_key = f.date_key
GROUP BY d.year, d.month, d.month_name
ORDER BY d.year, d.month;

-- Purpose: Quarterly spending comparison (Q6 quarterly_comparison)
SELECT d.year, d.quarter,
       COUNT(*) AS transaction_count,
       SUM(f.amount) AS total_spending
FROM fact_transactions f
JOIN dim_date d ON d.date_key = f.date_key
GROUP BY d.year, d.quarter
ORDER BY d.year, d.quarter;

-- Purpose: Spending habits by day of week (Q7 day_of_week_patterns)
SELECT d.day_name, d.day_of_week,
       COUNT(*) AS transaction_count,
       SUM(f.amount) AS total_spending,
       ROUND(AVG(f.amount), 2) AS avg_transaction
FROM fact_transactions f
JOIN dim_date d ON d.date_key = f.date_key
GROUP BY d.day_name, d.day_of_week
ORDER BY d.day_of_week;

-- Purpose: Weekend vs weekday spending split (Q8 weekend_vs_weekday)
SELECT CASE WHEN d.is_weekend THEN 'Weekend' ELSE 'Weekday' END AS day_type,
       COUNT(*) AS transaction_count,
       SUM(f.amount) AS total_spending,
       ROUND(AVG(f.amount), 2) AS avg_transaction
FROM fact_transactions f
JOIN dim_date d ON d.date_key = f.date_key
GROUP BY d.is_weekend
ORDER BY day_type;

-- Purpose: Category ranking with percent of total spend (Q9 top_categories_pct)
SELECT c.category_name,
       COUNT(*) AS transaction_count,
       SUM(f.amount) AS total_spending,
       ROUND(SUM(f.amount) * 100.0 / (SELECT SUM(amount) FROM fact_transactions), 2) AS pct_of_total
FROM fact_transactions f
JOIN dim_category c ON c.category_key = f.category_key
GROUP BY c.category_name
ORDER BY total_spending DESC;

-- Purpose: Monthly spend pivoted across four key categories (Q10 category_by_month_pivot)
SELECT d.year, d.month,
       SUM(CASE WHEN c.category_name = 'Groceries' THEN f.amount ELSE 0 END) AS groceries,
       SUM(CASE WHEN c.category_name = 'Dining' THEN f.amount ELSE 0 END) AS dining,
       SUM(CASE WHEN c.category_name = 'Transportation' THEN f.amount ELSE 0 END) AS transportation,
       SUM(CASE WHEN c.category_name = 'Entertainment' THEN f.amount ELSE 0 END) AS entertainment
FROM fact_transactions f
JOIN dim_date d ON d.date_key = f.date_key
JOIN dim_category c ON c.category_key = f.category_key
GROUP BY d.year, d.month
ORDER BY d.year, d.month;

-- Purpose: Top 20 merchants by revenue with their category (Q11 top20_merchants)
SELECT m.merchant_name, c.category_name,
       COUNT(*) AS transaction_count,
       SUM(f.amount) AS total_spending,
       ROUND(AVG(f.amount), 2) AS avg_transaction
FROM fact_transactions f
JOIN dim_merchant m ON m.merchant_key = f.merchant_key
JOIN dim_category c ON c.category_key = f.category_key
GROUP BY m.merchant_name, c.category_name
ORDER BY total_spending DESC, m.merchant_name
LIMIT 20;

-- Purpose: Merchants ranked by distinct-customer reach (Q12 merchant_frequency)
SELECT m.merchant_name,
       COUNT(*) AS transaction_count,
       COUNT(DISTINCT f.user_key) AS unique_users,
       SUM(f.amount) AS total_spending
FROM fact_transactions f
JOIN dim_merchant m ON m.merchant_key = f.merchant_key
GROUP BY m.merchant_name
ORDER BY transaction_count DESC, m.merchant_name
LIMIT 15;

-- Purpose: Payment-method share of transaction count (Q13 payment_method_usage)
SELECT p.payment_method_name,
       COUNT(*) AS transaction_count,
       SUM(f.amount) AS total_spending,
       ROUND(COUNT(*) * 100.0 / (SELECT COUNT(*) FROM fact_transactions), 2) AS pct_of_transactions
FROM fact_transactions f
JOIN dim_payment_method p ON p.payment_method_key = f.payment_method_key
GROUP BY p.payment_method_name
ORDER BY transaction_count DESC;

-- Purpose: Payment-method preference within each category (Q14 payment_by_category)
SELECT c.category_name, p.payment_method_name,
       COUNT(*) AS transaction_count,
       SUM(f.amount) AS total_spending
FROM fact_transactions f
JOIN dim_category c ON c.category_key = f.category_key
JOIN dim_payment_method p ON p.payment_method_key = f.payment_method_key
GROUP BY c.category_name, p.payment_method_name
ORDER BY c.category_name, transaction_count DESC;

-- Purpose: Top 10 users by total spend (Q15 top10_users)
SELECT u.user_id,
       COUNT(*) AS transaction_count,
       SUM(f.amount) AS total_spending,
       ROUND(AVG(f.amount), 2) AS avg_transaction,
       MAX(f.amount) AS largest_transaction
FROM fact_transactions f
JOIN dim_user u ON u.user_key = f.user_key
GROUP BY u.user_id
ORDER BY total_spending DESC, u.user_id
LIMIT 10;

-- Purpose: Category breakdown for the five highest-spending users (Q16 top5_users_by_category)
SELECT u.user_id, c.category_name,
       COUNT(*) AS transaction_count,
       SUM(f.amount) AS total_spending
FROM fact_transactions f
JOIN dim_user u ON u.user_key = f.user_key
JOIN dim_category c ON c.category_key = f.category_key
WHERE f.user_key IN (
  SELECT user_key FROM fact_transactions
  GROUP BY user_key
  ORDER BY SUM(amount) DESC
  LIMIT 5
)
GROUP BY u.user_id, c.category_name
ORDER BY u.user_id, total_spending DESC;

-- Purpose: Month-over-month spending growth (Q17 mom_growth)
WITH monthly_spending AS (
  SELECT d.year, d.month,
         SUM(f.amount) AS total_spending
  FROM fact_transactions f
  JOIN dim_date d ON d.date_key = f.date_key
  GROUP BY d.year, d.month
)
SELECT year, month, total_spending,
       LAG(total_spending) OVER (ORDER BY year, month) AS prev_month,
       ROUND(total_spending - LAG(total_spending) OVER (ORDER BY year, month), 2) AS change_amount,
       ROUND((total_spending - LAG(total_spending) OVER (ORDER BY year, month)) * 100.0
             / NULLIF(LAG(total_spending) OVER (ORDER BY year, month), 0), 2) AS pct_change
FROM monthly_spending
ORDER BY year, month;

-- Purpose: Running spend total within each category over time (Q18 running_total_by_category)
SELECT c.category_name, d.date, f.amount,
       SUM(f.amount) OVER (
         PARTITION BY c.category_name
         ORDER BY d.date, f.transaction_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS running_total
FROM fact_transactions f
JOIN dim_date d ON d.date_key = f.date_key
JOIN dim_category c ON c.category_key = f.category_key
ORDER BY c.category_name, d.date, f.transaction_id;

-- Purpose: Transactions more than 3 standard deviations above their category mean (Q19 anomalous_transactions)
WITH category_stats AS (
  SELECT f.category_key,
         AVG(f.amount) AS avg_amount,
         STDDEV(f.amount) AS stddev_amount
  FROM fact_transactions f
  GROUP BY f.category_key
)
SELECT f.transaction_id, d.date, c.category_name, m.merchant_name, f.amount,
       ROUND(s.avg_amount, 2) AS category_avg,
       ROUND((f.amount - s.avg_amount) / NULLIF(s.stddev_amount, 0), 2) AS z_score
FROM fact_transactions f
JOIN category_stats s ON s.category_key = f.category_key
JOIN dim_date d ON d.date_key = f.date_key
JOIN dim_category c ON c.category_key = f.category_key
JOIN dim_merchant m ON m.merchant_key = f.merchant_key
WHERE f.amount > s.avg_amount + 3 * s.stddev_amount
ORDER BY z_score DESC, f.transaction_id;

-- Purpose: Fully-described sample fact rows via the 5-way star join (Q20 sample_fact_lookup)
SELECT f.transaction_id, d.date, c.category_name, m.merchant_name,
       p.payment_method_name, u.user_id, f.amount
FROM fact_transactions f
JOIN dim_date d ON d.date_key = f.date_key
JOIN dim_category c ON c.category_key = f.category_key
JOIN dim_merchant m ON m.merchant_key = f.merchant_key
JOIN dim_payment_method p ON p.payment_method_key = f.payment_method_key
JOIN dim_user u ON u.user_key = f.user_key
ORDER BY f.transaction_id
LIMIT 5;
