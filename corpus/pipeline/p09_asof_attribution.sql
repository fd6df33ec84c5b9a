-- Backward as-of join in pure SQL: each click attributed to the user's
-- most recent purchase at-or-before it (engine extension; the DataFrame
-- twin is operators/asof.asof_join_backward — same union+window trick,
-- one shuffle on user_id, no pair-space materialization)
WITH clicks AS (
  SELECT event_id AS click_id, user_id, ts AS click_ts
  FROM ${database}.${schema}.events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, ts AS purchase_ts, max(event_id) AS purchase_id
  FROM ${database}.${schema}.events WHERE event_type = 'purchase'
  GROUP BY user_id, ts
),
tagged AS (
  SELECT user_id, click_ts AS ts, 1 AS side, click_id,
         CAST(NULL AS BIGINT) AS purchase_id,
         CAST(NULL AS TIMESTAMP_NTZ) AS purchase_ts
  FROM clicks
  UNION ALL
  SELECT user_id, purchase_ts AS ts, 0 AS side, CAST(NULL AS BIGINT),
         purchase_id, purchase_ts
  FROM purchases
),
carried AS (
  SELECT user_id, ts, side, click_id,
         last_value(purchase_id, true) OVER w AS purchase_id,
         last_value(purchase_ts, true) OVER w AS purchase_ts
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, side
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT click_id, user_id, ts AS click_ts, purchase_id, purchase_ts
FROM carried WHERE side = 1
ORDER BY click_id
