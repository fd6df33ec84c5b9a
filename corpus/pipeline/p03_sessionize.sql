-- Sessionization via lag + running sum (engine extension)
WITH seq AS (
  SELECT user_id, ts,
         CASE WHEN cast(cast(ts AS TIMESTAMP) AS DOUBLE) - lag(cast(cast(ts AS TIMESTAMP) AS DOUBLE))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
                OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session,
         event_id
  FROM ${database}.${schema}.events),
sess AS (SELECT user_id,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         FROM seq)
SELECT user_id, session_id, count(*) AS n_events
FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id
