-- Hourly event rollup (batch twin of the streaming aggregate)
SELECT date_trunc('hour', cast(ts AS TIMESTAMP)) AS hour, event_type,
       count(*) AS n_events,
       round(sum(cast(value AS DECIMAL(18,4))), 2) AS total_value
FROM ${database}.${schema}.events
GROUP BY 1, 2 ORDER BY 1, 2
