"""Registry entries for the late-r4 extension families: temporal
joins (aj1 as-of, rj1 interval-overlap — operators/timejoin.py),
distributive statistics (sk1/sk2 KMV sketches, q1 exact quantiles —
operators/stats.py), curation and text scoring (w1 weighted sampling,
tf1 TF-IDF keywords, t10 familiarity — operators/curate.py,
operators/textops.py), and event analytics (fun1 funnel, coh1 cohort
retention — operators/events.py).

Oracle notes: aj1 is checked against DuckDB's NATIVE ``ASOF JOIN``
(the right side is pre-aggregated to one row per (user, day) so the
as-of match is deterministic in both engines); everything else
restates engine-neutral integer definitions (ceil-rank order
statistics, md5 min-k hash sets, ppm/bp scores — no logarithms, no
float thresholds) directly.
"""

from __future__ import annotations

from .. import tables
from ..operators import curate, stats, textops, timejoin
from .registry import TXN, register

# aj1: left as-of join — every event attributed to the user's most
# recent order-day at or before the event (union + running-window
# carry on the Spark side; native ASOF LEFT JOIN in the oracle).
register(
    "aj1_event_order_asof",
    lambda spark, sf: timejoin.event_order_asof(
        tables.load_events(spark, sf), tables.load(spark, sf, "orders")
    ),
    """
WITH q AS (
    SELECT o_custkey AS user_id, o_orderdate AS order_ts,
           cast(sum(cast(round(o_totalprice * 100) AS bigint)) AS bigint)
               AS day_total_c,
           cast(count(*) AS bigint) AS day_orders,
           cast(max(o_orderkey) AS bigint) AS last_orderkey
    FROM orders GROUP BY 1, 2
)
SELECT
    e.event_id, e.user_id, e.event_type,
    strftime(e.ts, '%Y-%m-%d %H:%M:%S')  AS ts_s,
    strftime(q.order_ts, '%Y-%m-%d')     AS order_day,
    cast(q.day_total_c / 100.0 AS double) AS order_day_total,
    q.day_orders, q.last_orderkey,
    cast(date_diff('day', cast(q.order_ts AS date), cast(e.ts AS date))
         AS bigint) AS days_since_order
FROM events e ASOF LEFT JOIN q
  ON e.user_id = q.user_id AND e.ts >= q.order_ts
""",
)

# rj1: interval-overlap range join — top-10 busiest hours widened to
# 90-minute windows, rolled up over the events each window overlaps.
# Registered with the broadcast strategy (10 intervals is
# dimension-sized); the binned both-sides-large strategy is law-tested
# equal in tests/test_timejoin.py.
register(
    "rj1_busy_window_events",
    lambda spark, sf: timejoin.busy_window_events(
        tables.load_events(spark, sf), 10
    ),
    """
WITH hours AS (
    SELECT date_trunc('hour', ts) AS h, cast(count(*) AS bigint)
        AS hour_events
    FROM events GROUP BY 1
),
top AS (SELECT h, hour_events FROM hours ORDER BY hour_events DESC, h
        LIMIT 10),
iv AS (
    SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS interval_id, hour_events,
           h - INTERVAL 15 minute AS lo, h + INTERVAL 75 minute AS hi
    FROM top
)
SELECT iv.interval_id, iv.hour_events,
       cast(count(*) AS bigint) AS n_events,
       cast(count(DISTINCT e.user_id) AS bigint) AS n_users,
       cast(sum(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END)
            AS bigint) AS n_purchases
FROM iv JOIN events e ON e.ts >= iv.lo AND e.ts < iv.hi
GROUP BY 1, 2
""",
)

# sk1: mergeable KMV distinct-count sketch per store over item_sku,
# exact count alongside for auditability. The oracle rebuilds the
# identical min-64 md5 hash set, so the sketch CONTENTS are checked,
# not just the estimate.
register(
    "sk1_kmv_distinct_skus",
    lambda spark, sf: stats.kmv_distinct(
        tables.transactions(spark, sf), "store_id", "item_sku"
    ),
    f"""
WITH {TXN},
hashed AS (
    SELECT DISTINCT store_id AS g,
        ('0x' || substr(md5('kmv|' || cast(item_sku AS varchar)), 1, 8))
            ::bigint AS h
    FROM transactions
),
ranked AS (
    SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
    FROM hashed
),
sketch AS (
    SELECT g, cast(count(*) AS bigint) AS n_hashes_kept,
           max(CASE WHEN rn = 64 THEN h END) AS kth_hash
    FROM ranked WHERE rn <= 64 GROUP BY g
),
exact AS (
    SELECT store_id AS g, cast(count(DISTINCT item_sku) AS bigint)
        AS n_exact
    FROM transactions GROUP BY 1
),
j AS (
    SELECT s.g AS store_id, e.n_exact, s.n_hashes_kept, s.kth_hash,
        CASE WHEN s.kth_hash IS NOT NULL
             THEN (63 * 4294967296) // s.kth_hash
             ELSE s.n_hashes_kept END AS est_distinct
    FROM sketch s JOIN exact e USING (g)
)
SELECT *, cast(round(abs(est_distinct - n_exact) * 10000.0 / n_exact)
               AS bigint) AS err_bp
FROM j
""",
)

# q1: exact ceil-rank percentiles of line cents per payment method via
# value-domain compression (count per distinct value first; the window
# runs over the value domain, not the row count).
register(
    "q1_payment_quantiles",
    lambda spark, sf: stats.group_quantiles(tables.transactions(spark, sf)),
    f"""
WITH {TXN},
uni AS (
    SELECT payment_method, line_cents AS v, cast(count(*) AS bigint) AS c
    FROM transactions GROUP BY 1, 2
),
u AS (
    SELECT payment_method, v, c,
        sum(c) OVER (PARTITION BY payment_method ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS cum,
        sum(c) OVER (PARTITION BY payment_method) AS n
    FROM uni
)
SELECT payment_method,
    cast(max(n) AS bigint) AS n_lines,
    min(v) AS min_c,
    min(CASE WHEN cum >= (50 * n + 99) // 100 THEN v END) AS p50_c,
    min(CASE WHEN cum >= (90 * n + 99) // 100 THEN v END) AS p90_c,
    min(CASE WHEN cum >= (99 * n + 99) // 100 THEN v END) AS p99_c,
    max(v) AS max_c
FROM u GROUP BY 1
""",
)


# w1: quality-weighted Bernoulli downsampling — keep probability
# proportional to the t1 stopword/uniqueness quality blend (integer
# basis points), decided by a pure md5 integer compare like t6.
from .sql_text import SQL_TOKS, SQL_WINNOW_FPS, STOP_SQL  # noqa: E402

register(
    "w1_weighted_sample",
    lambda spark, sf: curate.weighted_sample(
        tables.load(spark, sf, "documents")
    ),
    f"""
WITH {SQL_TOKS},
m AS (
    SELECT t.doc_id, t.lang, d.source,
        cast(len(toks) AS bigint) AS n_tokens,
        cast(len(list_distinct(toks)) AS bigint) AS n_uniq,
        cast(len(list_filter(toks, x -> x IN {STOP_SQL})) AS bigint)
            AS n_stop
    FROM toks_t t JOIN documents d USING (doc_id)
),
w AS (
    SELECT doc_id, lang, source,
        CASE WHEN n_tokens > 0
             THEN cast(round((n_stop * 3000.0 + n_uniq * 7000.0)
                             / n_tokens) AS bigint)
             ELSE 0 END AS weight_bp
    FROM m
)
SELECT doc_id, lang, source, weight_bp
FROM w
WHERE ('0x' || substr(md5('wsample|' || cast(doc_id AS varchar)), 1, 8))
          ::bigint * 10000
      < weight_bp * 4294967296
""",
)


# tf1: per-document TF-IDF keyword extraction (top-3). Integer idf_ppm
# (round(1e6 * n_docs / df)) ranks identically to 1/df with no
# cross-engine logarithm drift; ties break on token text.
register(
    "tf1_tfidf_keywords",
    lambda spark, sf: textops.tfidf_keywords(
        tables.load(spark, sf, "documents")
    ),
    f"""
WITH {SQL_TOKS},
tok_rows AS (SELECT doc_id, unnest(toks) AS tok FROM toks_t),
tf AS (
    SELECT doc_id, tok, cast(count(*) AS bigint) AS tf
    FROM tok_rows GROUP BY 1, 2
),
dft AS (SELECT tok, cast(count(*) AS bigint) AS df FROM tf GROUP BY 1),
n AS (
    SELECT cast(count(DISTINCT doc_id) AS bigint) AS n_docs
    FROM documents
),
scored AS (
    SELECT t.doc_id, t.tok, t.tf, d.df,
        cast(round(1000000.0 * n.n_docs / d.df) AS bigint) AS idf_ppm
    FROM tf t JOIN dft d USING (tok), n
),
r AS (
    SELECT doc_id, tok, tf, df,
        cast(tf * idf_ppm AS bigint) AS score,
        row_number() OVER (
            PARTITION BY doc_id ORDER BY tf * idf_ppm DESC, tok
        ) AS rank
    FROM scored
)
SELECT doc_id, cast(rank AS bigint) AS rank, tok, tf, df, score
FROM r WHERE rank <= 3
""",
)


# sk2: range distinct-count by MERGING per-day KMV sketches — the
# materialized-sketch pattern: once the daily layer persists one
# bounded sketch row per store-day, any date range is answerable
# without rescanning facts. Oracle restates per-day min-k + re-rank.
from .registry import W_END, W_START  # noqa: E402

register(
    "sk2_kmv_range_merge",
    lambda spark, sf: stats.kmv_merge_range(
        tables.transactions(spark, sf), W_START, W_END
    ),
    f"""
WITH {TXN},
in_range AS (
    SELECT * FROM transactions
    WHERE sale_date BETWEEN '{W_START}' AND '{W_END}'
),
hashed AS (
    SELECT DISTINCT store_id, sale_date,
        ('0x' || substr(md5('kmv|' || cast(item_sku AS varchar)), 1, 8))
            ::bigint AS h
    FROM in_range
),
per_day AS (
    SELECT store_id, sale_date, h,
        row_number() OVER (
            PARTITION BY store_id, sale_date ORDER BY h
        ) AS rn
    FROM hashed
),
merged AS (
    SELECT DISTINCT store_id, h FROM per_day WHERE rn <= 64
),
reranked AS (
    SELECT store_id, h,
        row_number() OVER (PARTITION BY store_id ORDER BY h) AS rn
    FROM merged
),
sketch AS (
    SELECT store_id, cast(count(*) AS bigint) AS n_hashes_kept,
        max(CASE WHEN rn = 64 THEN h END) AS kth_hash
    FROM reranked WHERE rn <= 64 GROUP BY store_id
),
days AS (
    SELECT store_id, cast(count(DISTINCT sale_date) AS bigint)
        AS n_days_merged
    FROM in_range GROUP BY store_id
),
exact AS (
    SELECT store_id, cast(count(DISTINCT item_sku) AS bigint) AS n_exact
    FROM in_range GROUP BY store_id
),
j AS (
    SELECT s.store_id, d.n_days_merged, e.n_exact, s.kth_hash,
        CASE WHEN s.kth_hash IS NOT NULL
             THEN (63 * 4294967296) // s.kth_hash
             ELSE s.n_hashes_kept END AS est_distinct
    FROM sketch s
    JOIN days d USING (store_id)
    JOIN exact e USING (store_id)
)
SELECT store_id, n_days_merged, n_exact, kth_hash, est_distinct,
    cast(round(abs(est_distinct - n_exact) * 10000.0 / n_exact)
         AS bigint) AS err_bp
FROM j
""",
)


# sk3: pairwise assortment overlap from KMV sketches alone — the
# theta-sketch set-operation trick (tau = k-th smallest of the merged
# sketch; hashes <= tau sample A∪B uniformly, so the common fraction
# estimates Jaccard and scales to |A∩B|). Exact intersection audited.
register(
    "sk3_kmv_set_overlap",
    lambda spark, sf: stats.kmv_set_overlap(
        tables.transactions(spark, sf)
    ),
    f"""
WITH {TXN},
sku AS (SELECT DISTINCT store_id, item_sku FROM transactions),
hashed AS (
    SELECT DISTINCT store_id,
        ('0x' || substr(md5('kmv|' || cast(item_sku AS varchar)), 1, 8))
            ::bigint AS h
    FROM sku
),
kept AS (
    SELECT store_id, h FROM (
        SELECT store_id, h,
            row_number() OVER (PARTITION BY store_id ORDER BY h) AS rn
        FROM hashed
    ) WHERE rn <= 64
),
pairs AS (
    SELECT a.store_id AS store_a, b.store_id AS store_b
    FROM (SELECT DISTINCT store_id FROM kept) a
    JOIN (SELECT DISTINCT store_id FROM kept) b
      ON a.store_id < b.store_id
),
pu AS (
    SELECT p.store_a, p.store_b, k.h,
        max(CASE WHEN k.store_id = p.store_a THEN 1 ELSE 0 END) AS in_a,
        max(CASE WHEN k.store_id = p.store_b THEN 1 ELSE 0 END) AS in_b
    FROM pairs p
    JOIN kept k ON k.store_id IN (p.store_a, p.store_b)
    GROUP BY 1, 2, 3
),
ranked AS (
    SELECT *,
        row_number() OVER (
            PARTITION BY store_a, store_b ORDER BY h) AS rn,
        count(*) OVER (PARTITION BY store_a, store_b) AS n_union
    FROM pu
),
sp AS (
    SELECT store_a, store_b,
        cast(least(max(n_union), 64) AS bigint) AS n_kept,
        max(CASE WHEN rn = least(n_union, 64) THEN h END) AS tau,
        max(n_union) AS n_union_total
    FROM ranked GROUP BY 1, 2
),
common AS (
    SELECT r.store_a, r.store_b,
        cast(count(CASE WHEN r.in_a = 1 AND r.in_b = 1
                        AND r.h <= s.tau THEN 1 END) AS bigint)
            AS n_common
    FROM ranked r
    JOIN sp s ON s.store_a = r.store_a AND s.store_b = r.store_b
    GROUP BY 1, 2
),
est AS (
    SELECT s.store_a, s.store_b, s.n_kept, s.tau, c.n_common,
        cast(CASE WHEN s.n_union_total > 64
                  THEN (63 * 4294967296) // s.tau
                  ELSE s.n_kept END AS bigint) AS est_union
    FROM sp s
    JOIN common c ON c.store_a = s.store_a AND c.store_b = s.store_b
),
exact AS (
    SELECT a.store_id AS store_a, b.store_id AS store_b,
        cast(count(*) AS bigint) AS n_exact_inter
    FROM sku a JOIN sku b USING (item_sku)
    WHERE a.store_id < b.store_id
    GROUP BY 1, 2
)
SELECT e.store_a, e.store_b, e.n_kept, e.tau, e.n_common, e.est_union,
    cast(e.n_common * e.est_union // e.n_kept AS bigint) AS est_inter,
    cast(coalesce(x.n_exact_inter, 0) AS bigint) AS n_exact_inter
FROM est e
LEFT JOIN exact x
  ON x.store_a = e.store_a AND x.store_b = e.store_b
""",
)


# qr2: assortment-cardinality drift alarms from MERGED KMV sketches —
# the composite proving the sketch layers compose (the monitoring
# query a pipeline schedules: two window estimates off the per-day
# sketch layer, no fact rescans, no exact distincts). Window A is the
# week before the registry's standard serving window B.
QR2_START_A, QR2_END_A = "2001-06-16", "2001-06-22"


def _kmv_window_chain(prefix: str, start: str, end: str) -> str:
    """The sk2 per-day-min-k + re-rank merge chain for one date
    window, CTEs prefixed so two windows coexist in one query."""
    return f"""
{prefix}hashed AS (
    SELECT DISTINCT store_id, sale_date,
        ('0x' || substr(md5('kmv|' || cast(item_sku AS varchar)), 1, 8))
            ::bigint AS h
    FROM transactions
    WHERE sale_date BETWEEN '{start}' AND '{end}'
),
{prefix}per_day AS (
    SELECT store_id, sale_date, h,
        row_number() OVER (
            PARTITION BY store_id, sale_date ORDER BY h
        ) AS rn
    FROM {prefix}hashed
),
{prefix}merged AS (
    SELECT DISTINCT store_id, h FROM {prefix}per_day WHERE rn <= 64
),
{prefix}reranked AS (
    SELECT store_id, h,
        row_number() OVER (PARTITION BY store_id ORDER BY h) AS rn
    FROM {prefix}merged
),
{prefix}sketch AS (
    SELECT store_id, cast(count(*) AS bigint) AS n_hashes_kept,
        max(CASE WHEN rn = 64 THEN h END) AS kth_hash
    FROM {prefix}reranked WHERE rn <= 64 GROUP BY store_id
),
{prefix}days AS (
    SELECT store_id, cast(count(DISTINCT sale_date) AS bigint) AS n_days
    FROM {prefix}hashed GROUP BY store_id
),
{prefix}est AS (
    SELECT s.store_id, d.n_days,
        CASE WHEN s.kth_hash IS NOT NULL
             THEN (63 * 4294967296) // s.kth_hash
             ELSE s.n_hashes_kept END AS est_distinct
    FROM {prefix}sketch s JOIN {prefix}days d USING (store_id)
)"""


register(
    "qr2_cardinality_drift",
    lambda spark, sf: stats.kmv_cardinality_drift(
        tables.transactions(spark, sf),
        QR2_START_A, QR2_END_A, W_START, W_END,
    ),
    f"""
WITH {TXN},
{_kmv_window_chain('a_', QR2_START_A, QR2_END_A)},
{_kmv_window_chain('b_', W_START, W_END)},
j AS (
    SELECT coalesce(a.store_id, b.store_id) AS store_id,
        cast(coalesce(a.n_days, 0) AS bigint) AS days_a,
        cast(coalesce(b.n_days, 0) AS bigint) AS days_b,
        cast(coalesce(a.est_distinct, 0) AS bigint) AS est_a,
        cast(coalesce(b.est_distinct, 0) AS bigint) AS est_b
    FROM a_est a FULL JOIN b_est b ON a.store_id = b.store_id
)
SELECT store_id, days_a, days_b, est_a, est_b,
    abs(est_b - est_a) * 10000 // greatest(est_a, 1) AS drift_bp,
    cast(abs(est_b - est_a) * 10000 // greatest(est_a, 1) >= 1000
         AS bigint) AS is_alarm
FROM j
""",
)


# t10: corpus-familiarity score — frequency-weighted average token
# commonness (docs-per-million), the logarithm-free perplexity-filter
# stand-in; rarest-token df rides along as the tail indicator.
register(
    "t10_familiarity",
    lambda spark, sf: textops.familiarity_score(
        tables.load(spark, sf, "documents")
    ),
    f"""
WITH {SQL_TOKS},
tok_rows AS (SELECT doc_id, unnest(toks) AS tok FROM toks_t),
dfreq AS (
    SELECT tok, cast(count(*) AS bigint) AS df
    FROM (SELECT DISTINCT doc_id, tok FROM tok_rows)
    GROUP BY tok
),
n AS (
    SELECT cast(count(DISTINCT doc_id) AS bigint) AS n_docs
    FROM documents
),
dpm AS (
    SELECT tok, df,
        cast(round(df * 1000000.0 / n_docs) AS bigint) AS dpm
    FROM dfreq, n
),
per_doc AS (
    SELECT t.doc_id,
        cast(count(*) AS bigint) AS n_tokens,
        cast(round(sum(p.dpm) * 1.0 / count(*)) AS bigint)
            AS familiarity_dpm,
        min(p.df) AS min_tok_df
    FROM tok_rows t JOIN dpm p USING (tok)
    GROUP BY t.doc_id
)
SELECT d.doc_id, d.lang, p.n_tokens, p.familiarity_dpm, p.min_tok_df
FROM per_doc p JOIN documents d USING (doc_id)
""",
)


# fun1: strict sequential event funnel (view -> click -> purchase,
# first-touch per step), integer basis-point conversion rates.
from ..operators import events as ev_ops  # noqa: E402

register(
    "fun1_event_funnel",
    lambda spark, sf: ev_ops.event_funnel(tables.load_events(spark, sf)),
    """
WITH s1 AS (
    SELECT user_id, min(ts) AS t FROM events
    WHERE event_type = 'view' GROUP BY 1
),
s2 AS (
    SELECT e.user_id, min(e.ts) AS t
    FROM events e JOIN s1 ON e.user_id = s1.user_id
    WHERE e.event_type = 'click' AND e.ts >= s1.t
    GROUP BY 1
),
s3 AS (
    SELECT e.user_id, min(e.ts) AS t
    FROM events e JOIN s2 ON e.user_id = s2.user_id
    WHERE e.event_type = 'purchase' AND e.ts >= s2.t
    GROUP BY 1
),
counts AS (
    SELECT cast(1 AS bigint) AS step_order, 'view' AS step,
           (SELECT cast(count(*) AS bigint) FROM s1) AS n_users
    UNION ALL
    SELECT cast(2 AS bigint), 'click',
           (SELECT cast(count(*) AS bigint) FROM s2)
    UNION ALL
    SELECT cast(3 AS bigint), 'purchase',
           (SELECT cast(count(*) AS bigint) FROM s3)
)
SELECT step_order, step, n_users,
    cast(round(n_users * 10000.0 /
               first_value(n_users) OVER (ORDER BY step_order))
         AS bigint) AS conv_from_first_bp,
    CASE WHEN lag(n_users) OVER (ORDER BY step_order) IS NOT NULL
         THEN cast(round(n_users * 10000.0 /
                         lag(n_users) OVER (ORDER BY step_order))
              AS bigint) END AS conv_from_prev_bp
FROM counts
""",
)


# coh1: weekly cohort retention — cohort = ISO week of first event;
# retention_bp = active share of cohort at each week offset.
register(
    "coh1_cohort_retention",
    lambda spark, sf: ev_ops.cohort_retention(tables.load_events(spark, sf)),
    """
WITH first AS (
    SELECT user_id, date_trunc('week', min(ts)) AS cohort_wk
    FROM events GROUP BY 1
),
active AS (
    SELECT DISTINCT user_id, date_trunc('week', ts) AS active_wk
    FROM events
),
g AS (
    SELECT f.cohort_wk, a.active_wk,
           cast(count(DISTINCT a.user_id) AS bigint) AS n_active
    FROM active a JOIN first f ON a.user_id = f.user_id
    GROUP BY 1, 2
),
sizes AS (
    SELECT cohort_wk, cast(count(DISTINCT user_id) AS bigint)
        AS cohort_size
    FROM first GROUP BY 1
)
SELECT
    strftime(g.cohort_wk, '%Y-%m-%d') AS cohort_week,
    cast(date_diff('day', cast(g.cohort_wk AS date),
                   cast(g.active_wk AS date)) / 7 AS bigint)
        AS week_offset,
    s.cohort_size,
    g.n_active,
    cast(round(g.n_active * 10000.0 / s.cohort_size) AS bigint)
        AS retention_bp
FROM g JOIN sizes s ON g.cohort_wk = s.cohort_wk
""",
)


# pr1: fixed-point PageRank, oracle = the same five update steps
# unrolled (clustering.py's _kmeans_lloyd_sql pattern): every rank
# value hash-checks, not just the row set.
from ..operators import graph as graph_ops  # noqa: E402


def _pagerank_sql(n_iter: int = 5, top_k: int = 20) -> str:
    scale, damp = graph_ops.SCALE, graph_ops.DAMP_PM
    parts = [
        f"""
pairs AS (
    SELECT DISTINCT o.o_custkey * 2 AS c_node,
                    l.l_suppkey * 2 + 1 AS s_node
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
edges AS (
    SELECT c_node AS src, s_node AS dst FROM pairs
    UNION ALL
    SELECT s_node AS src, c_node AS dst FROM pairs
),
deg AS (
    SELECT src, cast(count(*) AS bigint) AS outdeg
    FROM edges GROUP BY 1
),
n AS (SELECT cast(count(*) AS bigint) AS n_nodes FROM deg),
b AS (
    SELECT (({scale} // n_nodes) * {1000 - damp}) // 1000 AS base
    FROM n
),
r0 AS (
    SELECT src AS node, {scale} // n_nodes AS r FROM deg, n
)"""
    ]
    for t in range(1, n_iter + 1):
        parts.append(
            f"""
r{t} AS (
    SELECT e.dst AS node,
        cast((SELECT base FROM b)
             + sum(((r.r * {damp}) // 1000) // d.outdeg)
             AS bigint) AS r
    FROM edges e
    JOIN r{t - 1} r ON e.src = r.node
    JOIN deg d ON e.src = d.src
    GROUP BY 1
)"""
        )
    parts.append(
        f"""
stores AS (
    SELECT (node - 1) // 2 AS supp_key, r AS rank_fp
    FROM r{n_iter} WHERE node % 2 = 1
),
ind AS (
    SELECT (dst - 1) // 2 AS supp_key,
           cast(count(*) AS bigint) AS n_customers
    FROM edges WHERE dst % 2 = 1 GROUP BY 1
)"""
    )
    return (
        "WITH "
        + ",".join(parts)
        + f"""
SELECT cast(row_number() OVER (ORDER BY t.rank_fp DESC, t.supp_key)
            AS bigint) AS rank_pos,
       t.supp_key, t.rank_fp, i.n_customers
FROM stores t JOIN ind i USING (supp_key)
ORDER BY t.rank_fp DESC, t.supp_key
LIMIT {top_k}
"""
    )


register(
    "pr1_pagerank_stores",
    lambda spark, sf: graph_ops.pagerank(
        tables.load(spark, sf, "lineitem"), tables.load(spark, sf, "orders")
    ),
    _pagerank_sql(),
)


# aj2: forward as-of — each order attributed to the customer's first
# event at or after it; oracle = DuckDB native forward ASOF
# (ON o.ts <= e.ts picks the smallest matching event time).
register(
    "aj2_order_next_event",
    lambda spark, sf: timejoin.order_next_event(
        tables.load(spark, sf, "orders"), tables.load_events(spark, sf)
    ),
    """
WITH ev AS (
    SELECT user_id, ts AS ev_ts,
           cast(min(event_id) AS bigint) AS first_event_id,
           arg_min(event_type, event_id) AS event_type
    FROM events GROUP BY 1, 2
)
SELECT
    o.o_orderkey,
    o.o_custkey AS user_id,
    strftime(o.o_orderdate, '%Y-%m-%d') AS order_day,
    strftime(e.ev_ts, '%Y-%m-%d %H:%M:%S') AS next_event_ts,
    e.first_event_id,
    e.event_type,
    cast(date_diff('day', cast(o.o_orderdate AS date),
                   cast(e.ev_ts AS date)) AS bigint) AS days_until_event
FROM orders o ASOF LEFT JOIN ev e
  ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ev_ts
""",
)


# d11: containment scoring (near-subset detection) over the MinHash
# candidate pairs — per-mille integer scores, float-free threshold.
from ..operators import dedup as dedup_ops  # noqa: E402
from .sql_text import SQL_LSH_PAIRS  # noqa: E402

register(
    "d11_containment",
    lambda spark, sf: dedup_ops.containment_pairs(
        tables.load(spark, sf, "documents")
    ),
    f"""
WITH {SQL_LSH_PAIRS},
scored AS (
    SELECT
        p.doc_a,
        p.doc_b,
        cast(len(list_filter(a.sh, x -> list_contains(b.sh, x)))
             AS bigint) AS shingles_common,
        cast(len(a.sh) AS bigint) AS n_a,
        cast(len(b.sh) AS bigint) AS n_b
    FROM pairs p
    JOIN sh_t a ON a.doc_id = p.doc_a
    JOIN sh_t b ON b.doc_id = p.doc_b
)
SELECT *,
    cast(round(shingles_common * 1000.0 / n_a) AS bigint)
        AS containment_a_pm,
    cast(round(shingles_common * 1000.0 / n_b) AS bigint)
        AS containment_b_pm
FROM scored
WHERE greatest(cast(round(shingles_common * 1000.0 / n_a) AS bigint),
               cast(round(shingles_common * 1000.0 / n_b) AS bigint))
      >= 800
""",
)


# co1: basket co-purchase top-3 per SKU — the item-item CF
# neighborhood; bounded pair explosion (self-join keyed on the
# transaction, basket sizes are single digits).
from ..operators import joins as joins_ops  # noqa: E402

register(
    "co1_sku_copurchase",
    lambda spark, sf: joins_ops.sku_copurchase_topk(
        tables.transactions(spark, sf)
    ),
    f"""
WITH {TXN},
ts AS (SELECT DISTINCT transaction_id, item_sku FROM transactions),
pairs AS (
    SELECT a.item_sku, b.item_sku AS partner_sku
    FROM ts a JOIN ts b
      ON a.transaction_id = b.transaction_id
     AND a.item_sku != b.item_sku
),
co AS (
    SELECT item_sku, partner_sku, cast(count(*) AS bigint) AS co_count
    FROM pairs GROUP BY 1, 2
),
r AS (
    SELECT item_sku, partner_sku, co_count,
        cast(row_number() OVER (
            PARTITION BY item_sku ORDER BY co_count DESC, partner_sku
        ) AS bigint) AS rank
    FROM co
)
SELECT item_sku, rank, partner_sku, co_count
FROM r WHERE rank <= 3
""",
)


# co2: co-purchase top-3 for orders STARTED in a date range, answered
# by merging the per-order_date partial layer (co_pair_daily ->
# co_merge_topk — the daily-materialize pattern of sk2/hll2 extended
# to the item-item CF matrix; additivity laws in
# tests/test_copurchase_daily.py). The oracle restates the SEMANTIC
# definition instead — co1 over exactly the orders whose first line
# date falls in the range, all their lines kept — so the check is an
# independent cross-derivation, not an echo of the partial algebra.
# Range: the final two years of the corpus (~15% of orders at sf0.01,
# 918 result rows) — wide enough that the merge is a real
# re-aggregation, narrow enough that the range filter provably bites
# (co1 full = 6000 rows).
CO2_START, CO2_END = "2000-01-01", "2001-12-31"

register(
    "co2_copurchase_range_merge",
    lambda spark, sf: joins_ops.co_range_topk(
        tables.transactions(spark, sf), CO2_START, CO2_END
    ),
    f"""
WITH {TXN},
odate AS (
    SELECT transaction_id, min(sale_date) AS order_date
    FROM transactions GROUP BY 1
),
qual AS (
    SELECT transaction_id FROM odate
    WHERE order_date BETWEEN '{CO2_START}' AND '{CO2_END}'
),
ts AS (
    SELECT DISTINCT t.transaction_id, t.item_sku
    FROM transactions t JOIN qual q USING (transaction_id)
),
pairs AS (
    SELECT a.item_sku, b.item_sku AS partner_sku
    FROM ts a JOIN ts b
      ON a.transaction_id = b.transaction_id
     AND a.item_sku != b.item_sku
),
co AS (
    SELECT item_sku, partner_sku, cast(count(*) AS bigint) AS co_count
    FROM pairs GROUP BY 1, 2
),
r AS (
    SELECT item_sku, partner_sku, co_count,
        cast(row_number() OVER (
            PARTITION BY item_sku ORDER BY co_count DESC, partner_sku
        ) AS bigint) AS rank
    FROM co
)
SELECT item_sku, rank, partner_sku, co_count
FROM r WHERE rank <= 3
""",
)


# a19: day-of-week seasonality per store — dow 0-6 Sunday-first
# (DuckDB strftime '%w' convention), two-step integer rounding keeps
# the index ratio in exact double range.
from ..operators import history as history_ops  # noqa: E402
from .registry import SQL_STORE_DAILY  # noqa: E402

register(
    "a19_dow_seasonality",
    lambda spark, sf: history_ops.dow_seasonality(
        tables.transactions(spark, sf)
    ),
    f"""
WITH {TXN},
{SQL_STORE_DAILY},
d AS (
    SELECT store_id, sale_date, sales_c,
        cast(strftime(cast(sale_date AS date), '%w') AS int) AS dow
    FROM store_daily
),
per_dow AS (
    SELECT store_id, dow,
        cast(count(*) AS bigint) AS n_days,
        cast(round(sum(sales_c) * 1.0 / count(*)) AS bigint) AS avg_c
    FROM d GROUP BY 1, 2
),
per_store AS (
    SELECT store_id,
        cast(round(sum(sales_c) * 1.0 / count(*)) AS bigint)
            AS store_avg_c
    FROM d GROUP BY 1
)
SELECT p.store_id, p.dow, p.n_days,
    cast(p.avg_c / 100.0 AS double) AS avg_sales,
    cast(round(p.avg_c * 10000.0 / s.store_avg_c) AS bigint)
        AS dow_index_bp
FROM per_dow p JOIN per_store s USING (store_id)
""",
)


# cube1: CUBE grouping sets over (store, payment) — subtotal and
# grand-total rows in one pass. The reference has no grouping-sets
# surface (SURVEY §2.4 note); Spark plans CUBE as a single Expand +
# hash aggregate, the scalable form of the four separate group-bys a
# serving layer would otherwise run. grouping() flags disambiguate
# genuine NULL keys from subtotal rows.
from pyspark.sql import functions as _F


def _cube_store_payment(spark, sf):
    txns = tables.transactions(spark, sf)
    # grouping() is only legal inside the cube's own aggregate list
    return txns.cube("store_id", "payment_method").agg(
        _F.grouping("store_id").cast("long").alias("g_store"),
        _F.grouping("payment_method").cast("long").alias("g_pay"),
        _F.sum("line_cents").alias("sales_c"),
        _F.count(_F.lit(1)).alias("n_lines"),
    )


register(
    "cube1_store_payment_cube",
    _cube_store_payment,
    f"""
WITH {TXN}
SELECT store_id, payment_method,
    cast(grouping(store_id) AS bigint)       AS g_store,
    cast(grouping(payment_method) AS bigint) AS g_pay,
    cast(sum(line_cents) AS bigint)          AS sales_c,
    cast(count(*) AS bigint)                 AS n_lines
FROM transactions
GROUP BY CUBE (store_id, payment_method)
""",
)


# u2: INTERSECT / EXCEPT — the set-op surface beyond u1's unionByName.
# Assortment overlap between the first two stores: SKUs both carry,
# and each side's exclusives, tagged and unioned into one result.
def _setops_assortment(spark, sf):
    txns = tables.transactions(spark, sf)
    a = txns.filter(_F.col("store_id") == "0001").select("item_sku").distinct()
    b = txns.filter(_F.col("store_id") == "0002").select("item_sku").distinct()
    tag = lambda df, t: df.select(  # noqa: E731
        _F.lit(t).alias("op"), _F.col("item_sku")
    )
    return (
        tag(a.intersect(b), "both")
        .unionByName(tag(a.subtract(b), "only_0001"))
        .unionByName(tag(b.subtract(a), "only_0002"))
    )


register(
    "u2_setops_assortment",
    _setops_assortment,
    f"""
WITH {TXN},
a AS (SELECT DISTINCT item_sku FROM transactions WHERE store_id = '0001'),
b AS (SELECT DISTINCT item_sku FROM transactions WHERE store_id = '0002')
SELECT 'both' AS op, item_sku FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
UNION ALL
SELECT 'only_0001', item_sku FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
UNION ALL
SELECT 'only_0002', item_sku FROM (SELECT * FROM b EXCEPT SELECT * FROM a)
""",
)


# tri1: triangle census of the top-3 co-purchase graph (the co1
# neighborhood's coherence diagnostic; bounded <= 3n edges so the
# wedge join never hits the |E|^1.5 open-graph triangle cost).
from ..operators import graph as graph_ops  # noqa: E402

register(
    "tri1_copurchase_triangles",
    lambda spark, sf: graph_ops.copurchase_triangles(
        tables.transactions(spark, sf)
    ),
    f"""
WITH {TXN},
ts AS (SELECT DISTINCT transaction_id, item_sku FROM transactions),
pairs AS (
    SELECT a.item_sku AS s1, b.item_sku AS s2
    FROM ts a JOIN ts b
      ON a.transaction_id = b.transaction_id
     AND a.item_sku != b.item_sku
),
co AS (SELECT s1, s2, cast(count(*) AS bigint) AS c
       FROM pairs GROUP BY 1, 2),
r AS (
    SELECT s1, s2, c,
        row_number() OVER (PARTITION BY s1 ORDER BY c DESC, s2) AS rk
    FROM co
),
topk AS (SELECT s1, s2, c FROM r WHERE rk <= 3),
und AS (
    SELECT least(s1, s2) AS a, greatest(s1, s2) AS b,
           cast(max(c) AS bigint) AS w
    FROM topk GROUP BY 1, 2
)
SELECT e1.a AS sku_a, e1.b AS sku_b, e2.b AS sku_c,
       least(e1.w, least(e2.w, e3.w)) AS min_support
FROM und e1
JOIN und e2 ON e2.a = e1.a AND e1.b < e2.b
JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b
""",
)


# tri2: the same triangle census restricted to orders STARTED in the
# co2 range, composed from the daily partial layer
# (co_pair_daily -> range filter -> co_merge_topk ->
# triangles_from_topk) — the maintained-pipeline form that never
# rescans facts (sf10: 4.8 s off partials vs 29 s off facts,
# benchmarks/co_merge_r9_sf10.json). Oracle cross-derives from the
# semantic definition (qualifying orders), not the partial algebra.
register(
    "tri2_triangles_range",
    lambda spark, sf: graph_ops.triangles_from_topk(
        joins_ops.co_range_topk(
            tables.transactions(spark, sf), CO2_START, CO2_END
        )
    ),
    f"""
WITH {TXN},
odate AS (
    SELECT transaction_id, min(sale_date) AS order_date
    FROM transactions GROUP BY 1
),
qual AS (
    SELECT transaction_id FROM odate
    WHERE order_date BETWEEN '{CO2_START}' AND '{CO2_END}'
),
ts AS (
    SELECT DISTINCT t.transaction_id, t.item_sku
    FROM transactions t JOIN qual q USING (transaction_id)
),
pairs AS (
    SELECT a.item_sku AS s1, b.item_sku AS s2
    FROM ts a JOIN ts b
      ON a.transaction_id = b.transaction_id
     AND a.item_sku != b.item_sku
),
co AS (SELECT s1, s2, cast(count(*) AS bigint) AS c
       FROM pairs GROUP BY 1, 2),
r AS (
    SELECT s1, s2, c,
        row_number() OVER (PARTITION BY s1 ORDER BY c DESC, s2) AS rk
    FROM co
),
topk AS (SELECT s1, s2, c FROM r WHERE rk <= 3),
und AS (
    SELECT least(s1, s2) AS a, greatest(s1, s2) AS b,
           cast(max(c) AS bigint) AS w
    FROM topk GROUP BY 1, 2
)
SELECT e1.a AS sku_a, e1.b AS sku_b, e2.b AS sku_c,
       least(e1.w, least(e2.w, e3.w)) AS min_support
FROM und e1
JOIN und e2 ON e2.a = e1.a AND e1.b < e2.b
JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b
""",
)


# cm1: range heavy users from merged per-day count-min sketches —
# the FREQUENCY member of the materialize+merge family (sk2 distinct,
# hll2 distinct-at-fixed-space, hist2 quantiles): per-day d x w
# counter grids merge by addition, the candidate union bounds the
# probe set, and the estimate min_d(counter[h_d(u)]) is integer
# arithmetic over md5 slots — sketch contents hash-checked across
# engines, not just the top-k. The exact count rides along (sk1/sk2
# precedent) and pins the one-sided error law est >= exact.
register(
    "cm1_range_heavy_users",
    lambda spark, sf: stats.cm_range_heavy_users(
        tables.load_events(spark, sf), "2024-01-08", "2024-01-21"
    ),
    """
WITH ev AS (
    SELECT cast(ts AS DATE) AS day, user_id FROM events
    WHERE cast(ts AS DATE) BETWEEN '2024-01-08' AND '2024-01-21'
),
per_user AS (
    SELECT day, user_id, cast(count(*) AS bigint) AS cnt
    FROM ev GROUP BY 1, 2
),
depths AS (SELECT unnest([0, 1, 2, 3]) AS depth),
counters AS (
    SELECT depth,
        ('0x' || substr(md5('cm' || depth || '|'
                            || cast(user_id AS varchar)), 1, 8))
            ::bigint % 256 AS slot,
        cast(sum(cnt) AS bigint) AS c
    FROM per_user, depths GROUP BY 1, 2
),
cand AS (
    SELECT DISTINCT user_id FROM (
        SELECT day, user_id,
            row_number() OVER (
                PARTITION BY day ORDER BY cnt DESC, user_id
            ) AS rn
        FROM per_user
    ) WHERE rn <= 20
),
probes AS (
    SELECT user_id, depth,
        ('0x' || substr(md5('cm' || depth || '|'
                            || cast(user_id AS varchar)), 1, 8))
            ::bigint % 256 AS slot
    FROM cand, depths
),
est AS (
    SELECT p.user_id, min(c.c) AS est_events
    FROM probes p JOIN counters c USING (depth, slot) GROUP BY 1
),
exact AS (
    SELECT user_id, cast(count(*) AS bigint) AS n_exact
    FROM ev GROUP BY 1
),
r AS (
    SELECT e.user_id, e.est_events, x.n_exact,
        row_number() OVER (ORDER BY e.est_events DESC, e.user_id)
            AS rank
    FROM est e JOIN exact x USING (user_id)
)
SELECT user_id, cast(rank AS bigint) AS rank, est_events, n_exact,
    cast(round((est_events - n_exact) * 10000.0 / n_exact) AS bigint)
        AS over_bp
FROM r WHERE rank <= 10
""",
)


# wn1: MOSS winnowing overlap — k-gram window-min fingerprints, pair
# report per fingerprint bucket with the stop-gram df cap; the
# partial-overlap / quotation detector (containment at passage
# granularity, where whole-doc Jaccard dilutes away a shared
# paragraph). Parameters frozen in both engines: k=4, w=4,
# max_df in [2, 50], min_shared=2.
register(
    "wn1_winnow_overlap",
    lambda spark, sf: textops.winnow_overlap(
        tables.load(spark, sf, "documents")
    ),
    f"""
WITH {SQL_WINNOW_FPS},
dft AS (
    SELECT fp, cast(count(*) AS bigint) AS df FROM fps GROUP BY fp
),
keep AS (
    SELECT f.doc_id, f.fp
    FROM fps f JOIN dft d USING (fp)
    WHERE d.df BETWEEN 2 AND 50
),
shared AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        cast(count(*) AS bigint) AS n_shared
    FROM keep a JOIN keep b USING (fp)
    WHERE a.doc_id < b.doc_id
    GROUP BY 1, 2
),
nfp AS (
    SELECT doc_id, cast(count(*) AS bigint) AS n_fp
    FROM fps GROUP BY doc_id
)
SELECT s.doc_a, s.doc_b, s.n_shared,
    na.n_fp AS n_fp_a, nb.n_fp AS n_fp_b,
    1000 * s.n_shared // least(na.n_fp, nb.n_fp) AS overlap_pm
FROM shared s
JOIN nfp na ON s.doc_a = na.doc_id
JOIN nfp nb ON s.doc_b = nb.doc_id
WHERE s.n_shared >= 2
""",
)


# wn2: winnow-based benchmark decontamination — the passage-level
# companion to d8: any >= 7-token verbatim run copied from a heldout
# (1/8 md5-split, same rule as d8) benchmark doc is guaranteed a
# shared fingerprint; flags training docs with >= 1 benchmark hit.
register(
    "wn2_winnow_decontaminate",
    lambda spark, sf: textops.winnow_decontaminate(
        tables.load(spark, sf, "documents")
    ),
    f"""
WITH {SQL_WINNOW_FPS},
m AS (
    SELECT doc_id, fp,
        substr(md5('bench|' || cast(doc_id AS varchar)), 32, 1)
            IN ('0', '1') AS is_bench
    FROM fps
),
bench AS (SELECT DISTINCT fp FROM m WHERE is_bench),
per_doc AS (
    SELECT t.doc_id,
        cast(count(*) AS bigint) AS n_fp,
        cast(count(b.fp) AS bigint) AS n_hit
    FROM m t LEFT JOIN bench b ON t.fp = b.fp
    WHERE NOT t.is_bench
    GROUP BY t.doc_id
)
SELECT p.doc_id, d.lang, p.n_fp, p.n_hit,
    1000 * p.n_hit // p.n_fp AS hit_pm
FROM per_doc p JOIN documents d USING (doc_id)
WHERE p.n_hit >= 1
""",
)
