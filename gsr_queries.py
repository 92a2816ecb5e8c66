"""Query batch 2: aggregation / window / text / embedding operators with
DuckDB oracles (merged into ``__spark_entry__.queries()``).

Every Spark query aliases its columns identically to the oracle SQL; float
aggregates are rounded on both sides.  Shared arithmetic is written so both
engines evaluate the same IEEE double expression tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# A1: area-weighted mean — the resample-aggregate shape as SQL over an
# exploded pixel table (FIXTURES.md §4): weight = fractional area
# ---------------------------------------------------------------------------

def q_a1_weighted_mean(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    px = (li.withColumn("out_cell", F.expr("CAST(l_orderkey % 500 AS INT)"))
            .withColumn("v", F.col("l_quantity"))
            .withColumn("wgt", F.expr("CAST(0.25 + (l_linenumber % 4) * 0.25 AS DOUBLE)")))
    return (px.groupBy("out_cell")
              .agg(F.round(F.sum(F.col("v") * F.col("wgt")) / F.sum("wgt"), 6).alias("wmean"),
                   F.count("*").alias("n_px")))


SQL_A1 = """
WITH px AS (
  SELECT CAST(l_orderkey % 500 AS INT) AS out_cell,
         l_quantity AS v,
         CAST(0.25 + (l_linenumber % 4) * 0.25 AS DOUBLE) AS wgt
  FROM lineitem
)
SELECT out_cell, ROUND(SUM(v * wgt) / SUM(wgt), 6) AS wmean, COUNT(*) AS n_px
FROM px GROUP BY 1
"""


# ---------------------------------------------------------------------------
# A5: majority (dominated) per cell — groupBy + rank=1
# ---------------------------------------------------------------------------

def q_a5_mode(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    cell = F.expr("CAST(l_orderkey % 50 AS INT)")
    counts = (li.withColumn("cell", cell)
                .groupBy("cell", "l_returnflag")
                .agg(F.count("*").alias("cnt")))
    w = Window.partitionBy("cell").orderBy(F.col("cnt").desc(), F.col("l_returnflag").asc())
    return (counts.withColumn("rk", F.row_number().over(w))
                  .where(F.col("rk") == 1)
                  .select("cell", F.col("l_returnflag").alias("mode_value"), "cnt"))


SQL_A5 = """
WITH counts AS (
  SELECT CAST(l_orderkey % 50 AS INT) AS cell, l_returnflag, COUNT(*) AS cnt
  FROM lineitem GROUP BY 1, 2
), ranked AS (
  SELECT cell, l_returnflag AS mode_value, cnt,
         ROW_NUMBER() OVER (PARTITION BY cell ORDER BY cnt DESC, l_returnflag ASC) AS rk
  FROM counts
)
SELECT cell, mode_value, cnt FROM ranked WHERE rk = 1
"""


# ---------------------------------------------------------------------------
# A6: percent-of-class with coverage gate (the perc kernel shape)
# ---------------------------------------------------------------------------

def q_a6_percent(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    cell = F.expr("CAST(l_orderkey % 40 AS INT)")
    return (li.withColumn("cell", cell)
              .groupBy("cell")
              .agg(F.round(F.avg(F.when(F.col("l_returnflag") == "R", 1.0).otherwise(0.0)) * 100, 4)
                   .alias("pct_r"),
                   F.count("*").alias("n"))
              .where(F.col("n") >= 10))


SQL_A6 = """
SELECT CAST(l_orderkey % 40 AS INT) AS cell,
       ROUND(AVG(CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END) * 100, 4) AS pct_r,
       COUNT(*) AS n
FROM lineitem GROUP BY 1 HAVING COUNT(*) >= 10
"""


# ---------------------------------------------------------------------------
# A10: 2-key grouped stat (year x latitude band)
# ---------------------------------------------------------------------------

def q_a10_year_lat(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (o.withColumn("yr", F.year("o_orderdate"))
             .withColumn("lat_band", F.expr(
                 "CAST(FLOOR((((o_custkey * 104729) % 12000) / 100.0 - 60.0) / 10.0) AS INT)"))
             .groupBy("yr", "lat_band")
             .agg(F.count("*").alias("n"),
                  F.round(F.sum("o_totalprice"), 2).alias("sum_price")))


SQL_A10 = """
SELECT year(o_orderdate) AS yr,
       CAST(FLOOR((((o_custkey * 104729) % 12000) / 100.0 - 60.0) / 10.0) AS INT) AS lat_band,
       COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS sum_price
FROM orders GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# A13: exact quantiles (legend-break estimation)
# ---------------------------------------------------------------------------

def q_a13_quantiles(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.25)"), 4).alias("q25"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("q50"),
        F.round(F.expr("percentile(l_extendedprice, 0.75)"), 4).alias("q75"))


SQL_A13 = """
SELECT l_linestatus,
       ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS q25,
       ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS q50,
       ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS q75
FROM lineitem GROUP BY 1
"""


# ---------------------------------------------------------------------------
# A14: 2-D histogram (density map)
# ---------------------------------------------------------------------------

def q_a14_hist2d(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (li.withColumn("bin_x", F.expr("CAST(FLOOR(l_extendedprice / 10000.0) AS INT)"))
              .withColumn("bin_y", F.expr("CAST(FLOOR(l_discount * 20.0) AS INT)"))
              .groupBy("bin_x", "bin_y")
              .agg(F.count("*").alias("n")))


SQL_A14 = """
SELECT CAST(FLOOR(l_extendedprice / 10000.0) AS INT) AS bin_x,
       CAST(FLOOR(l_discount * 20.0) AS INT) AS bin_y,
       COUNT(*) AS n
FROM lineitem GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# A16: error metrics (RMSD as the reference defines it: sqrt of SUM)
# ---------------------------------------------------------------------------

def q_a16_metrics(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    pred = F.col("l_quantity") * 1000.0
    diff = F.col("l_extendedprice") - pred
    return (li.groupBy("l_returnflag")
              .agg(F.round(F.sqrt(F.sum(diff * diff)), 2).alias("rmsd"),
                   F.round(F.avg(diff), 4).alias("mbe"),
                   F.round(F.avg(F.abs(diff)), 4).alias("mae")))


SQL_A16 = """
SELECT l_returnflag,
       ROUND(SQRT(SUM((l_extendedprice - l_quantity * 1000.0) * (l_extendedprice - l_quantity * 1000.0))), 2) AS rmsd,
       ROUND(AVG(l_extendedprice - l_quantity * 1000.0), 4) AS mbe,
       ROUND(AVG(ABS(l_extendedprice - l_quantity * 1000.0)), 4) AS mae
FROM lineitem GROUP BY 1
"""


# ---------------------------------------------------------------------------
# J3/J4: equi-join + group-join (scene-list -> tiles shape)
# ---------------------------------------------------------------------------

def q_j3_equi_join(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (o.join(c, o["o_custkey"] == c["c_custkey"])
             .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
             .groupBy("n_name")
             .agg(F.count("*").alias("n_orders"),
                  F.round(F.sum("o_totalprice"), 2).alias("revenue")))


SQL_J3 = """
SELECT n_name, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1
"""


def q_j4_group_join(spark, sf_dir):
    """Scene-per-tile grouping: count + first/last ids per derived tile."""
    p = _t(spark, sf_dir, "part")
    return (p.withColumn("tile", F.expr("CAST(p_partkey % 97 AS INT)"))
             .groupBy("tile")
             .agg(F.count("*").alias("n_scenes"),
                  F.min("p_partkey").alias("first_id"),
                  F.max("p_partkey").alias("last_id"),
                  F.round(F.avg("p_retailprice"), 4).alias("avg_price")))


SQL_J4 = """
SELECT CAST(p_partkey % 97 AS INT) AS tile, COUNT(*) AS n_scenes,
       MIN(p_partkey) AS first_id, MAX(p_partkey) AS last_id,
       ROUND(AVG(p_retailprice), 4) AS avg_price
FROM part GROUP BY 1
"""


# ---------------------------------------------------------------------------
# P10/F9: regex id parsing + date parts
# ---------------------------------------------------------------------------

def q_p10_regex(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return (p.withColumn("brand_num", F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("int"))
             .withColumn("type_head", F.regexp_extract("p_type", r"^(\w+)", 1))
             .groupBy("brand_num", "type_head")
             .agg(F.count("*").alias("n")))


SQL_P10 = """
SELECT CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS INT) AS brand_num,
       regexp_extract(p_type, '^(\\w+)', 1) AS type_head,
       COUNT(*) AS n
FROM part GROUP BY 1, 2
"""


def q_f9_dates(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (o.groupBy(F.year("o_orderdate").alias("yr"),
                      F.month("o_orderdate").alias("mo"))
             .agg(F.count("*").alias("n"),
                  F.round(F.avg("o_totalprice"), 4).alias("avg_price")))


SQL_F9 = """
SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
       COUNT(*) AS n, ROUND(AVG(o_totalprice), 4) AS avg_price
FROM orders GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Window ops: top-k per group, sessionization
# ---------------------------------------------------------------------------

def q_w_topk(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(),
                                                F.col("o_orderkey").asc())
    return (o.withColumn("rk", F.row_number().over(w))
             .where(F.col("rk") <= 2)
             .select("o_custkey", "rk", "o_orderkey",
                     F.round("o_totalprice", 2).alias("price")))


SQL_W_TOPK = """
SELECT o_custkey, CAST(rk AS INT) AS rk, o_orderkey, ROUND(o_totalprice, 2) AS price
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders
) WHERE rk <= 2
"""


def q_w_sessionize(spark, sf_dir):
    """Sessionization: 30-min gap -> new session; sessions per user."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # events.ts carries microsecond precision; compare integer microseconds so
    # the session-gap test matches DuckDB's epoch_us() exactly (unix_timestamp
    # would truncate to whole seconds and misclassify gaps straddling 1800s).
    # timestampdiff is wall-clock arithmetic on TIMESTAMP_NTZ: no session-TZ
    # or DST dependence, unlike a cast to TIMESTAMP_LTZ + unix_micros.
    prev = F.lag("ts").over(w)
    gap = F.expr("timestampdiff(MICROSECOND, _prev_ts, ts)")
    s = (e.withColumn("_prev_ts", prev)
          .withColumn("new_sess",
                      F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)))
    return (s.groupBy("user_id")
             .agg(F.sum("new_sess").alias("n_sessions"),
                  F.count("*").alias("n_events")))


SQL_W_SESSIONIZE = """
WITH g AS (
  SELECT user_id, ts, event_id,
         epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap
  FROM events
)
SELECT user_id,
       CAST(SUM(CASE WHEN gap IS NULL OR gap > 1800 * 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM g GROUP BY 1
"""


def q_w3_stateful_sessions(spark, sf_dir):
    """Custom stateful streaming operator (applyInPandasWithState): per-user
    sessionization run as an AvailableNow stream over the events table;
    result = every CLOSED session (the open trailing session per user stays
    in the state store).  The DuckDB oracle expresses the same thing in
    window SQL: gap-split sessions minus each user's last."""
    import shutil
    import tempfile

    from geo_raster_spark.streaming import stateful

    import os

    work = tempfile.mkdtemp(prefix="gsr_w3_")
    try:
        src = f"{work}/events"
        out = f"{work}/sessions"
        ckpt = f"{work}/ckpt"
        # zero-copy staging: the streaming file source needs a DIRECTORY, so
        # symlink the (read-only) sf table file(s) into one — no data write
        os.makedirs(src)
        ev = f"{sf_dir}/events.parquet"
        if os.path.isdir(ev):
            for f in os.listdir(ev):
                os.symlink(os.path.join(ev, f), os.path.join(src, f))
        else:
            os.symlink(ev, f"{src}/events.parquet")
        q = stateful.streaming_sessionize(spark, src, ckpt, out, gap_sec=1800)
        q.awaitTermination(300)
        res = spark.read.parquet(out)
        # materialize EXECUTOR-side before the temp dir disappears: the
        # former toPandas()+createDataFrame round-trip pulled every session
        # row through the driver (round 8 — it was also the one remaining
        # driver materialization in a declared query path)
        return res.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


SQL_W3_SESSIONS = """
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800 * 1000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
), agg AS (
  SELECT user_id, sid, MIN(ts) AS session_start, MAX(ts) AS session_end,
         CAST(COUNT(*) AS INT) AS n_events
  FROM s GROUP BY 1, 2
)
SELECT user_id, session_start, session_end, n_events
FROM agg a
WHERE sid < (SELECT MAX(sid) FROM agg b WHERE b.user_id = a.user_id)
"""


def q_w4_asof(spark, sf_dir):
    """As-of join: each purchase picks up the value of the user's most
    recent view at-or-before the purchase time (union + carry-forward
    window — no range cross-product).  Oracle: DuckDB's native ASOF JOIN."""
    from geo_raster_spark.operators.asof import asof_join

    e = _t(spark, sf_dir, "events")
    left = e.where(F.col("event_type") == "purchase") \
            .select("event_id", "user_id", "ts", "value")
    right = (e.where(F.col("event_type") == "view")
              .groupBy("user_id", "ts").agg(F.max("value").alias("view_value")))
    j = asof_join(left, right, time_col="ts", by="user_id",
                  value_cols=["view_value"])
    return j.select("event_id", "user_id",
                    F.round("value", 6).alias("purchase_value"),
                    F.round("view_value", 6).alias("view_value"))


SQL_W4_ASOF = """
WITH l AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
), r AS (
  SELECT user_id, ts, MAX(value) AS view_value
  FROM events WHERE event_type = 'view' GROUP BY 1, 2
)
SELECT l.event_id, l.user_id,
       ROUND(l.value, 6) AS purchase_value,
       ROUND(r.view_value, 6) AS view_value
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
"""


# ---------------------------------------------------------------------------
# Text analysis over documents
# ---------------------------------------------------------------------------

def q_t1_token_stats(spark, sf_dir):
    from geo_raster_spark.operators.text import with_token_stats
    d = _t(spark, sf_dir, "documents")
    s = with_token_stats(d)
    return (s.groupBy("lang")
             .agg(F.count("*").alias("n_docs"),
                  F.sum("n_tokens").alias("total_tokens"),
                  F.round(F.avg("avg_token_len"), 6).alias("mean_tok_len")))


SQL_T1 = r"""
WITH toks AS (
  SELECT lang,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9'']+'),
                     x -> length(x) > 0) AS tok
  FROM documents
), s AS (
  SELECT lang, len(tok) AS n_tokens,
         ROUND(CAST(list_sum(list_transform(tok, x -> length(x))) AS DOUBLE)
               / greatest(len(tok), 1), 6) AS avg_token_len
  FROM toks
)
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       ROUND(AVG(avg_token_len), 6) AS mean_tok_len
FROM s GROUP BY 1
"""


def q_t2_lang_id(spark, sf_dir):
    """Stopword-hit language id; confusion counts vs the labeled lang col."""
    from geo_raster_spark.operators.text import with_lang_id
    d = _t(spark, sf_dir, "documents")
    return (with_lang_id(d)
            .groupBy("lang", "lang_pred")
            .agg(F.count("*").alias("n")))


_SW_SQL = {
    "en": "['the','and','of','to','in','is','that','it','was','for']",
    "de": "['der','die','und','das','ist','ich','nicht','ein','mit','auf']",
    "fr": "['le','la','les','et','des','est','une','dans','que','pour']",
    "es": "['el','la','los','y','de','que','es','en','un','por']",
}

SQL_T2 = r"""
WITH toks AS (
  SELECT lang,
         list_distinct(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9'']+'),
                       x -> length(x) > 0)) AS tok
  FROM documents
), scores AS (
  SELECT lang,
         len(list_intersect(tok, """ + _SW_SQL["en"] + r""")) AS s_en,
         len(list_intersect(tok, """ + _SW_SQL["de"] + r""")) AS s_de,
         len(list_intersect(tok, """ + _SW_SQL["fr"] + r""")) AS s_fr,
         len(list_intersect(tok, """ + _SW_SQL["es"] + r""")) AS s_es
  FROM toks
), pred AS (
  SELECT lang,
         CASE WHEN greatest(s_en, s_de, s_fr, s_es) <= 0 THEN 'und'
              WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
              WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
              WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
              ELSE 'es' END AS lang_pred
  FROM scores
)
SELECT lang, lang_pred, COUNT(*) AS n FROM pred GROUP BY 1, 2
"""


def q_t3_quality(spark, sf_dir):
    from geo_raster_spark.operators.text import with_quality
    d = _t(spark, sf_dir, "documents")
    return (with_quality(d)
            .withColumn("q_band", F.floor(F.col("quality") * 10).cast("int"))
            .groupBy("source", "q_band")
            .agg(F.count("*").alias("n")))


SQL_T3 = r"""
WITH q AS (
  SELECT source,
         0.4 * least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
       + 0.3 * (CAST(length(regexp_replace(lower(text), '[^a-z ]', '', 'g')) AS DOUBLE)
                / greatest(CAST(length(text) AS DOUBLE), 1.0))
       + 0.3 * least(CAST(len(list_intersect(
             list_distinct(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9'']+'),
                           x -> length(x) > 0)), """ + _SW_SQL["en"] + r""")) AS DOUBLE) / 5.0, 1.0)
         AS quality
  FROM documents
)
SELECT source, CAST(FLOOR(ROUND(quality, 6) * 10) AS INT) AS q_band, COUNT(*) AS n
FROM q GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Embeddings: brute-force cosine top-k (exact ANN baseline)
# ---------------------------------------------------------------------------

def _probe_vec(dim: int = 64):
    """Deterministic probe vector: alternating unit pattern."""
    return [1.0 if i % 7 == 0 else (0.5 if i % 3 == 0 else 0.1) for i in range(dim)]


def q_e1_cosine_topk(spark, sf_dir):
    from geo_raster_spark.operators.similarity import cosine_topk
    emb = _t(spark, sf_dir, "embeddings")
    return (cosine_topk(emb, _probe_vec(), k=20)
            .select("vec_id", "rank", F.round("cosine", 4).alias("cosine")))


def _sql_e1():
    probe = _probe_vec()
    arr = "[" + ",".join(f"{v!r}" for v in probe) + "]"
    pn = sum(v * v for v in probe) ** 0.5
    return f"""
WITH s AS (
  SELECT vec_id,
         ROUND(list_sum(list_transform(list_zip(embedding, CAST({arr} AS DOUBLE[])),
                x -> CAST(x[1] AS DOUBLE) * x[2]))
         / (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * {pn!r} + 1e-30), 8)
         AS cosine
  FROM embeddings
), r AS (
  SELECT vec_id, cosine,
         ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM s
)
SELECT vec_id, CAST(rank AS INT) AS rank, ROUND(cosine, 4) AS cosine
FROM r WHERE rank <= 20
"""


# ---------------------------------------------------------------------------
# Streaming-shape agg: event-time windowed counts (batch twin of the
# Structured Streaming plan in streaming/incremental.py)
# ---------------------------------------------------------------------------

def q_w2_windowed_counts(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
             .agg(F.count("*").alias("n"),
                  F.round(F.sum("value"), 4).alias("sum_value"))
             .select(F.col("w.start").alias("w_start"), "event_type", "n", "sum_value"))


SQL_W2 = """
SELECT date_trunc('hour', ts) AS w_start, event_type,
       COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Semi-structured props (events.props is a JSON string)
# ---------------------------------------------------------------------------

def q_s9_json_props(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (e.withColumn("k", k)
             .withColumn("k_band", F.floor(F.col("k") / 10).cast("int"))
             .groupBy("event_type", "k_band")
             .agg(F.count("*").alias("n"), F.round(F.avg("k"), 4).alias("avg_k")))


SQL_S9 = """
SELECT event_type,
       CAST(FLOOR(CAST(json_extract_string(props, '$.k') AS INT) / 10.0) AS INT) AS k_band,
       COUNT(*) AS n,
       ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# P2/P3: extent algebra as column math (intersect/union/buffer/contains)
# ---------------------------------------------------------------------------

def q_p3_extent_algebra(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    b = (s.withColumn("aminx", F.expr("CAST(((s_suppkey * 7919) % 36000) / 100.0 - 180.0 AS DOUBLE)"))
          .withColumn("aminy", F.expr("CAST(((s_suppkey * 104729) % 12000) / 100.0 - 60.0 AS DOUBLE)"))
          .withColumn("amaxx", F.col("aminx") + 8.0).withColumn("amaxy", F.col("aminy") + 6.0)
          .withColumn("bminx", F.col("aminx") + 4.0).withColumn("bminy", F.col("aminy") + 3.0)
          .withColumn("bmaxx", F.col("bminx") + 8.0).withColumn("bmaxy", F.col("bminy") + 6.0))
    inter_w = F.greatest(F.least("amaxx", "bmaxx") - F.greatest("aminx", "bminx"), F.lit(0.0))
    inter_h = F.greatest(F.least("amaxy", "bmaxy") - F.greatest("aminy", "bminy"), F.lit(0.0))
    union_w = F.greatest("amaxx", "bmaxx") - F.least("aminx", "bminx")
    union_h = F.greatest("amaxy", "bmaxy") - F.least("aminy", "bminy")
    return (b.select("s_suppkey",
                     F.round(inter_w * inter_h, 6).alias("inter_area"),
                     F.round(union_w * union_h, 6).alias("union_bbox_area"),
                     ((F.col("aminx") <= F.col("bminx")) & (F.col("amaxx") >= F.col("bmaxx"))
                      & (F.col("aminy") <= F.col("bminy")) & (F.col("amaxy") >= F.col("bmaxy"))).alias("contains_b")))


SQL_P3 = """
WITH b AS (
  SELECT s_suppkey,
         ((s_suppkey * 7919) % 36000) / 100.0 - 180.0 AS aminx,
         ((s_suppkey * 104729) % 12000) / 100.0 - 60.0 AS aminy
  FROM supplier
), e AS (
  SELECT s_suppkey, aminx, aminy, aminx + 8.0 AS amaxx, aminy + 6.0 AS amaxy,
         aminx + 4.0 AS bminx, aminy + 3.0 AS bminy,
         aminx + 12.0 AS bmaxx, aminy + 9.0 AS bmaxy
  FROM b
)
SELECT s_suppkey,
       ROUND(GREATEST(LEAST(amaxx, bmaxx) - GREATEST(aminx, bminx), 0.0)
             * GREATEST(LEAST(amaxy, bmaxy) - GREATEST(aminy, bminy), 0.0), 6) AS inter_area,
       ROUND((GREATEST(amaxx, bmaxx) - LEAST(aminx, bminx))
             * (GREATEST(amaxy, bmaxy) - LEAST(aminy, bminy)), 6) AS union_bbox_area,
       (aminx <= bminx AND amaxx >= bmaxx AND aminy <= bminy AND amaxy >= bmaxy) AS contains_b
FROM e
"""


# ---------------------------------------------------------------------------
# A7: mean + coefficient of variation (legacy lc_agg composition)
# ---------------------------------------------------------------------------

def q_a7_mean_cv(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    g = li.groupBy(F.expr("CAST(l_orderkey % 60 AS INT)").alias("cell"))
    return g.agg(F.round(F.avg("l_quantity"), 6).alias("mean_q"),
                 F.round(F.expr("stddev_pop(l_quantity) / avg(l_quantity)"), 6).alias("cv"))


SQL_A7 = """
SELECT CAST(l_orderkey % 60 AS INT) AS cell,
       ROUND(AVG(l_quantity), 6) AS mean_q,
       ROUND(stddev_pop(l_quantity) / AVG(l_quantity), 6) AS cv
FROM lineitem GROUP BY 1
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES = {
    "a1_weighted_mean": q_a1_weighted_mean,
    "a5_mode": q_a5_mode,
    "a6_percent": q_a6_percent,
    "a10_year_lat": q_a10_year_lat,
    "a13_quantiles": q_a13_quantiles,
    "a14_hist2d": q_a14_hist2d,
    "a16_metrics": q_a16_metrics,
    "j3_equi_join": q_j3_equi_join,
    "j4_group_join": q_j4_group_join,
    "p10_regex": q_p10_regex,
    "f9_dates": q_f9_dates,
    "w_topk": q_w_topk,
    "w_sessionize": q_w_sessionize,
    "w3_stateful_sessions": q_w3_stateful_sessions,
    "w4_asof": q_w4_asof,
    "t1_token_stats": q_t1_token_stats,
    "t2_lang_id": q_t2_lang_id,
    "t3_quality": q_t3_quality,
    "e1_cosine_topk": q_e1_cosine_topk,
    "w2_windowed_counts": q_w2_windowed_counts,
    "s9_json_props": q_s9_json_props,
    "p3_extent_algebra": q_p3_extent_algebra,
    "a7_mean_cv": q_a7_mean_cv,
}

ORACLES = {
    "a1_weighted_mean": SQL_A1,
    "a5_mode": SQL_A5,
    "a6_percent": SQL_A6,
    "a10_year_lat": SQL_A10,
    "a13_quantiles": SQL_A13,
    "a14_hist2d": SQL_A14,
    "a16_metrics": SQL_A16,
    "j3_equi_join": SQL_J3,
    "j4_group_join": SQL_J4,
    "p10_regex": SQL_P10,
    "f9_dates": SQL_F9,
    "w_topk": SQL_W_TOPK,
    "w_sessionize": SQL_W_SESSIONIZE,
    "w3_stateful_sessions": SQL_W3_SESSIONS,
    "w4_asof": SQL_W4_ASOF,
    "t1_token_stats": SQL_T1,
    "t2_lang_id": SQL_T2,
    "t3_quality": SQL_T3,
    "e1_cosine_topk": _sql_e1(),
    "w2_windowed_counts": SQL_W2,
    "s9_json_props": SQL_S9,
    "p3_extent_algebra": SQL_P3,
    "a7_mean_cv": SQL_A7,
}
