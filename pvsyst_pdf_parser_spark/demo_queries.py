"""Relational operator demos over the TPC-H-ish driver tables.

Each function maps to a SURVEY.md §2 operator class and returns a
DataFrame whose columns/values match the DuckDB oracle in
__spark_entry__.oracle_sql() (names aliased identically, doubles
rounded, deterministic tiebreaks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _epoch_us(col: str = "ts"):
    """Epoch microseconds for TIMESTAMP_NTZ, timezone-independent
    (matches DuckDB epoch_us on naive timestamps regardless of the
    driver session's timezone)."""
    return F.expr(
        f"timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', {col})"
    )


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- aggregations (G4/G9/G10 class) ------------------------------------------


def q1_pricing_summary(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def broadcast_join_revenue(spark, sf_dir):
    """Broadcast-dim equi-join chain (join strategy demo)."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


def topk_customers(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("spend"))
        .orderBy(F.col("spend").desc(), F.col("o_custkey"))
        .limit(10)
    )


# --- windows (C2 / A7 / G5 / G6 class) ----------------------------------------


def window_lead_gaps(spark, sf_dir):
    """C2 analog: lead() interval slicing over an event stream."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.withColumn(
        "gap_us", F.lead(_epoch_us()).over(w) - _epoch_us()
    )
    return gaps.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum("gap_us").alias("total_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
    )


def fill_forward_last_purchase(spark, sf_dir):
    """A7 analog: last-non-null fill-forward window."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = ev.withColumn(
        "last_purchase_value",
        F.last(
            F.when(F.col("event_type") == "purchase", F.col("value")),
            ignorenulls=True,
        ).over(w),
    )
    return carried.groupBy("user_id").agg(
        F.count(
            F.when(F.col("last_purchase_value") > 50.0, F.lit(1))
        ).alias("n_after_big_purchase")
    )


def sessionize(spark, sf_dir, gap_minutes: int = 30):
    """Watermark-style sessionization as lag → boundary flag → cumsum."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_session",
        (
            F.coalesce(
                _epoch_us() - F.lag(_epoch_us()).over(w),
                F.lit(None),
            )
            > gap_minutes * 60 * 1_000_000
        )
        .cast("int"),
    ).withColumn("new_session", F.coalesce("new_session", F.lit(1)))
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


def even_split_allocation(spark, sf_dir):
    """G5: distribute an integer budget across group members,
    remainder-first (base + 1 for the first S mod E members)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    sized = (
        li.withColumn("rn", F.row_number().over(w))
        .withColumn("n_lines", F.count("*").over(Window.partitionBy("l_orderkey")))
        .withColumn(
            "budget",
            F.floor(
                F.min("l_extendedprice").over(Window.partitionBy("l_orderkey")) / 100
            ).cast("int"),
        )
    )
    return sized.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.floor(F.col("budget") / F.col("n_lines"))
            + F.when(F.col("rn") <= F.col("budget") % F.col("n_lines"), 1).otherwise(0)
        ).cast("bigint").alias("alloc"),
    )


def capped_round_robin(spark, sf_dir, cap: int = 7):
    """G6 closed form: q full rounds + remainder, capped, spillover
    round-robin beyond the cap."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    sized = (
        li.withColumn("rn", F.row_number().over(w))
        .withColumn("n_ep", F.count("*").over(Window.partitionBy("l_orderkey")))
        .withColumn(
            "total",
            F.sum(F.col("l_quantity").cast("int")).over(
                Window.partitionBy("l_orderkey")
            ),
        )
    )
    q = F.floor(F.col("total") / F.col("n_ep"))
    r = F.col("total") % F.col("n_ep")
    capped = F.least(q + F.when(F.col("rn") <= r, 1).otherwise(0), F.lit(cap))
    ofl = F.greatest(F.col("total") - F.col("n_ep") * cap, F.lit(0))
    spill = F.floor(ofl / F.col("n_ep")) + F.when(
        F.col("rn") <= ofl % F.col("n_ep"), 1
    ).otherwise(0)
    alloc = F.when(F.col("total") <= F.col("n_ep") * cap, capped).otherwise(
        F.lit(cap) + spill
    )
    return sized.select(
        "l_orderkey", "l_linenumber", alloc.cast("bigint").alias("alloc")
    )


def gap_fill_rank(spark, sf_dir):
    """G1 analog: rows needing labels get the smallest unused positive
    ints per group (anti-joined candidate sequence + rank join)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 20 == 0)
    labeled = li.filter(F.col("l_returnflag") != "R")
    missing = li.filter(F.col("l_returnflag") == "R")

    used = labeled.groupBy("l_orderkey").agg(
        F.collect_set("l_linenumber").alias("used_nums"),
        F.max("l_linenumber").alias("max_used"),
    )
    n_missing = missing.groupBy("l_orderkey").agg(F.count("*").alias("n_missing"))
    slots = (
        n_missing.join(used, "l_orderkey", "left")
        .select(
            "l_orderkey",
            F.coalesce("used_nums", F.expr("cast(array() as array<int>)")).alias(
                "used_nums"
            ),
            F.explode(
                F.sequence(
                    F.lit(1), F.coalesce("max_used", F.lit(0)) + F.col("n_missing")
                )
            ).alias("num"),
        )
        .filter(~F.array_contains("used_nums", F.col("num")))
        .withColumn(
            "slot_rank",
            F.row_number().over(Window.partitionBy("l_orderkey").orderBy("num")),
        )
    )
    ranked = missing.withColumn(
        "miss_rank",
        F.row_number().over(
            Window.partitionBy("l_orderkey").orderBy("l_partkey", "l_linenumber")
        ),
    )
    return (
        ranked.join(
            slots.withColumnRenamed("slot_rank", "miss_rank"),
            ["l_orderkey", "miss_rank"],
        )
        .select(
            "l_orderkey",
            "l_partkey",
            "l_linenumber",
            F.col("num").alias("assigned_label"),
        )
    )


# --- joins (P6 as-of / G8 proportional) ---------------------------------------


def asof_nearest_view(spark, sf_dir):
    """P6 analog: for each click, the nearest view by |Δt| per user."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 15)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        _epoch_us().alias("click_us"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        _epoch_us().alias("view_us"),
    )
    paired = clicks.join(views, "user_id").withColumn(
        "dist", F.abs(F.col("click_us") - F.col("view_us"))
    )
    w = Window.partitionBy("click_id").orderBy("dist", "view_id")
    return (
        paired.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "click_id", "view_id", "dist")
    )


def proportional_allocation(spark, sf_dir):
    """G8 analog: allocate nation revenue to customers by spend share."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    spend = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey", "c_custkey")
        .agg(F.sum("o_totalprice").alias("spend"))
    )
    w = Window.partitionBy("c_nationkey")
    return (
        spend.withColumn("nation_total", F.sum("spend").over(w))
        .withColumn(
            "share_ppm",
            F.floor(F.col("spend") * 1_000_000 / F.col("nation_total")).cast(
                "bigint"
            ),
        )
        .filter(F.col("c_custkey") % 25 == 0)
        .select("c_nationkey", "c_custkey", "share_ppm")
    )


def salted_hot_key_agg(spark, sf_dir, n_salts: int = 16):
    """Two-phase salted aggregation for skewed keys (the north rule's
    explicit skew handling, in relational form).

    ``events.event_type`` has a handful of distinct values over the
    whole table — the worst groupBy skew shape: a plain
    ``groupBy(event_type)`` funnels every row of a hot key through ONE
    reducer task.  Salting splits each hot key across ``n_salts``
    partial aggregates (phase 1 shuffles on (key, salt) — at most
    1/n_salts of a hot key per task), then combines the tiny partials
    (phase 2 shuffles n_keys × n_salts rows).  Results are identical to
    the plain groupBy, which is exactly what the oracle asserts.
    sum/count/min/max re-aggregate losslessly; avg is computed from
    sum/count at the end (never averaged across partials)."""
    ev = load(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("int")
    partial = (
        ev.select(
            "event_type",
            F.pmod(F.xxhash64("event_id"), F.lit(n_salts)).alias("salt"),
            k.alias("k"),
            "value",
        )
        .groupBy("event_type", "salt")
        .agg(
            F.count("*").alias("p_n"),
            F.sum("k").alias("p_sum_k"),
            F.min("value").alias("p_min_v"),
            F.max("value").alias("p_max_v"),
        )
    )
    return partial.groupBy("event_type").agg(
        F.sum("p_n").alias("n_events"),
        F.sum("p_sum_k").alias("sum_k"),
        F.round(F.sum("p_sum_k") / F.sum("p_n"), 4).alias("avg_k"),
        F.round(F.min("p_min_v"), 2).alias("min_value"),
        F.round(F.max("p_max_v"), 2).alias("max_value"),
    )


def first_seen_type_ids(spark, sf_dir):
    """G2 analog: dense ids in first-seen order."""
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("event_type").agg(
        F.min("ts").alias("first_ts"), F.min("event_id").alias("first_id")
    )
    # Global (unpartitioned) window is safe HERE because its input is the
    # post-aggregation DIM cardinality — one row per distinct event_type
    # (a handful, never the event count).  Dense first-seen ids require a
    # total order by construction; at dim cardinalities beyond single-
    # executor memory use zipWithIndex over a sorted write instead.
    w = Window.orderBy("first_ts", "first_id")
    return firsts.withColumn(
        "type_id", F.row_number().over(w)
    ).select("event_type", "type_id")


# --- projections / unnest ------------------------------------------------------


def regex_kv_extract(spark, sf_dir):
    """P1/S2 analog: regex field extraction from a semi-structured col."""
    ev = load(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("int")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.round(F.avg(k), 4).alias("avg_k"),
    )


def sequence_unnest(spark, sf_dir):
    """A8 analog: explode(sequence(1, n))."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return (
        li.select(
            "l_orderkey",
            F.explode(F.sequence(F.lit(1), F.col("l_linenumber"))).alias("idx"),
        )
        .groupBy("l_orderkey")
        .agg(F.sum("idx").alias("sum_idx"), F.count("*").alias("n_rows"))
    )


def two_level_unnest(spark, sf_dir):
    """A10 analog: nested lateral explode (cross of two sequences)."""
    part = load(spark, sf_dir, "part").filter(F.col("p_partkey") % 500 == 0)
    lvl1 = part.select(
        "p_partkey",
        F.explode(F.sequence(F.lit(1), F.col("p_size") % 3 + 1)).alias("i"),
    )
    lvl2 = lvl1.select(
        "p_partkey", "i", F.explode(F.sequence(F.lit(1), F.lit(2))).alias("j")
    )
    return lvl2.groupBy("p_partkey").agg(
        F.count("*").alias("n_combos"), F.sum(F.col("i") * F.col("j")).alias("weighted")
    )


def salted_skew_join(spark, sf_dir, n_salts: int = 16):
    """Salted replicated JOIN for a skewed fact key — the join-side
    twin of :func:`salted_hot_key_agg` (that one salts a groupBy; this
    salts a shuffle join, the second skew shape the north rule calls
    out).

    ``events.event_type`` is the hot key: a plain shuffle join on it
    funnels every row of a hot type through ONE reducer task.  The
    pattern (public Spark practice for dims too large to broadcast):
    explode the dim side ×``n_salts`` replicas, salt the fact side
    deterministically with ``pmod(xxhash64(event_id), n_salts)``, and
    join on (key, salt) — each hot key now spreads across ``n_salts``
    reducers, at the bounded cost of ``n_dim × n_salts`` replicated dim
    rows.  ``hint("shuffle_hash")`` pins the shuffled-join plan so the
    demo exercises the salted exchange even when the demo-sized dim
    would auto-broadcast (at real scale the hint is the default plan).

    Results are identical to the plain unsalted join, which is exactly
    what the oracle asserts.  All output measures are exact integers
    (floor(value*1000) per row before summing), so partial-sum order
    can never move the driver's value hash."""
    from .training.hashing import md5_56

    ev = load(spark, sf_dir, "events")
    dim = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            (md5_56(F.col("event_type")) % 1000).alias("weight_ppk"),
        )
    )
    dim_salted = dim.select(
        "event_type",
        "weight_ppk",
        F.explode(
            F.sequence(F.lit(0), F.lit(n_salts - 1))
        ).alias("salt"),
    )
    fact = ev.select(
        "event_type",
        F.pmod(F.xxhash64("event_id"), F.lit(n_salts)).alias("salt"),
        F.floor(F.col("value") * 1000).cast("bigint").alias("v_milli"),
    )
    joined = fact.hint("shuffle_hash").join(
        dim_salted, ["event_type", "salt"]
    )
    return (
        joined.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum("v_milli").cast("bigint").alias("sum_v_milli"),
            (F.sum("v_milli") * F.first("weight_ppk"))
            .cast("bigint")
            .alias("weighted_milli_ppk"),
        )
        .orderBy("event_type")
    )
