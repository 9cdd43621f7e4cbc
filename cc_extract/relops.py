"""Relational / dataflow operators (SURVEY.md §2.5 R1–R15) exercised over
the driver's TPC-H-ish tables — the same operator shapes the extraction
job uses (window dedup, hash agg, broadcast join, top-k, cube, distinct),
each with an exact DuckDB oracle in ``__spark_entry__.py``.

Float determinism contract with the oracles: SUMs of doubles rounded to
2 dp, AVGs to 4 dp (accumulation order differs between engines and runs;
rounding absorbs the ~1e-12 relative drift).  Counts/mins/maxes exact.

Scale notes: dimension joins (region/nation/supplier) carry explicit
``broadcast()`` hints — at 100 TB fact scale these must never shuffle the
fact side; aggregations are all partial-aggregable hash aggs; top-k uses
orderBy+limit which Spark plans as TakeOrderedAndProject (no full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _t(spark, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------- TPC-H Q1

def q1_pricing_summary(spark, sf_dir: str) -> DataFrame:
    """R7 grouped aggregation with partial/final hash agg (TPC-H Q1 shape)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(spark, sf_dir: str) -> DataFrame:
    """3-way fact join + agg + top-k (TPC-H Q3 shape)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-03-15"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-03-15"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


def q5_local_supplier_volume(spark, sf_dir: str) -> DataFrame:
    """6-way join with broadcast dimensions (TPC-H Q5 shape).  nation /
    region are true constant-size dimensions and carry explicit broadcast
    hints; supplier scales with SF, so its join is left to AQE (broadcast
    by statistics at small SF, shuffle join at 100 TB — verify:
    BroadcastHashJoin in explain at sf0.1)."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        # supplier scales linearly with SF, so no unconditional broadcast
        # hint (r3 verdict: same policy as lsh_verified_near_dups) — AQE
        # still plans a BroadcastHashJoin at small SF from its measured
        # size, and degrades to shuffle join when supplier outgrows the
        # threshold at 100 TB.
        .join(
            sup,
            (li.l_suppkey == sup.s_suppkey) & (cust.c_nationkey == sup.s_nationkey),
        )
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"))
    )


# ------------------------------------------------------------ top-k (R8)

def top_orders(spark, sf_dir: str) -> DataFrame:
    """orderBy+limit -> TakeOrderedAndProject (never a global sort)."""
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_orderkey", "o_custkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
    )


# ------------------------------------------------- window dedup (R3 twin)

def latest_event_per_user(spark, sf_dir: str) -> DataFrame:
    """Keep-newest-per-key — the same R3 dedup decision the extraction
    job applies to duplicate crawls of a url.

    Round 6: expressed as max_by over the (ts, event_id) ordering struct
    instead of a row_number window.  Identical row per user ((ts,
    event_id) is unique within a user, both columns non-null, and the
    lexicographic struct max IS the window's desc/desc rank-1 row), but
    the aggregate partial-aggregates map-side: the exchange carries one
    row per user instead of every event, and the window's per-partition
    sort disappears — the shape you want when 10^12 events dedup to
    10^9 users (guide §2.3 "aggregate before you shuffle")."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.max_by(F.struct("event_id", "event_type", "value"),
                      F.struct("ts", "event_id")).alias("m"))
        .select("user_id", "m.event_id", "m.event_type",
                F.round("m.value", 4).alias("value"))
    )


# --------------------------------------------------- time rollups (R13/15)

def daily_event_stats(spark, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .orderBy("day", "event_type")
    )


def event_cube(spark, sf_dir: str) -> DataFrame:
    """R15 grouping sets: fmt x day rollup shape, as cube(event_type, day)."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "day", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    )
    return (
        ev.cube("event_type", "day")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .orderBy("event_type", "day")
    )


def distinct_users_by_type(spark, sf_dir: str) -> DataFrame:
    """R14 exact distinct (the approx_count_distinct twin is
    dashboards-only; exactness is what's oracle-checkable)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("event_type")
    )


def distinct_users_approx(spark, sf_dir: str, rsd: float = 0.05) -> DataFrame:
    """The at-scale distinct-count path, ORACLED (r3 verdict "missing"
    #5): ``approx_count_distinct`` (HyperLogLog++ — constant memory,
    partial-aggregable, the operator you run at 10^12 events) with its
    error bound ASSERTED: |approx - exact| <= max(4 * rsd * exact, 2).
    HLL++ is hash-deterministic, so the verdict is stable per dataset;
    4x the relative-standard-deviation parameter makes the bound a
    contract violation, not sampling noise.  Emitted columns are
    engine-stable: exact count + boolean verdict (the sketch estimate
    stays out of the hash)."""
    ev = _t(spark, sf_dir, "events")
    exact = F.countDistinct("user_id")
    approx = F.approx_count_distinct("user_id", rsd)
    bound = F.greatest(F.lit(4 * rsd) * exact, F.lit(2.0))
    return (
        ev.groupBy("event_type")
        .agg(
            exact.alias("n_users"),
            (F.abs(approx - exact) <= bound).alias("approx_ok"),
        )
        .orderBy("event_type")
    )


# ------------------------------------------------- broadcast dim join (R9)

def region_customer_stats(spark, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
        )
        .orderBy("r_name")
    )


# --------------------------------------------------------------- TPC-H Q6

def q6_forecast_revenue(spark, sf_dir: str) -> DataFrame:
    """R2 showcase: pure filter+agg whose THREE predicates all push to the
    parquet scan (date range, discount band, quantity cap) — the plan is a
    scan with PushedFilters + one partial/final agg, zero joins, zero
    wide shuffles (TPC-H Q6 shape)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# -------------------------------------------------------------- TPC-H Q18

def q18_large_volume_customers(spark, sf_dir: str) -> DataFrame:
    """HAVING + IN-subquery re-expressed as a semi-join (TPC-H Q18 shape):
    per-order quantity rollup -> HAVING threshold -> semi-join back to
    orders⨝customer -> top-k.  The qualifying-orders set is small but
    grows with SF, so no unconditional broadcast hint — AQE plans the
    broadcast from the rollup's measured post-filter size (and falls back
    to a shuffle join if the threshold ever qualifies too many orders);
    the heavy rollup is partial-aggregable."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("order_qty"))
        .filter(F.col("order_qty") > 180)
    )
    return (
        orders.join(big, orders["o_orderkey"] == big["l_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "order_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# -------------------------------------------------------------- TPC-H Q10

def q10_returned_items(spark, sf_dir: str, top_k: int = 20) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer in a
    quarter — a 4-relation join (lineitem filter -> orders date window ->
    customer -> nation dim) with a top-k.  Plan: both filters push to
    their scans; nation (25 rows) broadcasts by hint as a true dimension,
    the customer join is left to AQE per the repo policy for scaling
    relations; the final top-k is TakeOrderedAndProject, never a global
    sort."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-04-01"))
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(revenue, 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(top_k)
    )


# -------------------------------------------------- semi / anti joins (R18)

def q4_order_priority(spark, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — EXISTS as an explicit LEFT SEMI join: orders in a
    quarter having at least one heavily discounted lineitem, counted per
    priority.  The semi-join never materializes lineitem columns (probe
    side is keys only) and both filters push to their scans; at scale the
    discounted-lineitem key set shuffles by orderkey, the standard
    semi-join plan."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    discounted = li.filter(F.col("l_discount") >= 0.06).select("l_orderkey")
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01"))
            & (F.col("o_orderdate") < F.lit("1997-04-01"))
        )
        .join(discounted, orders.o_orderkey == discounted.l_orderkey,
              "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def parts_never_shipped(spark, sf_dir: str) -> DataFrame:
    """NOT EXISTS as an explicit LEFT ANTI join (the Q16-family shape):
    parts with no lineitem in a ship-date window, counted per brand —
    the dead-inventory report.  Anti-join is the dedup/retention
    workhorse at 100 TB (resume pruning, tombstone filtering); here it
    is a first-class oracled operator rather than only the resume path's
    internal step."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    shipped = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    ).select("l_partkey")
    return (
        part.join(shipped, part.p_partkey == shipped.l_partkey, "left_anti")
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_parts"),
            F.round(F.avg("p_retailprice"), 2).alias("avg_price"),
        )
        .orderBy("p_brand")
    )


# ----------------------------------------------------------- sessionization

def event_sessions(spark, sf_dir: str, gap_minutes: int = 30) -> DataFrame:
    """Sessionization — the classic gap-based window recipe: a new session
    starts where the per-user inter-event gap exceeds *gap_minutes*;
    session id = running count of session starts.  Two window passes over
    the same (user_id, ts) ordering, so Spark plans ONE sort/shuffle and
    both windows run in it; the rollup is partial-aggregable."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # interval arithmetic, not epoch casts: TIMESTAMP_NTZ has no direct
    # long cast in Spark 4, and interval comparison is timezone-free in
    # both engines (the DuckDB oracle compares the same way)
    new_sess = F.when(
        F.col("ts") - F.lag("ts").over(w)
        > F.expr(f"INTERVAL {gap_minutes} MINUTES"),
        1,
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    df = ev.withColumn("session_id", F.sum(new_sess).over(run))
    return (
        df.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("user_id", "session_id")
    )


def event_funnel(spark, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view -> click -> purchase): a user
    reaches stage k only via an event at-or-after their stage-(k-1)
    entry time — the classic product-analytics pattern-match, expressed
    as three conditional min-aggregations chained by equi-joins.

    Scale shape: each stage relation is one filtered scan partially
    aggregated to <= |users| rows before its join; all joins are
    user_id equi-joins over same-keyed aggregates (AQE picks broadcast
    or shuffle by statistics), and the final result is a 1-row
    aggregate.  No window over the full event stream, no explode."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")

    def stage(ev_type: str, prev, prev_col: str, out_col: str):
        base = ev.filter(F.col("event_type") == ev_type).select("user_id", "ts")
        if prev is None:
            return base.groupBy("user_id").agg(F.min("ts").alias(out_col))
        return (
            base.join(prev, "user_id")
            .filter(F.col("ts") >= F.col(prev_col))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_col))
        )

    u1 = stage("view", None, "", "t_view")
    u2 = stage("click", u1, "t_view", "t_click")
    u3 = stage("purchase", u2, "t_click", "t_purchase")
    chained = (
        u1.join(u2, "user_id", "left")
        .join(u3, "user_id", "left")
    )
    return chained.agg(
        F.count("t_view").cast("long").alias("n_view"),
        F.count("t_click").cast("long").alias("n_view_click"),
        F.count("t_purchase").cast("long").alias("n_view_click_purchase"),
        F.round(F.count("t_click") / F.count("t_view"), 6)
        .alias("click_conv"),
        F.round(F.count("t_purchase")
                / F.greatest(F.count("t_click"), F.lit(1)), 6)
        .alias("purchase_conv"),
    )


# --------------------------------------------------------------- TPC-H Q7

def q7_volume_shipping(spark, sf_dir: str) -> DataFrame:
    """Two-sided nation flow (TPC-H Q7 shape): revenue shipped between a
    nation pair in either direction, per ship year.  The fact join chain
    is lineitem⨝orders (both facts, AQE-planned shuffle join on the
    order key); supplier and customer attach their nations through
    explicitly broadcast dims, and the symmetric pair filter
    ((s=1 ∧ c=2) ∨ (s=2 ∧ c=1)) lands AFTER the dim joins where both
    names exist — but the one-sided implications (s ∈ {1,2}, c ∈ {1,2})
    are applied on supplier/customer BEFORE their joins so the fact side
    shrinks as early as the optimizer can prove.  Reference semantics:
    lambda-text-extractor has no relational layer; shape is from the
    TPC-H spec Q7, re-expressed DataFrame-first."""
    nations = ("NATION_1", "NATION_2")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    nation = _t(spark, sf_dir, "nation")
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
        .filter(F.col("supp_nation").isin(*nations))
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
        .filter(F.col("cust_nation").isin(*nations))
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == nations[0]) & (F.col("cust_nation") == nations[1]))
            | ((F.col("supp_nation") == nations[1]) & (F.col("cust_nation") == nations[0]))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------- TPC-H Q12

def q12_priority_shipping(spark, sf_dir: str) -> DataFrame:
    """Conditional-count rollup (TPC-H Q12 shape, adapted: the driver's
    lineitem has no l_shipmode, so the group key is l_linestatus).  For
    lineitems shipped in a one-year window, count critical-priority
    (1-URGENT / 2-HIGH) vs other orders per line status.  Both inputs
    are facts: the join is an AQE-planned equi-join on the order key;
    the CASE counts are partial-aggregable, so only the tiny per-status
    rollup crosses the final exchange."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    ).select("l_orderkey", "l_linestatus")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(crit, F.lit(1))).alias("high_line_count"),
            F.count(F.when(~crit, F.lit(1))).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# --------------------------------------------------------------- TPC-H Q14

def q14_promo_revenue(spark, sf_dir: str) -> DataFrame:
    """Conditional-ratio aggregate over a broadcast dim join (TPC-H Q14
    shape): share of one month's revenue coming from PROMO-type parts.
    part is a dimension — explicit broadcast, so the shipdate-windowed
    lineitem scan (predicates pushed to parquet) never shuffles; the
    two sums are one partial-aggregable pass; 1-row result."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_pct"),
            F.round(F.sum(rev), 2).alias("total_revenue"),
            F.count("*").alias("n_items"),
        )
    )


# --------------------------------------------------------------- TPC-H Q19

def q19_disjunctive_revenue(spark, sf_dir: str) -> DataFrame:
    """Disjunctive multi-branch predicate across the join (TPC-H Q19
    shape, adapted to the driver's part schema: brand + size band +
    quantity band per branch).  The OR spans columns of BOTH relations,
    so no single conjunct pushes through the join — but Catalyst derives
    the one-sided implications (p_brand IN (..) ∧ size bounds on part;
    quantity/discount bounds on lineitem) and pushes THOSE into each
    parquet scan before the broadcast join; the cross-relation OR is
    evaluated once post-join.  1-row revenue aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    branch = lambda brand, s_lo, s_hi, q_lo, q_hi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & (F.col("p_size") >= s_lo) & (F.col("p_size") <= s_hi)
        & (F.col("l_quantity") >= q_lo) & (F.col("l_quantity") <= q_hi)
    )
    return (
        j.filter(
            branch("Brand#1", 1, 15, 1, 11)
            | branch("Brand#12", 10, 30, 10, 20)
            | branch("Brand#23", 25, 50, 20, 30)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# --------------------------------------------------------------- TPC-H Q22

def q22_idle_high_balance(spark, sf_dir: str) -> DataFrame:
    """Scalar-subquery threshold + anti-join (TPC-H Q22 shape, adapted:
    no phone prefixes in the driver schema, so the group key is the
    nation).  Customers whose balance exceeds the positive-balance mean
    and who placed NO order on/after 2001-01-01, counted per nation.

    Scale shape: the mean is a 1-row aggregate cross-joined back
    (Spark plans BroadcastNestedLoopJoin — the 1-row side broadcasts);
    the NOT-EXISTS is a left_anti join against the date-filtered orders
    projection (order-key/custkey only, predicate pushed to the scan).
    At 100 TB the anti-join's right side is one pushed-down scan
    aggregated to distinct custkeys, not the full orders table."""
    cust = _t(spark, sf_dir, "customer")
    mean_row = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01"))
        .select("o_custkey")
        .distinct()
    )
    return (
        cust.crossJoin(F.broadcast(mean_row))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("c_nationkey")
    )


# --------------------------------------------------------------- TPC-H Q8

def q8_market_share(spark, sf_dir: str) -> DataFrame:
    """Two-level conditional-share rollup (TPC-H Q8 shape): of all
    revenue shipped to customers in one region over two years, the
    fraction supplied from one nation, per ship year.  The share is a
    conditional-sum / sum ratio inside ONE partial-aggregable pass over
    the joined facts — no second scan, no self-join; supplier/customer
    attach nations through broadcast dims, and the region filter
    restricts the customer dim BEFORE its join so the fact side shrinks
    early."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    cust = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey")
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target = F.col("supp_nation") == "NATION_3"
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(
            F.round(
                F.sum(F.when(target, rev).otherwise(0.0)) / F.sum(rev), 6
            ).alias("mkt_share"),
            F.round(F.sum(rev), 2).alias("total_revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("l_year")
    )


# -------------------------------------------------------------- TPC-H Q13

def q13_customer_distribution(spark, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13 shape): LEFT OUTER
    join whose unmatched side must survive as count 0, then a second
    aggregation over the first's result.  Adapted: the reference's
    comment-pattern exclusion becomes an order-priority exclusion (the
    driver schema has no comment column).

    Scale shape: orders is aggregated per customer FIRST (partial-
    aggregable, shrinks the fact to ≤|customers| rows) and only then
    left-joined to the customer dim — the fact table never joins
    row-wise.  The second groupBy runs over ≤|customers| rows.  At any
    SF both joins are equi-joins on the customer key; AQE broadcasts
    the pre-aggregated side while it fits."""
    per_cust = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
    )
    return (
        _t(spark, sf_dir, "customer")
        .join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(F.coalesce(F.col("n"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# -------------------------------------------------------------- TPC-H Q15

def q15_top_supplier(spark, sf_dir: str) -> DataFrame:
    """Group-wise max (TPC-H Q15 shape): the supplier(s) whose quarterly
    revenue equals the maximum over all suppliers.

    Scale shape: revenue is one partial-aggregable hash agg over the
    date-pushed lineitem scan (≤|suppliers| rows out); the max is a
    1-row aggregate of THAT result cross-joined back (broadcast nested
    loop on a 1-row side), never a second fact scan.  Revenue is
    rounded to 2 dp before the equality compare so both engines
    resolve the same winner.  The supplier dim attaches to ≤|suppliers|
    rows — no hint; supplier scales with SF, AQE decides (same policy
    as q5/q18)."""
    rev = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    best = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.crossJoin(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(
            _t(spark, sf_dir, "supplier"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# -------------------------------------------------------------- TPC-H Q17

def q17_small_quantity_revenue(spark, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery de-correlated (TPC-H Q17 shape):
    yearly revenue lost if small-quantity orders (below 20% of the
    part's own average quantity) for one brand were not taken.

    Scale shape: the correlated ``0.2 * avg(l_quantity where same
    part)`` becomes one partial-aggregable per-part aggregate over the
    brand-restricted lineitem (semi-joined to the filtered part dim
    first, so the agg input shrinks ~|brand|/|part| before shuffling),
    then an equi-join back to the same restricted lines — two passes
    over a pushed-down scan, zero correlated execution.  l_quantity is
    integral so the per-part mean is exactly representable and
    order-independent: the strict `<` boundary resolves identically in
    both engines without rounding."""
    brand_parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    lines = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(brand_parts, F.col("l_partkey") == F.col("p_partkey"))
        .drop("p_partkey")
    )
    per_part = lines.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        lines.join(per_part, F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


# -------------------------------------------------------------- TPC-H Q21

def q21_waiting_suppliers(spark, sf_dir: str) -> DataFrame:
    """Multi-EXISTS de-correlated (TPC-H Q21 shape): suppliers in one
    nation who were the SOLE late supplier on a finished multi-supplier
    order.  Adapted: the driver schema has no commit/receipt dates, so
    "late" is shipped more than 150 days after the order date.

    Scale shape: the reference query's EXISTS (another supplier) +
    NOT EXISTS (another late supplier) pair de-correlates into ONE
    per-order aggregate — count(distinct supplier) and count(distinct
    late supplier) in the same partial-aggregable pass — joined back to
    the late lines; no self-join of lineitem against itself, no
    correlated re-scans.  The joined (line, order-flag) relation feeds
    both the aggregate and the join-back branch, so it is
    localCheckpoint-materialized once (the stored-index policy the
    band joins use) instead of re-executing its upstream join per
    branch.  Supplier/nation attach to ≤|late suppliers| rows
    afterwards."""
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    lo = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 150 DAYS")
            ).alias("late"),
        )
        .localCheckpoint(eager=False)
    )
    qual = (
        lo.groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(
                F.when(F.col("late"), F.col("l_suppkey"))
            ).alias("n_late_supp"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .select(F.col("l_orderkey").alias("q_orderkey"))
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .filter(F.col("n_name") == "NATION_2")
        .select("s_suppkey", "s_name")
    )
    return (
        lo.filter(F.col("late"))
        .join(qual, F.col("l_orderkey") == F.col("q_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


def event_retention(spark, sf_dir: str) -> DataFrame:
    """Weekly cohort retention over the event stream: users grouped by
    their first-active ISO week (Monday-truncated, identical in Spark
    and DuckDB); for each (cohort, week offset) the count of users still
    active that week — the retention triangle every engagement pipeline
    materializes.

    Scale shape: one partial-aggregable groupBy(user_id) builds the
    cohort table, one distinct collapses the raw stream to (user, week)
    activity rows, the equi-join runs on two already-aggregated
    O(users)-sized relations (AQE picks the strategy), and the final
    rollup is a partial-aggregable groupBy on O(weeks^2) keys — no
    window function ever touches the raw stream.  Offsets divide
    exactly by 7 (both sides Monday-truncated), so the int cast is
    truncation-free in both engines."""
    ev = _t(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts"))
    cohorts = ev.groupBy("user_id").agg(F.min(wk).alias("cohort_wk"))
    activity = ev.select("user_id", wk.alias("active_wk")).distinct()
    return (
        activity.join(cohorts, "user_id")
        .groupBy(
            F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.col("active_wk"), F.col("cohort_wk")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


def event_stickiness(spark, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day-AU stickiness per day — the engagement ratio
    every product-analytics stack reports next to the retention triangle
    (conventionally DAU/MAU; the 7-day window keeps the synthetic
    corpus's every-day coverage informative).

    Scale shape: the raw stream collapses ONCE to distinct (day, user)
    rows (partial-aggregable); the trailing window is an EXPLODE of each
    activity row into the <=7 days it serves — an equi-join shape, never
    a range/theta join (plan-lint bans BNLJ beyond 1-row scalars), so at
    10^12 events the cost is 7x the already-aggregated day-user relation,
    not a window over the stream.  Days with no activity simply don't
    appear (pinned by the equi-join back to observed days).  dau/wau is
    one division of two exact BIGINTs, bit-identical in both engines."""
    ev = _t(spark, sf_dir, "events")
    day_users = ev.select(
        F.to_date("ts").alias("day"), "user_id").distinct()
    days = day_users.select("day").distinct()
    dau = day_users.groupBy("day").agg(
        F.countDistinct("user_id").alias("dau"))
    served = day_users.select(
        F.explode(F.array(*[F.date_add("day", i) for i in range(7)]))
        .alias("day"),
        "user_id",
    )
    wau = (
        served.join(days, "day")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau", "wau",
            F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
        )
        .orderBy("day")
    )


def event_value_anomaly(spark, sf_dir: str) -> DataFrame:
    """Daily-revenue anomaly screen: z-score of each day's event-value
    total against the corpus's day-level mean/stddev, flagging |z| >= 2
    — the ops dashboard row every event pipeline alerts on.

    Exact-arithmetic discipline throughout: values go to integer CENTS
    per event (engine-side round — the q11 pattern), day sums and the
    global sum / sum-of-squares accumulate as exact integers/decimals
    (order-insensitive), and mean/var/z are then a fixed sequence of
    IEEE double ops on identical exact inputs — bit-identical
    cross-engine with no float-accumulation hazard.  Scale shape: one
    partial-aggregable groupBy(day) collapses the stream to O(days)
    rows; the global stats are a 1-row scalar crossed back (whitelisted
    BNLJ — Spark's only strategy for a keyless scalar join)."""
    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    day = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(cents).alias("s_cents"),
             F.count("*").alias("n_events"))
    )
    sq = F.col("s_cents").cast("decimal(19,0)") * F.col("s_cents")
    stats = day.agg(
        F.count("*").alias("n_days"),
        F.sum("s_cents").alias("tot"),
        F.sum(sq).alias("tot2"),
    )
    j = day.crossJoin(F.broadcast(stats))
    mean = F.col("tot").cast("double") / F.col("n_days")
    var = F.greatest(
        F.col("tot2").cast("double") / F.col("n_days") - mean * mean,
        F.lit(0.0),
    )
    z = (F.col("s_cents").cast("double") - mean) / F.nullif(
        F.sqrt(var), F.lit(0.0))
    zr = F.round(z, 6)
    return j.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_events", "s_cents",
        zr.alias("z_score"),
        (F.abs(zr) >= 2.0).cast("int").alias("is_anomaly"),
    ).orderBy("day")


# --------------------------------------------------------------- TPC-H Q2

def q2_min_cost_supplier(spark, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier per part (TPC-H Q2 shape): for every part
    of one size/type sourced from one region, the supplier(s) offering
    the region-wide minimum unit cost.  Adapted: the driver schema has
    no partsupp relation, so the part-supplier offer table is DERIVED
    from lineitem — a supplier's unit cost for a part is the cheapest
    ``l_extendedprice / l_quantity`` it ever shipped.  The correlated
    ``cost = (SELECT min(cost) ...)`` subquery de-correlates into one
    per-part aggregate joined back on exact equality.

    Scale shape: the offer table is a partial-aggregable
    groupBy(part, supplier) min over a pushed-down two-column-plus-keys
    lineitem scan; the part/supplier/nation/region dims broadcast; the
    per-part min is a second partial-aggregable pass over the already
    part-filtered offers (|offers| ~ |part|x|suppliers-per-part|, tiny
    next to lineitem).  The min-equality join-back is exact in both
    engines: min() selects an existing IEEE division result, it never
    synthesizes a new float.  ORDER BY is fully tie-broken, LIMIT 100
    plans as TakeOrderedAndProject."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_size") == 15) & (F.col("p_type") == "SMALL"))
        .select("p_partkey")
    )
    offers = (
        _t(spark, sf_dir, "lineitem")
        .select(
            "l_partkey",
            "l_suppkey",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit"),
        )
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min("unit").alias("unit_cost"))
    )
    best = offers.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("unit_cost").alias("best_cost")
    )
    return (
        offers.join(
            best,
            (F.col("l_partkey") == F.col("b_partkey"))
            & (F.col("unit_cost") == F.col("best_cost")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            F.round("unit_cost", 6).alias("min_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# --------------------------------------------------------------- TPC-H Q9

def q9_product_type_profit(spark, sf_dir: str) -> DataFrame:
    """Product-type profit by supplier nation and year (TPC-H Q9
    shape): every line shipping a part whose name matches a pattern,
    profit rolled up per (nation, year).  Adapted: the driver schema
    has no partsupp.ps_supplycost, so cost is a deterministic surrogate
    — 60% of the part's retail price per unit — keeping the exact
    join/agg topology (lineitem x part x supplier x nation x orders).

    Float-parity discipline (q11/q20 pattern): profit is computed per
    line in EXACT integer units of 1e-4 dollars —
    ``ext_c*(100-disc_c) - 60*price_c*qty`` with all factors rounded to
    integer cents — and summed as BIGINT, so the result is independent
    of Spark vs DuckDB float-addition order (a round-2dp double sum was
    observed to flip the last cent at sf0.001).  `sum_profit_c4` is the
    exact profit in 1e-4 dollars.

    Scale shape: the part dim is name-filtered BEFORE its broadcast
    join so the fact side shrinks at the scan (substring pushdown
    yields a ~1/n_nouns selectivity here); supplier/nation broadcast;
    orders attaches only o_orderdate for the year key.  One
    partial-aggregable groupBy over (25 nations x years) keys — the
    rollup never shuffles more than the joined fact once."""
    parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("bolt"))
        .select(
            "p_partkey",
            F.round(F.col("p_retailprice") * 100, 0).cast("long").alias("price_c"),
        )
    )
    supp_nation = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    ext_c = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    disc_c = F.round(F.col("l_discount") * 100, 0).cast("long")
    qty = F.round(F.col("l_quantity"), 0).cast("long")
    profit_c4 = ext_c * (F.lit(100).cast("long") - disc_c) - (
        F.lit(60).cast("long") * F.col("price_c") * qty
    )
    return (
        _t(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey", "l_partkey", "l_suppkey",
            "l_quantity", "l_extendedprice", "l_discount",
        )
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            F.sum(profit_c4).alias("sum_profit_c4"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("nation", F.desc("o_year"))
    )


# -------------------------------------------------------------- TPC-H Q11

def q11_important_parts(spark, sf_dir: str) -> DataFrame:
    """Important-stock identification (TPC-H Q11 shape): per-part value
    held by one nation's suppliers, keeping parts whose value exceeds a
    fixed fraction of the nation-wide total — a grouped aggregate
    HAVING-compared against a scalar subquery over the SAME relation.
    Adapted: no partsupp.ps_availqty, so value = shipped quantity times
    the part's retail price in integer cents, making the group/total
    comparison exact integer arithmetic in both engines (no float sum
    order can flip a boundary row).

    Scale shape: the nation filter semi-joins the supplier dim down
    BEFORE the fact join; one partial-aggregable groupBy(part) pass;
    the scalar total re-aggregates the per-part relation (O(|part|)
    rows, not a second fact scan); the scalar attaches via a 1-row
    broadcast nested-loop — the only physical strategy for a keyless
    scalar cross, whitelisted in the plan lint."""
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .filter(F.col("n_name") == "NATION_7")
        .select("s_suppkey")
    )
    parts = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100, 0).cast("long").alias("price_c"),
    )
    per_part = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey_out"))
        .agg(
            F.sum(F.col("l_quantity").cast("long") * F.col("price_c")).alias(
                "value_cents"
            ),
            F.count_distinct(F.col("l_suppkey")).alias("n_suppliers"),
        )
    )
    total = per_part.agg(F.sum("value_cents").alias("total_cents"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_cents") * 1000 > F.col("total_cents"))
        .select(
            F.col("p_partkey_out").alias("p_partkey"),
            "value_cents",
            "n_suppliers",
        )
        .orderBy(F.desc("value_cents"), "p_partkey")
    )


# -------------------------------------------------------------- TPC-H Q16

def q16_supplier_part_counts(spark, sf_dir: str) -> DataFrame:
    """Parts/supplier relationship (TPC-H Q16 shape): how many distinct
    suppliers can ship parts of each (brand, type, size), excluding one
    brand, one type family, an IN-list of sizes, and every supplier on
    the complaints list (NOT IN anti-join).  Adapted: the part-supplier
    relation derives from lineitem's distinct (part, supplier) pairs,
    and the complaint proxy is a negative account balance.

    Scale shape: the distinct pair-collapse is the only fact-sized
    shuffle (partial-aggregable, two key columns wide); the complaint
    list is an O(suppliers-with-complaints) broadcast anti-join; part
    attribute filters broadcast; count_distinct runs over the already
    collapsed pair relation.  Counts are exact integers — no float
    hazard anywhere."""
    pairs = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    complainers = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    parts = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    return (
        pairs.join(
            F.broadcast(complainers),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# -------------------------------------------------------------- TPC-H Q20

def q20_dominant_suppliers(spark, sf_dir: str) -> DataFrame:
    """Potential-promotion suppliers (TPC-H Q20 shape): suppliers in
    one nation who, for some part of a named family, shipped MORE THAN
    HALF of that part's total 1997 volume — a nested pair of correlated
    subqueries (per-(part,supplier) quantity vs per-part threshold)
    de-correlated into two chained aggregates and a semi-join.
    Adapted: no partsupp.ps_availqty, so the classic availability-vs-
    half-of-shipped test becomes supplier-share-of-volume; the plan
    topology (agg -> scalar-per-group threshold -> semi-join into a
    nation-filtered supplier list) is identical.

    Scale shape: one partial-aggregable groupBy(part, supplier) over
    the name+year-restricted fact (both predicates pushed to the
    scan); the per-part total reuses that aggregate (O(|parts|) rows);
    doubling instead of halving keeps the dominance test in exact
    integer arithmetic; the final semi-join broadcasts the qualifying
    supplier keys into the nation-filtered dim."""
    promo_parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("red"))
        .select("p_partkey")
    )
    shipped = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(F.broadcast(promo_parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("supp_qty"))
    )
    totals = shipped.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("supp_qty").alias("part_qty")
    )
    dominant = (
        shipped.join(totals, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("supp_qty") * 2 > F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .filter(F.col("n_name") == "NATION_5")
        .join(
            F.broadcast(dominant),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


def event_attribution(spark, sf_dir: str, window_days: int = 7) -> DataFrame:
    """Last-touch revenue attribution — the marketing-analytics consumer
    of the event stream: each purchase is credited to the user's most
    recent preceding touch event (view / click / signup) within
    *window_days*; older or absent touches fall to the 'direct' bucket.

    Semantics pinned cross-engine: the "most recent preceding" row is
    last_value(... IGNORE NULLS) over (PARTITION BY user_id ORDER BY
    ts, event_id ROWS UNBOUNDED PRECEDING TO 1 PRECEDING) — a total
    order, so ts ties cannot flip the winner; the recency test is
    interval arithmetic (timezone-free in both engines); revenue goes
    to integer CENTS before any sum (order-insensitive); share is one
    division on exact integers + round 6dp (fixed IEEE sequence).

    Scale shape: ONE shuffle on user_id runs both window expressions in
    the same sort (the event_sessions discipline); everything after is
    a partial-aggregable groupBy on O(4) keys plus a whitelisted 1-row
    broadcast cross for the denominator."""
    ev = _t(spark, sf_dir, "events")
    touches = ("view", "click", "signup")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin(*touches)
    t_ts = F.last(F.when(is_touch, F.col("ts")), ignorenulls=True).over(w)
    t_type = F.last(
        F.when(is_touch, F.col("event_type")), ignorenulls=True
    ).over(w)
    cents = F.round(F.col("value") * 100, 0).cast("long")
    pur = (
        ev.withColumn("t_ts", t_ts)
        .withColumn("t_type", t_type)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.when(
                F.col("t_ts").isNotNull()
                & (F.col("ts") - F.col("t_ts")
                   <= F.expr(f"INTERVAL {window_days} DAYS")),
                F.col("t_type"),
            ).otherwise(F.lit("direct")).alias("touch_type"),
            cents.alias("cents"),
        )
    )
    tot = pur.agg(F.sum("cents").alias("tot_cents"))
    return (
        pur.groupBy("touch_type")
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum("cents").alias("attributed_cents"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "touch_type",
            "n_purchases",
            "attributed_cents",
            F.round(
                F.col("attributed_cents").cast("double")
                / F.col("tot_cents").cast("double"), 6
            ).alias("share"),
        )
        .orderBy("touch_type")
    )


def event_ab_test(spark, sf_dir: str) -> DataFrame:
    """Experiment readout — the two-proportion z-test every product
    analytics stack runs on an event stream: users split into variants
    by the deterministic id-bucket assignment (user_id % 2, the
    transparent stand-in for hash-bucketing), conversion = the user has
    at least one HIGH-VALUE purchase (value >= 95 — plain any-purchase
    saturates at p=1 on this stream, leaving the test no variance), and
    the pooled z-score decides significance at the 1.96 two-sided bar.

    Exactness discipline: every input to the statistic (user counts,
    conversion counts) is an exact BIGINT from one partial-aggregable
    per-user max + one scalar conditional aggregate; the z-score is
    then a FIXED sequence of IEEE double ops on those identical
    integers, mirrored operation-for-operation in the oracle SQL — no
    float accumulation anywhere.  Scale shape: one shuffle (per-user
    aggregate), then a 1-row scalar aggregate; nothing else moves."""
    ev = _t(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.max(((F.col("event_type") == "purchase")
               & (F.col("value") >= 95.0)).cast("int"))
        .alias("converted")
    )
    is_a = (F.col("user_id") % 2 == 0).cast("long")
    is_b = (F.col("user_id") % 2 == 1).cast("long")
    g = users.agg(
        F.sum(is_a).alias("n_users_a"),
        F.sum(is_a * F.col("converted")).alias("n_conv_a"),
        F.sum(is_b).alias("n_users_b"),
        F.sum(is_b * F.col("converted")).alias("n_conv_b"),
    )
    p1 = F.col("n_conv_a").cast("double") / F.col("n_users_a")
    p2 = F.col("n_conv_b").cast("double") / F.col("n_users_b")
    p = (F.col("n_conv_a") + F.col("n_conv_b")).cast("double") / (
        F.col("n_users_a") + F.col("n_users_b")
    )
    se = F.sqrt(p * (F.lit(1.0) - p)
                * (F.lit(1.0) / F.col("n_users_a")
                   + F.lit(1.0) / F.col("n_users_b")))
    # nullif guards the degenerate no-variance case (p pooled 0 or 1,
    # possible at tiny scale factors): z is NULL, significant is 0
    z = F.round((p1 - p2) / F.nullif(se, F.lit(0.0)), 6)
    return g.select(
        "n_users_a", "n_conv_a", F.round(p1, 6).alias("rate_a"),
        "n_users_b", "n_conv_b", F.round(p2, 6).alias("rate_b"),
        z.alias("z_score"),
        F.coalesce((F.abs(z) >= 1.96).cast("int"), F.lit(0))
        .alias("significant"),
    )


CMS_D = 4       # sketch depth (independent md5-salted hash rows)
CMS_HEX = 2     # bucket = first 2 md5 hex digits -> w = 256, no modulo


def event_heavy_hitters_cms(spark, sf_dir: str, k: int = 20) -> DataFrame:
    """Count-min-sketch heavy hitters — the third classic distributed
    sketch next to the repo's HLL (distinct_users_approx) and KLL-style
    quantiles (doc_length_quantiles_approx): a d x w counter table
    whose cells are the only shuffled state, with the one-sided
    guarantee est >= true ALWAYS and est - true bounded by colliding
    mass.  Reported per top-k user (by exact count) with the exact
    count alongside — the calibration table that justifies shipping
    the sketch, mirroring emb_ann_recall's recall-not-vibes pattern.

    Buckets are exact hex-prefix integers of salted md5 (the bloom
    idiom — no float, no modulo), so both engines derive identical
    cells.  Scale shape: counts partial-aggregate per key BEFORE
    sketch insertion (map-side combine), the sketch is d*w = 1024
    rows, and the estimate join broadcasts it; at 10^12 events the
    only full-stream pass is the first partial agg."""
    ev = _t(spark, sf_dir, "events")
    ucnt = ev.groupBy("user_id").agg(F.count("*").alias("true_count"))
    probes = ucnt.select(
        "user_id", "true_count",
        F.explode(F.array(*[F.lit(j) for j in range(CMS_D)])).alias("j"),
    )
    h = F.md5(F.concat(F.lit("cms"), F.col("j").cast("string"),
                       F.lit("|"), F.col("user_id").cast("string")))
    probes = probes.withColumn(
        "pos", F.conv(F.substring(h, 1, CMS_HEX), 16, 10).cast("int"))
    sketch = probes.groupBy("j", "pos").agg(
        F.sum("true_count").alias("cell"))
    est = (
        probes.join(F.broadcast(sketch), ["j", "pos"])
        .groupBy("user_id", "true_count")
        .agg(F.min("cell").alias("cms_est"))
    )
    return (
        est.select(
            "user_id", "true_count", "cms_est",
            (F.col("cms_est") - F.col("true_count")).alias("overestimate"),
        )
        .orderBy(F.desc("true_count"), F.asc("user_id"))
        .limit(k)
    )


def event_transitions(spark, sf_dir: str) -> DataFrame:
    """Event-type transition matrix (path analysis): counts and row-
    normalized probabilities of consecutive (prev -> next) event-type
    pairs within each user's stream — the Markov view of product flow
    that funnel analysis summarizes and session replay drills into.

    The lag runs in ONE (user_id; ts, event_id) sort (the
    event_sessions / event_attribution discipline — a total order, so
    ts ties cannot flip a transition); the rollup is a partial-
    aggregable groupBy on O(types^2) keys, and the row probability is
    one division of exact BIGINTs via a window over the tiny
    aggregated relation."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )
    w_row = Window.partitionBy("prev_type")
    return (
        pairs.withColumn("row_total", F.sum("n").over(w_row))
        .select(
            "prev_type", "next_type", "n",
            F.round(F.col("n").cast("double") / F.col("row_total"), 6)
            .alias("p"),
        )
        .orderBy("prev_type", "next_type")
    )


def event_pareto(spark, sf_dir: str) -> DataFrame:
    """Activity-concentration (Pareto) table: users ranked by event
    count into deciles (NTILE over the total order count DESC, user_id
    ASC — remainder distribution is SQL-standard and identical in both
    engines), with each decile's user count, event count, event share,
    and cumulative share — the "top 10% of users produce X% of
    activity" readout every engagement report leads with.

    Exactness: counts are BIGINTs end-to-end; shares are single
    divisions of exact integers; the cumulative sum runs over the
    10-row aggregated relation only.  Scale shape: one partial-
    aggregable per-user groupBy; the NTILE window sorts the O(users)
    aggregate, never the raw stream."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count("*").alias("n_events"))
    w = Window.orderBy(F.desc("n_events"), F.asc("user_id"))
    decs = per_user.withColumn("decile", F.ntile(10).over(w))
    g = decs.groupBy("decile").agg(
        F.count("*").alias("n_users"),
        F.sum("n_events").alias("n_events"),
    )
    w_all = Window.partitionBy()
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0)
    return (
        g.withColumn("total", F.sum("n_events").over(w_all))
        .withColumn("cum", F.sum("n_events").over(w_cum))
        .select(
            "decile", "n_users", "n_events",
            F.round(F.col("n_events").cast("double") / F.col("total"), 6)
            .alias("share"),
            F.round(F.col("cum").cast("double") / F.col("total"), 6)
            .alias("cum_share"),
        )
        .orderBy("decile")
    )
