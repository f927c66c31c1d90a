"""TPC-H completion pack: ALL 22 classic optimizer shapes are now covered,
adapted to the driver schema (no partsupp / l_shipmode / c_phone —
documented per key; partsupp-derived relations come from lineitem).

The reference engine (damir-kalin/flink-job) has no joins at all (SURVEY
§2.6); these keys exist because an analytics user switching onto this engine
runs exactly these shapes. Complements the Q1/Q3/Q4/Q6/Q13/Q15/Q17/Q21 forms
already in queries/relational.py; this module holds Q2/Q5/Q7/Q8/Q9/Q10/Q11/
Q12/Q14/Q16/Q18/Q19/Q20/Q22. Conventions (see relational.py docstring):
dimension joins broadcast, fact-fact joins stay unhinted for AQE, money sums
go through exact DECIMAL and exit via the shared _OUT4 scale-4-then-double
rendering, and every LIMIT-k carries a total-order tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_job_spark.queries import register
from flink_job_spark.queries.relational import _OUT4, _VDEC, _out4_col, _vdec_col
from flink_job_spark.sources.tables import load_table

_REV = "l_extendedprice * (1 - l_discount)"


def _rev_col():
    return _vdec_col(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))


# --- q_local_supplier_volume: TPC-H Q5 ----------------------------------------

Q5_REGION = "ASIA"
Q5_FROM = "1996-01-01"
Q5_TO = "1997-01-01"

@register(
    "q_local_supplier_volume",
    f"""SELECT n_name,
           {_OUT4.format(s=f"SUM({_VDEC.format(x=_REV)})")} AS revenue,
           CAST(COUNT(1) AS BIGINT) AS n_lines
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = '{Q5_REGION}'
      AND o_orderdate >= TIMESTAMP '{Q5_FROM} 00:00:00'
      AND o_orderdate <  TIMESTAMP '{Q5_TO} 00:00:00'
    GROUP BY n_name""",
    doc=f"TPC-H Q5 local supplier volume: revenue where customer and "
        f"supplier share a nation inside region {Q5_REGION} — the 6-table "
        "snowflake with a join predicate BETWEEN two dimensions "
        "(c_nationkey = s_nationkey), grouped by nation",
    tags=("relational", "join", "agg", "tpch"),
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The region filter shrinks nation to 5 keys, which broadcast into
    supplier; the supplier⋈nation product (100 rows here, ~10M at 100 TB but
    projected to 3 columns — still broadcastable) broadcasts into the
    lineitem scan, so the only big-big joins are li⋈orders and ⋈customer,
    both unhinted so AQE picks sort-merge (or skew-splits) at scale. The
    c_nationkey = s_nationkey correlation rides the customer join condition —
    never a post-join filter, so non-local rows die inside the join."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    local_sup = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
         .join(F.broadcast(r.filter(F.col("r_name") == Q5_REGION)),
               F.col("n_regionkey") == F.col("r_regionkey"))
         .select("s_suppkey", "s_nationkey", "n_name")
    )
    o_f = o.filter(
        (F.col("o_orderdate") >= F.lit(Q5_FROM).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q5_TO).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    return (
        li.join(F.broadcast(local_sup), li["l_suppkey"] == F.col("s_suppkey"))
          .join(o_f, li["l_orderkey"] == o_f["o_orderkey"])
          .join(c, (F.col("o_custkey") == c["c_custkey"])
                   & (c["c_nationkey"] == F.col("s_nationkey")))
          .groupBy("n_name")
          .agg(_out4_col(F.sum(_rev_col())).alias("revenue"),
               F.count(F.lit(1)).cast("bigint").alias("n_lines"))
    )


# --- q_trade_volume: TPC-H Q7 --------------------------------------------------

Q7_NATION_A = "NATION_1"
Q7_NATION_B = "NATION_2"
Q7_FROM = "1996-01-01"
Q7_TO = "1998-01-01"

@register(
    "q_trade_volume",
    f"""SELECT supp_nation, cust_nation, l_year,
           {_OUT4.format(s='SUM(vol)')} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             {_VDEC.format(x=_REV)} AS vol
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = '{Q7_NATION_A}' AND n2.n_name = '{Q7_NATION_B}')
          OR (n1.n_name = '{Q7_NATION_B}' AND n2.n_name = '{Q7_NATION_A}'))
        AND l_shipdate >= TIMESTAMP '{Q7_FROM} 00:00:00'
        AND l_shipdate <  TIMESTAMP '{Q7_TO} 00:00:00')
    GROUP BY supp_nation, cust_nation, l_year""",
    doc=f"TPC-H Q7 volume shipping: bilateral trade between "
        f"{Q7_NATION_A} and {Q7_NATION_B} by supplier-nation, "
        "customer-nation and ship year — the disjunctive two-nation "
        "pair predicate spanning two dimension role-plays",
    tags=("relational", "join", "agg", "tpch"),
)
def q_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation role-plays twice (supplier side, customer side). Each side is
    pre-filtered to the 2-nation set BEFORE joining — the disjunction
    ((A,B) or (B,A)) then only needs the cross-pair inequality, applied on
    the joined row. supplier⋈n1 broadcasts into lineitem; customer⋈n2 is
    big at scale, so that join and li⋈orders stay unhinted. The year comes
    from l_shipdate (cast bigint to match the oracle's year())."""
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    pair = [Q7_NATION_A, Q7_NATION_B]
    n1 = n.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation"))
    n2 = n.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation"))
    sup = s.join(F.broadcast(n1), s["s_nationkey"] == F.col("nk1"))
    cus = c.join(F.broadcast(n2), c["c_nationkey"] == F.col("nk2"))
    return (
        li.filter((F.col("l_shipdate") >= F.lit(Q7_FROM).cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit(Q7_TO).cast("timestamp")))
          .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
          .join(o, li["l_orderkey"] == o["o_orderkey"])
          .join(cus, F.col("o_custkey") == cus["c_custkey"])
          .filter(F.col("supp_nation") != F.col("cust_nation"))
          .groupBy("supp_nation", "cust_nation",
                   F.year("l_shipdate").cast("bigint").alias("l_year"))
          .agg(_out4_col(F.sum(_rev_col())).alias("revenue"))
    )


# --- q_market_share: TPC-H Q8 --------------------------------------------------

Q8_MARKET_REGION = "EUROPE"
Q8_TARGET_NATION = "NATION_3"
Q8_PTYPE = "ECONOMY"

@register(
    "q_market_share",
    f"""SELECT o_year,
           ROUND(CAST(nation_vol AS DOUBLE) / CAST(total_vol AS DOUBLE), 6)
               AS mkt_share,
           {_OUT4.format(s='nation_vol')} AS nation_revenue,
           {_OUT4.format(s='total_vol')} AS total_revenue
    FROM (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             SUM(CASE WHEN supp_nation = '{Q8_TARGET_NATION}'
                      THEN vol ELSE CAST(0 AS DECIMAL(38,10)) END) AS nation_vol,
             SUM(vol) AS total_vol
      FROM (
        SELECT o_orderdate, n1.n_name AS supp_nation,
               {_VDEC.format(x=_REV)} AS vol
        FROM part, lineitem, orders, customer, nation n2, region, supplier,
             nation n1
        WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
          AND o_custkey = c_custkey AND c_nationkey = n2.n_nationkey
          AND n2.n_regionkey = r_regionkey AND r_name = '{Q8_MARKET_REGION}'
          AND l_suppkey = s_suppkey AND s_nationkey = n1.n_nationkey
          AND p_type = '{Q8_PTYPE}')
      GROUP BY CAST(year(o_orderdate) AS BIGINT))""",
    doc=f"TPC-H Q8 national market share: the fraction of "
        f"{Q8_MARKET_REGION}'s {Q8_PTYPE}-part revenue supplied by "
        f"{Q8_TARGET_NATION}, per order year — conditional-sum ratio over "
        "an 8-table snowflake with nation role-played twice; the share is "
        "ONE IEEE division of two exact decimal sums",
    tags=("relational", "join", "agg", "tpch"),
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numerator and denominator accumulate as EXACT decimals in the same
    grouped pass (partial-agg friendly); the engine-sensitive division
    happens once per year row, after rounding scale is fixed — the
    double-division-inside-SUM form would make the share order-dependent.
    part is projected to (p_partkey) post-filter and broadcast; the market
    side (customer⋈nation⋈region) broadcasts its region-pruned keys;
    supplier⋈nation broadcasts with n_name carried for the CASE."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey",
                                                   "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    market_nations = (
        n.join(F.broadcast(r.filter(F.col("r_name") == Q8_MARKET_REGION)),
               n["n_regionkey"] == r["r_regionkey"])
         .select(F.col("n_nationkey").alias("mkt_nk"))
    )
    sup = (
        s.join(F.broadcast(n.select(F.col("n_nationkey").alias("nk1"),
                                    F.col("n_name").alias("supp_nation"))),
               s["s_nationkey"] == F.col("nk1"))
         .select("s_suppkey", "supp_nation")
    )
    parts = p.filter(F.col("p_type") == Q8_PTYPE).select("p_partkey")
    vol = _rev_col()
    zero = F.lit(0).cast("decimal(38,10)")
    joined = (
        li.join(F.broadcast(parts), li["l_partkey"] == parts["p_partkey"])
          .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
          .join(o, li["l_orderkey"] == o["o_orderkey"])
          .join(c, F.col("o_custkey") == c["c_custkey"])
          .join(F.broadcast(market_nations),
                c["c_nationkey"] == F.col("mkt_nk"))
    )
    agg = (
        joined.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
              .agg(F.sum(F.when(F.col("supp_nation") == Q8_TARGET_NATION, vol)
                          .otherwise(zero)).alias("nation_vol"),
                   F.sum(vol).alias("total_vol"))
    )
    return agg.select(
        "o_year",
        F.round(F.col("nation_vol").cast("double")
                / F.col("total_vol").cast("double"), 6).alias("mkt_share"),
        _out4_col(F.col("nation_vol")).alias("nation_revenue"),
        _out4_col(F.col("total_vol")).alias("total_revenue"),
    )


# --- q_returned_items: TPC-H Q10 -----------------------------------------------

Q10_FROM = "1997-01-01"
Q10_TO = "1997-04-01"
Q10_TOPK = 20

@register(
    "q_returned_items",
    f"""SELECT c_custkey, c_name,
           {_OUT4.format(s=f"SUM({_VDEC.format(x=_REV)})")} AS revenue,
           c_acctbal, n_name, c_mktsegment
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '{Q10_FROM} 00:00:00'
      AND o_orderdate <  TIMESTAMP '{Q10_TO} 00:00:00'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
    ORDER BY SUM({_VDEC.format(x=_REV)}) DESC, c_custkey
    LIMIT {Q10_TOPK}""",
    doc=f"TPC-H Q10 returned-item reporting: top-{Q10_TOPK} customers by "
        "revenue lost to returns in one quarter — join + wide-group "
        "aggregate + exact-decimal top-k (tie-broken on custkey)",
    tags=("relational", "join", "agg", "tpch", "topk"),
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returns ('R') and the quarter window prune lineitem/orders at the
    scan; the surviving fact joins shuffle once on orderkey, then once on
    custkey into the customer dim (big at scale — unhinted). The group
    carries the customer attributes (they're functionally dependent on
    custkey, but carrying them beats a second join-back), ranking happens
    on the EXACT decimal revenue, and TakeOrderedAndProject fuses the
    sort+limit so only 20 rows reach the driver side of the plan."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    o_f = o.filter(
        (F.col("o_orderdate") >= F.lit(Q10_FROM).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q10_TO).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    agg = (
        li.filter(F.col("l_returnflag") == "R")
          .join(o_f, li["l_orderkey"] == o_f["o_orderkey"])
          .join(c, F.col("o_custkey") == c["c_custkey"])
          .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
          .groupBy("c_custkey", "c_name", "c_acctbal", "n_name",
                   "c_mktsegment")
          .agg(F.sum(_rev_col()).alias("_rev_exact"))
    )
    return (
        agg.orderBy(F.col("_rev_exact").desc(), F.col("c_custkey"))
           .limit(Q10_TOPK)
           .select("c_custkey", "c_name",
                   _out4_col(F.col("_rev_exact")).alias("revenue"),
                   "c_acctbal", "n_name", "c_mktsegment")
    )


# --- q_promo_revenue: TPC-H Q14 ------------------------------------------------

Q14_FROM = "1997-09-01"
Q14_TO = "1997-10-01"

@register(
    "q_promo_revenue",
    f"""SELECT
        ROUND(CAST(promo AS DOUBLE) / CAST(total AS DOUBLE) * 100.0, 6)
            AS promo_pct,
        {_OUT4.format(s='promo')} AS promo_revenue,
        {_OUT4.format(s='total')} AS total_revenue
    FROM (
      SELECT SUM(CASE WHEN p_type = 'PROMO' THEN {_VDEC.format(x=_REV)}
                      ELSE CAST(0 AS DECIMAL(38,10)) END) AS promo,
             SUM({_VDEC.format(x=_REV)}) AS total
      FROM lineitem, part
      WHERE l_partkey = p_partkey
        AND l_shipdate >= TIMESTAMP '{Q14_FROM} 00:00:00'
        AND l_shipdate <  TIMESTAMP '{Q14_TO} 00:00:00')""",
    doc="TPC-H Q14 promotion effect: the percentage of one month's revenue "
        "from PROMO-type parts — conditional-sum ratio with the division "
        "done ONCE on exact decimal sums (p_type = 'PROMO' adapts the "
        "reference's LIKE 'PROMO%%' to this schema's enum-like p_type)",
    tags=("relational", "join", "agg", "tpch"),
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part reduces to (p_partkey, is_promo) — 9 bytes a row — before the
    broadcast, so even a 100 TB-scale part table ships a few GB, and at
    that scale the hint drops and AQE falls back to a partkey shuffle
    join. The month filter is pushed to the lineitem scan; one global
    aggregate row carries both exact sums, then the single division and
    the *100.0 happen in a fixed order matching the oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (load_table(spark, sf_dir, "part")
         .select("p_partkey", (F.col("p_type") == "PROMO").alias("_is_promo")))
    vol = _rev_col()
    zero = F.lit(0).cast("decimal(38,10)")
    agg = (
        li.filter((F.col("l_shipdate") >= F.lit(Q14_FROM).cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit(Q14_TO).cast("timestamp")))
          .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
          .agg(F.sum(F.when(F.col("_is_promo"), vol).otherwise(zero))
                .alias("promo"),
               F.sum(vol).alias("total"))
    )
    return agg.select(
        F.round(F.col("promo").cast("double") / F.col("total").cast("double")
                * F.lit(100.0), 6).alias("promo_pct"),
        _out4_col(F.col("promo")).alias("promo_revenue"),
        _out4_col(F.col("total")).alias("total_revenue"),
    )


# --- q_big_orders: TPC-H Q18 ---------------------------------------------------

Q18_QTY_MIN = 300
Q18_TOPK = 10

@register(
    "q_big_orders",
    f"""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
               AS total_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey
                         HAVING SUM(CAST(l_quantity AS DECIMAL(18,6)))
                                > {Q18_QTY_MIN})
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT {Q18_TOPK}""",
    doc=f"TPC-H Q18 large-volume customers: orders whose line quantities "
        f"sum past {Q18_QTY_MIN}, with their customers, top-{Q18_TOPK} by "
        "order value — the HAVING-subquery membership shape solved with "
        "ONE lineitem aggregation reused for both the filter and the sum",
    tags=("relational", "join", "agg", "tpch", "topk"),
)
def q_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The textbook plan scans lineitem twice (IN-subquery + outer sum);
    here the per-order quantity aggregate is computed ONCE and the HAVING
    becomes a filter on it. The surviving key set is tiny (half-a-dozen
    orders per million), so it broadcasts into orders, and that result —
    tinier still — broadcasts into customer: after the single orderkey
    shuffle for the aggregate, NO further shuffle touches a big table.
    Exact-decimal quantity sums; o_totalprice DESC with orderkey
    tie-break pins the top-k."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    li = load_table(spark, sf_dir, "lineitem")
    qty = (
        li.groupBy("l_orderkey")
          .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)"))
                .alias("_qty_exact"))
          .filter(F.col("_qty_exact") > Q18_QTY_MIN)
    )
    return (
        o.join(F.broadcast(qty), o["o_orderkey"] == qty["l_orderkey"])
         .join(c, o["o_custkey"] == c["c_custkey"])
         .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
         .limit(Q18_TOPK)
         .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                 "o_totalprice",
                 F.col("_qty_exact").cast("double").alias("total_qty"))
    )


# --- q_disjunctive_revenue: TPC-H Q19 ------------------------------------------

Q19_ARMS = (
    ("Brand#12", 1, 15, 1, 11),
    ("Brand#23", 1, 25, 10, 20),
    ("Brand#4", 1, 35, 20, 30),
)

def _q19_arm_sql(brand: str, s0: int, s1: int, q0: int, q1: int) -> str:
    return (f"(p_brand = '{brand}' AND p_size BETWEEN {s0} AND {s1} "
            f"AND l_quantity BETWEEN {q0} AND {q1})")

@register(
    "q_disjunctive_revenue",
    f"""SELECT {_OUT4.format(s=f"SUM({_VDEC.format(x=_REV)})")} AS revenue,
           CAST(COUNT(1) AS BIGINT) AS n_lines
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ({' OR '.join(_q19_arm_sql(*a) for a in Q19_ARMS)})""",
    doc="TPC-H Q19 discounted revenue: three OR'd (brand, size-range, "
        "quantity-range) conjunctions across the lineitem⋈part join — the "
        "disjunctive-predicate shape that tests CNF extraction (the "
        "p_brand/p_size legs must still prune part BEFORE the join)",
    tags=("relational", "join", "agg", "tpch"),
)
def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The join-independent part of the disjunction (brand+size arms) is
    applied to part BEFORE the join — Catalyst derives it via constraint
    propagation, but stating it explicitly guarantees the part side prunes
    even if CNF extraction declines (too many arms). The full mixed
    predicate then runs post-join; part survives as (p_partkey, p_brand,
    p_size) and broadcasts. One global aggregate row."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand",
                                                 "p_size")
    def arm_part(brand, s0, s1, q0, q1):
        return (F.col("p_brand") == brand) & F.col("p_size").between(s0, s1)
    def arm_full(brand, s0, s1, q0, q1):
        return (arm_part(brand, s0, s1, q0, q1)
                & F.col("l_quantity").between(q0, q1))
    part_pred = arm_part(*Q19_ARMS[0])
    full_pred = arm_full(*Q19_ARMS[0])
    for a in Q19_ARMS[1:]:
        part_pred = part_pred | arm_part(*a)
        full_pred = full_pred | arm_full(*a)
    return (
        li.join(F.broadcast(p.filter(part_pred)),
                li["l_partkey"] == p["p_partkey"])
          .filter(full_pred)
          .agg(_out4_col(F.sum(_rev_col())).alias("revenue"),
               F.count(F.lit(1)).cast("bigint").alias("n_lines"))
    )


# --- q_idle_rich_customers: TPC-H Q22 shape ------------------------------------

Q22_CODES = ("00", "11", "22", "33", "44", "55", "66")
Q22_RECENT = "2000-01-01"

@register(
    "q_idle_rich_customers",
    f"""WITH avg_bal AS (
         SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                / CAST(COUNT(1) AS DOUBLE) AS threshold
         FROM customer
         WHERE c_acctbal > 0.0
           AND substring(c_name, 17, 2) IN {Q22_CODES!r})
       SELECT cntrycode, CAST(COUNT(1) AS BIGINT) AS numcust,
              {_OUT4.format(s='SUM(CAST(c_acctbal AS DECIMAL(18,6)))')}
                  AS totacctbal
       FROM (
         SELECT substring(c_name, 17, 2) AS cntrycode, c_acctbal
         FROM customer c
         WHERE substring(c_name, 17, 2) IN {Q22_CODES!r}
           AND c_acctbal > (SELECT threshold FROM avg_bal)
           AND NOT EXISTS (
             SELECT 1 FROM orders o
             WHERE o.o_custkey = c.c_custkey
               AND o.o_orderdate >= TIMESTAMP '{Q22_RECENT} 00:00:00'))
       GROUP BY cntrycode""",
    doc="TPC-H Q22 global sales opportunity (adapted: customer-name suffix "
        "for the missing c_phone country code; 'no orders' relaxed to 'no "
        f"orders since {Q22_RECENT}' — this corpus has no order-less "
        "customers): above-average-balance customers gone idle, counted "
        "per code — scalar-average subquery + anti join",
    tags=("relational", "join", "agg", "tpch", "setop"),
)
def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The global average is a 1-row aggregate broadcast back as a cross
    join (never a driver collect); the NOT EXISTS is a LEFT ANTI join
    against the date-pruned orders scan, shuffling only custkeys. The
    average divides exact-decimal sum by exact count ONCE, so the
    threshold double is bit-identical across engines; the in-code-set
    filter prunes customer before anything shuffles."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    coded = (
        c.withColumn("cntrycode", F.substring("c_name", 17, 2))
         .filter(F.col("cntrycode").isin(list(Q22_CODES)))
         .select("c_custkey", "cntrycode", "c_acctbal")
    )
    thr = (
        coded.filter(F.col("c_acctbal") > 0.0)
             .agg((F.sum(F.col("c_acctbal").cast("decimal(18,6)"))
                    .cast("double")
                   / F.count(F.lit(1)).cast("double")).alias("threshold"))
    )
    recent = (
        o.filter(F.col("o_orderdate") >= F.lit(Q22_RECENT).cast("timestamp"))
         .select("o_custkey")
    )
    return (
        coded.crossJoin(F.broadcast(thr))
             .filter(F.col("c_acctbal") > F.col("threshold"))
             .join(recent, coded["c_custkey"] == recent["o_custkey"],
                   "left_anti")
             .groupBy("cntrycode")
             .agg(F.count(F.lit(1)).cast("bigint").alias("numcust"),
                  _out4_col(F.sum(F.col("c_acctbal").cast("decimal(18,6)")))
                    .alias("totacctbal"))
    )


# --- q_sql_pricing: the SQL-text API surface ------------------------------------

SQLQ_DATE = "1998-08-01"

@register(
    "q_sql_pricing",
    f"""SELECT l_returnflag, l_linestatus,
           {_OUT4.format(s='SUM(CAST(l_quantity AS DECIMAL(18,6)))')}
               AS sum_qty,
           {_OUT4.format(s=f"SUM({_VDEC.format(x=_REV)})")} AS sum_disc_price,
           CAST(COUNT(1) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{SQLQ_DATE} 00:00:00'
    GROUP BY l_returnflag, l_linestatus""",
    doc="the spark.sql() TEXT-API surface: a Q1-shaped aggregate submitted "
        "as a SQL string over a registered temp view — proves a user can "
        "drive this engine with plain SQL (dialect note: Spark spells the "
        "repr detour CAST(x AS STRING), DuckDB CAST(x AS VARCHAR); "
        "everything else is shared ANSI)",
    tags=("relational", "agg", "tpch", "sqlapi"),
)
def q_sql_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every other key drives the DataFrame API; this one goes through
    createOrReplaceTempView + spark.sql so the SQL-text entry point is a
    TESTED surface, not a claim. Catalyst compiles both APIs to the same
    plan — the plan pin asserts this key gets the identical
    one-combine-shuffle shape as q_pricing_summary. The view name is
    prefixed to avoid clobbering a user's own registrations."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "fjs_sql_lineitem")
    return spark.sql(f"""
        SELECT l_returnflag, l_linestatus,
               CAST(CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 4)
                         AS DECIMAL(38,4)) AS DOUBLE) AS sum_qty,
               CAST(CAST(ROUND(SUM(CAST(CAST(CAST(
                        l_extendedprice * (1 - l_discount) AS DOUBLE)
                        AS STRING) AS DECIMAL(38,10))), 4)
                         AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc_price,
               CAST(COUNT(1) AS BIGINT) AS count_order
        FROM fjs_sql_lineitem
        WHERE l_shipdate <= TIMESTAMP '{SQLQ_DATE} 00:00:00'
        GROUP BY l_returnflag, l_linestatus""")


# --- q_sql_lateral: correlated LATERAL subquery (decorrelation surface) ---------

LATERAL_TOPN = 2

@register(
    "q_sql_lateral",
    f"""SELECT n_name, c_custkey, c_acctbal
       FROM nation,
            LATERAL (SELECT c_custkey, c_acctbal
                     FROM customer
                     WHERE c_nationkey = n_nationkey
                     ORDER BY c_acctbal DESC, c_custkey
                     LIMIT {LATERAL_TOPN})
       ORDER BY n_name, c_acctbal DESC, c_custkey""",
    doc=f"correlated LATERAL subquery: for every nation the top-{LATERAL_TOPN} "
        "customers by balance — the per-row-subquery surface; Catalyst "
        "decorrelates the lateral into a ranked join instead of running "
        "one subquery per outer row",
    tags=("relational", "sqlapi", "lateral", "topk"),
)
def q_sql_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL is the SQL spelling of 'a subquery that sees the current
    outer row'. Executed naively that is |outer| separate queries; both
    engines instead decorrelate — Spark rewrites the correlated LIMIT
    into a window-ranked join (the plan pin asserts a single Window +
    joins, no per-row iteration). The ORDER BY inside the lateral carries
    the full-tuple tie-break (acctbal DESC, custkey) so the k-th row is
    engine-independent. At scale this is exactly q_group_topk's shape;
    what this key adds is the LATERAL decorrelation path of the SQL text
    API."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView(
        "fjs_sql_nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "fjs_sql_customer")
    return spark.sql(f"""
        SELECT n_name, c_custkey, c_acctbal
        FROM fjs_sql_nation,
             LATERAL (SELECT c_custkey, c_acctbal
                      FROM fjs_sql_customer
                      WHERE c_nationkey = n_nationkey
                      ORDER BY c_acctbal DESC, c_custkey
                      LIMIT {LATERAL_TOPN})
        ORDER BY n_name, c_acctbal DESC, c_custkey""")


# --- q_min_cost_supplier: TPC-H Q2 ---------------------------------------------

Q2_REGION = "EUROPE"
Q2_SIZE = 15
Q2_TOPK = 100

@register(
    "q_min_cost_supplier",
    f"""WITH eu_sup AS (
          SELECT s_suppkey, s_name, s_acctbal, n_name
          FROM supplier, nation, region
          WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
            AND r_name = '{Q2_REGION}'),
        offers AS (
          SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS cost
          FROM lineitem JOIN eu_sup ON l_suppkey = s_suppkey
          GROUP BY l_partkey, l_suppkey),
        best AS (
          SELECT l_partkey, MIN(cost) AS min_cost
          FROM offers GROUP BY l_partkey)
       SELECT s.s_acctbal, s.s_name, s.n_name, p.p_partkey, p.p_name,
              o.cost AS min_cost
       FROM offers o
       JOIN best b ON o.l_partkey = b.l_partkey AND o.cost = b.min_cost
       JOIN eu_sup s ON o.l_suppkey = s.s_suppkey
       JOIN part p ON o.l_partkey = p.p_partkey
       WHERE p.p_size = {Q2_SIZE}
       ORDER BY s.s_acctbal DESC, s.n_name, s.s_name, p.p_partkey
       FETCH FIRST {Q2_TOPK} ROWS ONLY""",
    doc=f"TPC-H Q2 minimum-cost supplier (adapted: the part-supplier offer "
        "relation is derived from lineitem MIN(l_extendedprice), the repo "
        "having no partsupp): per-part minimum over region-filtered "
        f"suppliers, joined BACK on cost equality (ties kept), size-"
        f"{Q2_SIZE} parts, top-{Q2_TOPK} by account balance",
    tags=("relational", "join", "tpch", "subquery"),
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated-aggregate-then-equality-join-back shape that TPC-H
    uses to stress decorrelation: expressed directly as aggregate + self
    join, which IS what a decorrelating optimizer produces. The region
    dimension chain broadcasts into supplier, the 2-column offers aggregate
    partial-aggregates map-side, and the per-part min is a second combine-
    enabled agg of the ALREADY-reduced offers (never the raw fact). MIN of
    a stored double involves no arithmetic — bit-exact across engines.
    The ORDER BY carries the full output tie-break (s_name unique per
    supplier, p_partkey completes the pair) so LIMIT is deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    eu_sup = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
         .join(F.broadcast(r.filter(F.col("r_name") == Q2_REGION)),
               F.col("n_regionkey") == F.col("r_regionkey"))
         .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        li.join(F.broadcast(eu_sup.select("s_suppkey")),
                li["l_suppkey"] == F.col("s_suppkey"))
          .groupBy("l_partkey", "l_suppkey")
          .agg(F.min("l_extendedprice").alias("cost"))
    )
    best = offers.groupBy("l_partkey").agg(F.min("cost").alias("min_cost"))
    return (
        offers.join(best, (offers["l_partkey"] == best["l_partkey"])
                    & (offers["cost"] == best["min_cost"]))
              .drop(best["l_partkey"])
              .join(F.broadcast(eu_sup), F.col("l_suppkey") == F.col("s_suppkey"))
              .join(F.broadcast(p.filter(F.col("p_size") == Q2_SIZE)),
                    F.col("l_partkey") == F.col("p_partkey"))
              .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
                      F.col("cost").alias("min_cost"))
              .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name",
                       "p_partkey")
              .limit(Q2_TOPK)
    )


# --- q_product_profit: TPC-H Q9 ------------------------------------------------

Q9_WORD = "red"

@register(
    "q_product_profit",
    f"""SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
           {_OUT4.format(s=(f"CAST(SUM({_VDEC.format(x=_REV)}) AS DECIMAL(30,10)) - "
                            "CAST(SUM(CAST(CAST(CAST(p_retailprice / 10 AS DOUBLE)"
                            " AS VARCHAR) AS DECIMAL(19,10))"
                            " * CAST(l_quantity AS DECIMAL(3,0))) AS DECIMAL(30,10))"))}
             AS profit
    FROM lineitem, orders, part, supplier, nation
    WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
      AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      AND p_name LIKE '{Q9_WORD} %'
    GROUP BY n_name, year(o_orderdate)""",
    doc=f"TPC-H Q9 product-type profit (adapted: supply cost surrogate = "
        f"p_retailprice/10 per unit, the repo having no partsupp): profit "
        f"by supplier nation and order year over '{Q9_WORD} *' parts — the "
        "5-table star with an expression measure and a derived grouping "
        "column (year)",
    tags=("relational", "join", "agg", "tpch"),
)
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue and cost are folded as SEPARATE exact-decimal sums and
    subtracted once at the end: per-row mixed-width decimal subtraction is
    where Spark's precision-loss rules and DuckDB's int128 promotion
    disagree, while two independent SUMs stay exact in both. The unit cost
    routes p_retailprice/10 through ONE IEEE division (identical in both
    engines) before the repr-exact decimal cast, and quantity is
    DECIMAL(3,0) so the product's static type (22,10) never triggers
    Spark's scale trimming. Part filter broadcasts; the nation name rides
    the broadcast supplier dim; year() is a derived group key computed
    pre-shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    sup_n = s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]) \
             .select("s_suppkey", "n_name")
    cost = (F.col("p_retailprice") / F.lit(10)).cast("double") \
        .cast("decimal(19,10)") * F.col("l_quantity").cast("decimal(3,0)")
    return (
        li.join(F.broadcast(p.filter(F.col("p_name").like(f"{Q9_WORD} %"))
                             .select("p_partkey", "p_retailprice")),
                li["l_partkey"] == F.col("p_partkey"))
          .join(F.broadcast(sup_n), li["l_suppkey"] == F.col("s_suppkey"))
          .join(o, li["l_orderkey"] == o["o_orderkey"])
          .groupBy("n_name", F.year("o_orderdate").cast("int").alias("o_year"))
          .agg(_out4_col(F.sum(_rev_col()).cast("decimal(30,10)")
                         - F.sum(cost).cast("decimal(30,10)"))
                .alias("profit"))
    )


# --- q_important_lines: TPC-H Q11 ----------------------------------------------

Q11_NATION = "NATION_3"
Q11_MEAN_MULT = 2   # keep parts above MULT x the mean part value

@register(
    "q_important_lines",
    f"""WITH val AS (
          SELECT l_partkey,
                 {_OUT4.format(s=f"SUM({_VDEC.format(x='l_extendedprice')})")}
                   AS value,
                 CAST(ROUND(SUM({_VDEC.format(x='l_extendedprice')}), 4)
                      AS DECIMAL(25,4)) AS vdec
          FROM lineitem, supplier, nation
          WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
            AND n_name = '{Q11_NATION}'
          GROUP BY l_partkey),
        tot AS (SELECT CAST(SUM(vdec) AS DECIMAL(34,4)) AS total,
                       CAST(COUNT(1) AS DECIMAL(8,0)) AS n FROM val)
       SELECT l_partkey, value
       FROM val, tot
       WHERE vdec * n > total * CAST({Q11_MEAN_MULT} AS DECIMAL(2,0))
       ORDER BY value DESC, l_partkey""",
    doc=f"TPC-H Q11 important stock (adapted to the lineitem-derived "
        f"part-supplier relation): per-part value of {Q11_NATION}'s "
        f"suppliers, kept only when above {Q11_MEAN_MULT}x the MEAN part "
        "value — the global-scalar-in-HAVING shape, with a mean-relative "
        "threshold so the predicate bites (and stays non-vacuous) at "
        "every scale factor, unlike TPC-H's fixed fraction which must be "
        "hand-scaled per SF",
    tags=("relational", "agg", "tpch", "subquery"),
)
def q_important_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The threshold is EXACT decimal arithmetic, not floats: per-part
    values keep a DECIMAL(30,4) twin (vdec) beside the _OUT4 double output,
    the total is an exact decimal SUM (fold-order independent — a plain
    double total would be partition-order dependent and could flip
    boundary rows between engines or even between Spark runs), and
    "value > MULT * mean" is restated as "vdec * n > total * MULT" so no
    IEEE op (and no division) touches the comparison; widths are chosen so
    no product exceeds precision 38 (vdec(25,4) x n(8,0) = (34,4)) and
    Spark's precision-loss adjustment never fires. The 1-row total broadcasts back (scalar cross join), so
    the only data-sized work is one combine-enabled aggregation of the
    nation-filtered lines (the nation+supplier dims broadcast into the
    scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    nat_sup = (s.join(F.broadcast(n.filter(F.col("n_name") == Q11_NATION)),
                      s["s_nationkey"] == n["n_nationkey"])
                .select("s_suppkey"))
    sum_dec = F.sum(_vdec_col(F.col("l_extendedprice")))
    val = (
        li.join(F.broadcast(nat_sup), li["l_suppkey"] == F.col("s_suppkey"))
          .groupBy("l_partkey")
          .agg(_out4_col(sum_dec).alias("value"),
               F.round(sum_dec, 4).cast("decimal(25,4)").alias("vdec"))
          .persist()   # reused by the scalar total AND the output — without
          #              this the fact is scanned twice (plan-pinned)
    )
    tot = val.agg(F.sum("vdec").cast("decimal(34,4)").alias("total"),
                  F.count(F.lit(1)).cast("decimal(8,0)").alias("n"))
    return (
        val.crossJoin(F.broadcast(tot))
           .filter(F.col("vdec") * F.col("n")
                   > F.col("total") * F.lit(Q11_MEAN_MULT).cast("decimal(2,0)"))
           .select("l_partkey", "value")
           .orderBy(F.col("value").desc(), "l_partkey")
    )


# --- q_priority_shipmode: TPC-H Q12 --------------------------------------------

Q12_FROM, Q12_TO = "1996-01-01", "1997-01-01"

@register(
    "q_priority_shipmode",
    f"""SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate >= TIMESTAMP '{Q12_FROM} 00:00:00'
      AND l_shipdate <  TIMESTAMP '{Q12_TO} 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag""",
    doc="TPC-H Q12 shipping modes and order priority (adapted: grouped by "
        "l_returnflag, the repo having no l_shipmode): per-group counts of "
        "high- vs low-priority lines in a ship-date year — the "
        "join-derived-attribute conditional-count shape",
    tags=("relational", "join", "agg", "tpch"),
)
def q_priority_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-count measure (no decimals to reconcile); the date filter is
    pushed to the lineitem scan (pinned PushedFilters) and the CASE sums
    partial-aggregate map-side after the fact-fact join, which stays
    unhinted for AQE. The priority attribute arrives THROUGH the join —
    the shape that punishes engines which can't pipeline join output into
    partial aggregation."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey",
                                                   "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter((F.col("l_shipdate") >= F.lit(Q12_FROM).cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit(Q12_TO).cast("timestamp")))
          .join(o, li["l_orderkey"] == o["o_orderkey"])
          .groupBy("l_returnflag")
          .agg(F.sum(F.when(hi, 1).otherwise(0)).cast("bigint")
                .alias("high_line_count"),
               F.sum(F.when(~hi, 1).otherwise(0)).cast("bigint")
                .alias("low_line_count"))
          .orderBy("l_returnflag")
    )


# --- q_supplier_part_counts: TPC-H Q16 -----------------------------------------

Q16_EXCL_BRAND = "Brand#1"
Q16_SIZES = (5, 15, 25, 35)

@register(
    "q_supplier_part_counts",
    f"""SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND p_brand <> '{Q16_EXCL_BRAND}'
      AND p_size IN {Q16_SIZES}
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_suppkey % 7 = 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
    doc=f"TPC-H Q16 parts/supplier relationship (adapted: the relation is "
        "lineitem, the complaint list is the deterministic s_suppkey %% 7 "
        "== 0 surrogate — non-empty at EVERY scale factor so the anti-join "
        "is never vacuously dead): distinct-supplier counts per (brand, "
        "type, size) with an anti-subquery exclusion — COUNT DISTINCT + "
        "NOT IN shape",
    tags=("relational", "join", "agg", "tpch", "subquery"),
)
def q_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN over a non-nullable key decorrelates to a left-anti join
    (broadcast: the exclusion list is tiny); the part predicate broadcasts
    into the scan. COUNT(DISTINCT) expands to the standard two-phase
    distinct-then-count plan — Spark's expand/partial machinery handles
    it without a driver-side distinct."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    bad = s.filter(F.col("s_suppkey") % 7 == 0).select("s_suppkey")
    pf = p.filter((F.col("p_brand") != Q16_EXCL_BRAND)
                  & F.col("p_size").isin(*Q16_SIZES)) \
          .select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        li.join(F.broadcast(bad), li["l_suppkey"] == bad["s_suppkey"],
                "left_anti")
          .join(F.broadcast(pf), F.col("l_partkey") == F.col("p_partkey"))
          .groupBy("p_brand", "p_type", "p_size")
          .agg(F.countDistinct("l_suppkey").cast("bigint")
                .alias("supplier_cnt"))
          .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type",
                   "p_size")
    )


# --- q_excess_stock_suppliers: TPC-H Q20 ---------------------------------------

Q20_WORD = "small"
Q20_NATION = "NATION_3"
Q20_FROM, Q20_TO = "1996-01-01", "1997-01-01"

@register(
    "q_excess_stock_suppliers",
    f"""WITH shipped AS (
          SELECT l_partkey, l_suppkey, SUM(l_quantity) AS sq
          FROM lineitem, part
          WHERE l_partkey = p_partkey AND p_name LIKE '{Q20_WORD} %'
            AND l_shipdate >= TIMESTAMP '{Q20_FROM} 00:00:00'
            AND l_shipdate <  TIMESTAMP '{Q20_TO} 00:00:00'
          GROUP BY l_partkey, l_suppkey),
        part_tot AS (
          SELECT l_partkey, SUM(sq) AS total_q
          FROM shipped GROUP BY l_partkey),
        dominant AS (
          SELECT DISTINCT s.l_suppkey
          FROM shipped s JOIN part_tot t ON s.l_partkey = t.l_partkey
          WHERE s.sq * 4 > t.total_q)
       SELECT s_name, n_name
       FROM dominant, supplier, nation
       WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
         AND n_name = '{Q20_NATION}'
       ORDER BY s_name""",
    doc=f"TPC-H Q20 potential part promotion (adapted: 'excess stock' = a "
        f"supplier shipping >25% of a '{Q20_WORD} *' part's yearly volume, "
        "the repo having no partsupp availqty): the nested IN-subquery "
        "chain — per-(part,supplier) totals against per-part totals, "
        "distinct suppliers, then the nation filter",
    tags=("relational", "join", "agg", "tpch", "subquery"),
)
def q_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two-level aggregate chain reuses its own output (part_tot is an
    agg OF shipped, never a second fact scan) and the dominance test
    multiplies by 4 instead of comparing against 0.25 * total — quantity
    sums are integral doubles, so sq * 4 is exact and the comparison has
    no rounding boundary for engines to disagree on. DISTINCT bounds the
    join-back at |suppliers|; the nation dim broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    shipped = (
        li.filter((F.col("l_shipdate") >= F.lit(Q20_FROM).cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit(Q20_TO).cast("timestamp")))
          .join(F.broadcast(p.filter(F.col("p_name").like(f"{Q20_WORD} %"))
                             .select("p_partkey")),
                li["l_partkey"] == F.col("p_partkey"))
          .groupBy("l_partkey", "l_suppkey")
          .agg(F.sum("l_quantity").alias("sq"))
    )
    part_tot = shipped.groupBy("l_partkey").agg(F.sum("sq").alias("total_q"))
    dominant = (
        shipped.join(part_tot, "l_partkey")
               .filter(F.col("sq") * 4 > F.col("total_q"))
               .select("l_suppkey").distinct()
    )
    nat = n.filter(F.col("n_name") == Q20_NATION)
    return (
        dominant.join(s, F.col("l_suppkey") == s["s_suppkey"])
                .join(F.broadcast(nat),
                      s["s_nationkey"] == F.col("n_nationkey"))
                .select("s_name", "n_name")
                .orderBy("s_name")
    )
