package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** General relational capability over the TPC-H-ish star schema —
  * beyond the reference surface (it has no joins, SURVEY §2.2), these
  * prove the engine's join/aggregate machinery picks the right
  * distributed shapes:
  *
  *  - q29: fact-fact join (orders ⨝ lineitem) — shuffle hash/merge on
  *    the join key, partial aggregation before the group-by shuffle;
  *  - q30: star probe (customer ⨝ nation ⨝ region) — the dimension
  *    tables are explicitly broadcast: zero shuffle of the fact side;
  *  - q31: rollup aggregation with DECIMAL-exact sums (the q13
  *    determinism pattern) and explicit GROUPING flags so subtotal
  *    rows are unambiguous.
  */
object RelationalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Fact-fact equi-join + grouped exact aggregation.
    "q29_join" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      // Revenue in exact decimal end-to-end: rounding a DOUBLE product
      // to decimal diverges between engines near midpoints (Spark
      // rounds the shortest-decimal repr, DuckDB the binary value), so
      // the 2-decimal source columns are cast to decimal BEFORE any
      // arithmetic — every operation is exact and engine-identical.
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_items"),
          sum(expr("cast(l_extendedprice as decimal(18,2)) * (cast(1 as decimal(3,2)) - cast(l_discount as decimal(18,2)))"))
            .cast(DoubleType).as("revenue"))
        .orderBy("o_orderpriority")
    }),

    // Star-schema probe with broadcast dimensions.
    "q30_bcast" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val n = broadcast(Tables.nation(s, d))
      val r = broadcast(Tables.region(s, d))
      c.join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("customers"),
          sum(col("c_acctbal").cast(DecimalType(28, 10))).cast(DoubleType).as("balance"))
        .orderBy("r_name")
    }),

    // Bloom-prefiltered semi-join: build a bloom over the (selective)
    // customer-key build side, probe it as a SCALAR-SUBQUERY filter on
    // the fact scan, then run the exact semi-join to kill false
    // positives. Result ≡ the plain semi-join (the oracle form); the
    // plan is the 100 TB shape — the bloom probe is a map-side Filter
    // directly over the scan, so at bits/n=16, k=7 the semi-join's
    // shuffle carries the ~matching fraction +0.04% FP instead of the
    // whole fact table. This is the same shape Spark's own
    // InjectRuntimeFilter plans (a might_contain(scalar-subquery)
    // filter), built explicitly: a broadcast-1-row-join formulation
    // gets REORDERED (PushDownLeftSemiAntiJoin pushes the exact join
    // below the probe, inverting the intent); Dataset.scalar() pins
    // the probe below the join because a Filter over the scan is
    // already at the bottom.
    "q52_bloom" -> ((s, d) => {
      val keys = Tables.customer(s, d)
        .filter(col("c_nationkey") === 1)
        .select(col("c_custkey").cast(LongType).as("k"))
      val bloom = keys.agg(graft.Functions.bloom_agg(col("k"), 1 << 20).as("bf")).scalar()
      Tables.orders(s, d)
        .filter(graft.Functions.bloom_contains(bloom, col("o_custkey").cast(LongType)))
        .join(keys, col("o_custkey").cast(LongType) === col("k"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    }),

    // Group-wise top-k: the "best N docs per group" selection every
    // curation pipeline runs. row_number over (group, order) + rn<=k
    // is the declarative form; what makes it 100 TB-safe is Spark's
    // WindowGroupLimit push-down — each map task keeps only k rows
    // per group BEFORE the window shuffle, so the exchange carries
    // O(groups·k), not the corpus. PlanAuditSpec pins the
    // WindowGroupLimit operator.
    "q53_grouptopk" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang", "source")
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .withColumn("rn", row_number().over(w).cast(LongType))
        .filter(col("rn") <= 3)
        .orderBy("lang", "source", "rn")
    }),

    // Rollup with explicit grouping flags for deterministic subtotals.
    "q31_rollup" -> ((s, d) => {
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          grouping(col("l_returnflag")).cast(LongType).as("g_rf"),
          grouping(col("l_linestatus")).cast(LongType).as("g_ls"),
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast(DecimalType(28, 10))).cast(DoubleType).as("qty"))
        .select(
          col("l_returnflag"), col("l_linestatus"),
          col("g_rf"), col("g_ls"), col("n"), col("qty"))
        .orderBy(col("g_rf"), col("g_ls"), col("l_returnflag"), col("l_linestatus"))
    }),

    // CUBE — the full grouping-sets surface (rollup covers only the
    // prefix sets; cube adds the (∅, l_linestatus) slice and the
    // grand total in ONE pass). Spark expands the sets BEFORE the
    // shuffle and still partial-aggregates, so the exchange carries
    // (sets × groups) aggregate rows, not input rows — at 100 TB a
    // 2-column cube shuffles 4× the group count, never 4× the data.
    // Ship-year cube over derived time: date_trunc on l_shipdate —
    // the date-function slice of SURVEY §2.2's scalar categories.
    "q61_cube" -> ((s, d) => {
      Tables.lineitem(s, d)
        .withColumn("ship_year", year(col("l_shipdate")).cast(LongType))
        .cube("l_returnflag", "ship_year")
        .agg(
          grouping(col("l_returnflag")).cast(LongType).as("g_rf"),
          grouping(col("ship_year")).cast(LongType).as("g_y"),
          count(lit(1)).as("n"),
          // integer cents: decimal→double casts of 1e9-scale sums
          // round differently across engines; cents are exact
          sum(expr("cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)"))
            .as("price_cents"))
        .select(col("l_returnflag"), col("ship_year"),
          col("g_rf"), col("g_y"), col("n"), col("price_cents"))
        .orderBy(col("g_rf"), col("g_y"), col("l_returnflag"), col("ship_year"))
    }),

    // GROUPING SETS — the mixed-dimension aggregation neither ROLLUP
    // (q31, prefix-nested) nor CUBE (q61, all subsets) can express:
    // detail by (returnflag, linestatus) AND an independent breakdown
    // by shipmode AND the grand total, in ONE pass. Catalyst plans a
    // single Expand (3 output rows per input) + one partial-agg'd
    // exchange — the same plan discipline as rollup/cube; per-column
    // grouping() flags (not grouping_id) keep the NULL-vs-grouped
    // distinction engine-portable. Expand's 3× row multiplier happens
    // BEFORE partial aggregation, so the shuffle stays groups-sized.
    "q122_gsets" -> ((s, d) => {
      Tables.lineitem(s, d)
        .withColumn("ship_year", year(col("l_shipdate")).cast(LongType))
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("ship_year")), Seq()),
          col("l_returnflag"), col("l_linestatus"), col("ship_year"))
        .agg(
          grouping(col("l_returnflag")).cast(LongType).as("g_rf"),
          grouping(col("l_linestatus")).cast(LongType).as("g_ls"),
          grouping(col("ship_year")).cast(LongType).as("g_y"),
          count(lit(1)).as("n"),
          sum(expr("cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)"))
            .as("price_cents"))
        .select(col("l_returnflag"), col("l_linestatus"), col("ship_year"),
          col("g_rf"), col("g_ls"), col("g_y"), col("n"), col("price_cents"))
        .orderBy(col("g_rf"), col("g_ls"), col("g_y"),
          col("l_returnflag"), col("l_linestatus"), col("ship_year"))
    }),

    // PIVOT — long-to-wide reshaping with an EXPLICIT value list
    // (pinning the values skips the distinct-value discovery JOB an
    // unpinned pivot runs first). Catalyst plans two stacked
    // aggregations — (source, lang) counts, then pivotfirst by
    // source — BOTH map-side combined, so the two exchanges carry
    // only aggregate rows (groups × langs, then groups × 1): at
    // 100 TB the shuffles are group-bound, never data-bound. Absent
    // combinations coalesce to 0 (pivot yields NULL, the oracle's
    // conditional count yields 0).
    "q65_pivot" -> ((s, d) => {
      val p = Tables.documents(s, d)
        .groupBy("source")
        .pivot("lang", Seq("en", "fr", "de", "es", "zh"))
        .agg(count(lit(1)))
      p.select(col("source") +:
          Seq("en", "fr", "de", "es", "zh").map(l =>
            coalesce(col(l), lit(0L)).as(s"n_$l")): _*)
        .orderBy("source")
    }),

    // UNPIVOT — the inverse reshape (wide-to-long, melt): q65's wide
    // per-source language counts back to (source, lang, n) rows.
    // Unpivot is a pure per-row projection (each input row expands to
    // one row per value column, map-side, no shuffle beyond the
    // upstream aggregation) — the oracle is the equivalent UNION ALL
    // of per-column selects.
    "q67_unpivot" -> ((s, d) => {
      val langs = Seq("en", "fr", "de", "es", "zh")
      val wide = Tables.documents(s, d)
        .groupBy("source")
        .pivot("lang", langs)
        .agg(count(lit(1)))
        .select(col("source") +:
          langs.map(l => coalesce(col(l), lit(0L)).as(s"n_$l")): _*)
      wide.unpivot(
          Array(col("source")),
          langs.map(l => col(s"n_$l")).toArray,
          "lang", "n")
        .withColumn("lang", expr("substring(lang, 3)"))
        .orderBy("source", "lang")
    }),

    // ROWS-frame window — the 7-day moving sum over daily order
    // totals. The frame runs over the PRE-AGGREGATED daily table
    // (one row per day — thousands of rows at any corpus size), so
    // the unpartitioned ordered window is bounded by the calendar,
    // never the data; the heavy lifting is the partial-aggregated
    // groupBy underneath. Integer cents for exactness (see q61).
    "q66_moving" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("o_day"))
        .agg(sum(expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)"))
          .as("cents"))
      val w = Window.orderBy("o_day").rowsBetween(-6, 0)
      daily.withColumn("mov7", sum(col("cents")).over(w))
        .orderBy("o_day").limit(400)
    }),

    // TPC-H Q3 shape (shipping priority): selective dimension filter
    // broadcast into a fact-fact join, decimal-exact revenue, 10-row
    // TakeOrdered. The segment filter prunes customer FIRST (a ~20%
    // dim slice broadcast to the orders scan), the orders date filter
    // is pushed to parquet, and only surviving orders shuffle into
    // the lineitem join — the selective-star plan Q3 exists to test.
    "q159_shipprio" -> ((s, d) => {
      val cut = "1998-01-01"
      val c = broadcast(Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey"))
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit(cut).cast("timestamp"))
        .join(c, col("o_custkey") === col("c_custkey"))
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit(cut).cast("timestamp"))
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("o_day"),
          col("o_orderpriority"))
        .agg(sum(expr("cast(l_extendedprice as decimal(18,2)) * (cast(1 as decimal(3,2)) - cast(l_discount as decimal(18,2)))"))
          .cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
    }),

    // TPC-H Q5 shape (local-supplier volume): the 6-table star-plus-
    // cycle join — region→nation prune the customer AND supplier dims
    // (all broadcast), the c_nationkey = s_nationkey cycle condition
    // rides the fact join, revenue stays decimal-exact, output is
    // nations-sized. The fact side shuffles once on orderkey; every
    // dimension reaches it as a broadcast.
    "q160_regional" -> ((s, d) => {
      val nr = broadcast(Tables.nation(s, d)
        .join(Tables.region(s, d).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name"))
      val c = broadcast(Tables.customer(s, d)
        .join(nr, col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey")))
      val sup = broadcast(Tables.supplier(s, d).select("s_suppkey", "s_nationkey"))
      Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey")
          && col("s_nationkey") === col("c_nationkey"))
        .join(nr, col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sum(expr("cast(l_extendedprice as decimal(18,2)) * (cast(1 as decimal(3,2)) - cast(l_discount as decimal(18,2)))"))
          .cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // Fulfillment aging — days from order to LAST shipment per order,
    // exact median per priority (the q144 dual-rank med2 discipline —
    // order-lifecycle SLA reporting without a float percentile). The
    // per-order rollup is the only fact-sized work; ranks come from
    // DistributedRank (range-partition + offset), not a per-priority
    // window — 5 priorities would collapse the orders-sized frame
    // onto 5 tasks (the q171 sf1 finding). Group sizes broadcast.
    "q177_aging" -> ((s, d) => {
      // pre-aggregate lineitem to (orderkey, last_ship) BEFORE the
      // join: the max() rolls up map-side, the join then matches
      // orders-sized against orders-sized and needs no post-join
      // rollup at all — strictly less shuffle than join-then-groupBy
      // (6M joined rows → 1.5M pre-agg'd at sf1)
      val lastShip = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(max(col("l_shipdate")).as("last_ship"))
      val aged = graft.ops.Barrier(Tables.orders(s, d)
        .join(lastShip, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderpriority"), col("o_orderkey"),
          expr("datediff(last_ship, o_orderdate)").cast(LongType).as("age_days")))
      val sizes = aged.groupBy("o_orderpriority").agg(count(lit(1)).as("m"))
      graft.ops.DistributedRank.rowNumber(aged, "r",
          Seq("o_orderpriority"), Seq(col("age_days"), col("o_orderkey")))
        .join(broadcast(sizes), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          sum(when(col("r") * 2 === col("m") + 1, col("age_days") * 2)
            .when(col("r") * 2 === col("m"), col("age_days"))
            .when(col("r") * 2 === col("m") + 2, col("age_days"))
            .otherwise(lit(0L))).as("med2_days"),
          max(col("age_days")).as("max_days"))
        .orderBy("o_orderpriority")
    }),

    // RFM segmentation — the classic customer scoring (recency of
    // last order, frequency, monetary value) quartiled per dimension
    // into a 3-digit segment code. Everything deterministic: quartile
    // = ntile(4) over a total order with c_custkey tiebreaks, money
    // exact in cents. One customer-sized rollup feeds three ranks —
    // each from DistributedRank, NOT a global ntile window (an
    // unpartitioned window is a single task holding every customer;
    // the q171 sf1 finding at its worst). ntile(4) is replayed
    // exactly from (rank, m): the first m%4 buckets hold m÷4+1 rows.
    "q178_rfm" -> ((s, d) => {
      val per = graft.ops.Barrier(Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("last_order"),
          count(lit(1)).as("freq"),
          sum(expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)"))
            .as("cents")))
      val mTab = per.agg(count(lit(1)).as("m"))
      // ONE rank pass for all three dimensions: tag each (negated —
      // recent/frequent/big = rank 1) sort key with its dimension,
      // rank the 3m-row union grouped by dim, pivot back per customer
      val tagged = per.select(lit("r").as("dim"),
          (-unix_micros(col("last_order").cast(TimestampType))).as("k"),
          col("o_custkey"))
        .unionByName(per.select(lit("f").as("dim"),
          (-col("freq")).as("k"), col("o_custkey")))
        .unionByName(per.select(lit("m").as("dim"),
          (-col("cents")).as("k"), col("o_custkey")))
      val ranks = graft.ops.DistributedRank.rowNumber(tagged, "r",
          Seq("dim"), Seq(col("k"), col("o_custkey")))
        .groupBy("o_custkey")
        .agg(max(when(col("dim") === "r", col("r"))).as("r_r"),
          max(when(col("dim") === "f", col("r"))).as("r_f"),
          max(when(col("dim") === "m", col("r"))).as("r_m"))
      def nt(r: String): org.apache.spark.sql.Column =
        expr(s"""CASE WHEN $r <= (m % 4) * ((m div 4) + 1)
                 THEN ($r - 1) div ((m div 4) + 1) + 1
                 ELSE (m % 4) + ($r - 1 - (m % 4) * ((m div 4) + 1)) div (m div 4) + 1 END""")
      ranks.join(per.select(col("o_custkey"), col("cents")), "o_custkey")
        .crossJoin(broadcast(mTab))
        .groupBy(concat(nt("r_r").cast(StringType), nt("r_f").cast(StringType),
          nt("r_m").cast(StringType)).as("segment"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("cents")).as("cents"))
        .orderBy("segment")
    }),

    // Order backlog curve — open orders over time as a delta stream:
    // +1 at placement, −1 at the LAST shipment, day-keyed net change,
    // running sum over the calendar-bounded day axis. The event-
    // sourcing pattern every inventory/WIP dashboard runs: the only
    // corpus-sized work is the per-order completion rollup; the
    // running sum's unpartitioned window rides the days-sized table
    // (q66's documented bound). The completion rollup aggregates
    // lineitem BEFORE meeting orders (guide §2.3, aggregate before
    // you shuffle): max(l_shipdate) per l_orderkey partial-aggs
    // map-side (~4 lines/order collapse pre-exchange), and the
    // orders probe is a LEFT SEMI on the already-aggregated rows —
    // algebraically identical to the oracle's join-then-group
    // because o_orderkey is unique (join multiplicity 1), while the
    // old shape shuffled every lineitem row into the join first.
    "q181_backlog" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val placed = Tables.orders(s, d)
        .select(to_date(col("o_orderdate")).as("day"), lit(1L).as("delta"))
      val completed = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(max(to_date(col("l_shipdate"))).as("day"))
        .join(Tables.orders(s, d).select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        .select(col("day"), lit(-1L).as("delta"))
      val w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
      placed.unionAll(completed)
        .groupBy("day").agg(sum(col("delta")).as("net"))
        .withColumn("backlog", sum(col("net")).over(w))
        .orderBy("day").limit(500)
    }),

    // Bilateral trade flow (the TPC-H Q7 shape) — shipped revenue
    // between two nations by direction and year. The join tree is the
    // canonical star-over-fact-fact: nation is a broadcast scalar;
    // supplier×nation broadcasts onto the lineitem scan (filtering it
    // to the two nations' suppliers BEFORE the fact-fact shuffle);
    // customer is dimension-sized but unbounded at 100 TB, so it
    // reaches orders through a proper key shuffle, and the shrunken
    // lineitem side then meets orders on orderkey. Both selective
    // filters (shipdate range, nation pair) sit on the scan side of
    // every exchange; revenue stays exact decimal until the final
    // cast.
    "q187_nation_flow" -> ((s, d) => {
      val pair = Seq("NATION_12", "NATION_20")
      val nat = broadcast(Tables.nation(s, d)
        .filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey"), col("n_name")))
      val sup = broadcast(Tables.supplier(s, d)
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation")))
      val cust = Tables.customer(s, d)
        .join(nat, col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val ord = Tables.orders(s, d)
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("cust_nation"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast(LongType).as("yr"))
        .agg(sum(expr("cast(l_extendedprice as decimal(18,2)) * (cast(1 as decimal(3,2)) - cast(l_discount as decimal(18,2)))"))
          .cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("supp_nation", "cust_nation", "yr")
    }),

    // Disjunctive-predicate revenue (the TPC-H Q19 shape) — revenue
    // from three OR'd (brand, size-band, quantity-band) arms. The
    // optimizer exercise Q19 exists for: the disjunction straddles
    // BOTH tables, so the planner must (a) extract the common
    // join-independent parts for pushdown — each side's scan sees the
    // union of its arm predicates (brand IN (...), size ≤ 15,
    // quantity ≤ 30) instead of scanning everything — and (b) keep
    // the cross-table OR as a post-join filter. One equi-join
    // (broadcast at these SFs, AQE's call at 100 TB), exact
    // 1e-4-unit revenue integers, one-row rollup.
    "q239_disjunctive" -> ((s, d) => {
      val arm = (b: String, smax: Int, qlo: Int, qhi: Int) =>
        col("p_brand") === b && col("p_size").between(1, smax) &&
          col("q_c").between(qlo * 100L, qhi * 100L)
      Tables.lineitem(s, d)
        .select(col("l_partkey"),
          expr("cast(cast(l_quantity as decimal(18,2)) * 100 as bigint)").as("q_c"),
          expr("""cast(cast(l_extendedprice as decimal(18,2))
                       * (cast(1 as decimal(3,2)) - cast(l_discount as decimal(18,2)))
                       * 10000 as decimal(38,0))""").as("rev_e4"))
        .join(Tables.part(s, d).select(col("p_partkey"), col("p_brand"),
          col("p_size")), col("l_partkey") === col("p_partkey"))
        .filter(arm("Brand#12", 5, 1, 11) || arm("Brand#23", 10, 10, 20)
          || arm("Brand#34", 15, 20, 30))
        .agg(count(lit(1)).as("n_items"),
          sum(col("rev_e4")).cast(LongType).as("revenue_e4"))
    }),

    // Promo revenue share by month (the TPC-H Q14 shape) — what
    // fraction of each month's discounted revenue came from PROMO
    // parts: conditional aggregation over the lineitem⨝part dim
    // join. part is the first use of the part table in the suite; at
    // these SFs it broadcasts, at 100 TB (part scales with SF) AQE
    // picks the shuffle join — the query declares neither, which IS
    // the portable choice. Revenue rides as exact 1e-4-unit integers
    // (price and discount each carry 2 decimals, so rev·10⁴ is
    // integral — no cent rounding anywhere), and the share divides
    // through HUGEINT/Decimal(38,0) cross-multiplication.
    "q190_promo_share" -> ((s, d) => {
      val dec = DecimalType(38, 0)
      Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .select(
          year(col("l_shipdate")).cast(LongType).as("yr"),
          month(col("l_shipdate")).cast(LongType).as("mo"),
          expr("""cast(cast(l_extendedprice as decimal(18,2))
                       * (cast(1 as decimal(3,2)) - cast(l_discount as decimal(18,2)))
                       * 10000 as decimal(38,0))""").as("rev_e4"),
          (col("p_type") === "PROMO").as("promo"))
        .groupBy("yr", "mo")
        .agg(
          sum(when(col("promo"), col("rev_e4")).otherwise(lit(0).cast(dec)))
            .cast(LongType).as("promo_e4"),
          sum(col("rev_e4")).cast(LongType).as("total_e4"),
          count(lit(1)).as("n_items"))
        .withColumn("promo_ppm",
          expr("""cast((cast(promo_e4 as decimal(38,0)) * 1000000)
                       div cast(total_e4 as decimal(38,0)) as bigint)"""))
        .select("yr", "mo", "promo_e4", "total_e4", "promo_ppm", "n_items")
        .orderBy("yr", "mo")
    }),

    // Small-quantity revenue (the TPC-H Q17 shape) — revenue locked
    // in below-average orders: for two brands, the lineitems whose
    // quantity is under 20% of their part's all-time average. The
    // correlated scalar subquery ("avg for THIS part") decorrelates
    // into a per-part pre-aggregate joined back — the canonical
    // rewrite; the brand filter broadcasts onto lineitem FIRST, so
    // both the pre-aggregate and the back-join run brand-bounded
    // (a part's average only needs that part's rows, and the brand
    // predicate is part-level — filtering early changes nothing).
    // The threshold is the cross-multiplied integer test
    // 5·qty·n < Σqty (quantities carry 2 decimals → ·100 integers),
    // so no float division decides membership.
    "q191_small_qty" -> ((s, d) => {
      val branded = broadcast(Tables.part(s, d)
        .filter(col("p_brand").isin("Brand#2", "Brand#4"))
        .select(col("p_partkey"), col("p_brand")))
      val l2 = Tables.lineitem(s, d)
        .join(branded, col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"), col("l_partkey"),
          expr("cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)")
            .as("price_c"),
          expr("cast(cast(l_quantity as decimal(18,2)) * 100 as bigint)").as("q_c"))
      val pq = l2.groupBy(col("l_partkey").as("pk"))
        .agg(count(lit(1)).as("n"), sum(col("q_c")).as("qty_c"))
      val small = expr(
        "5 * cast(q_c as decimal(38,0)) * n < cast(qty_c as decimal(38,0))")
      l2.join(pq, col("l_partkey") === col("pk"))
        .groupBy("p_brand")
        .agg(count(when(small, 1)).as("n_small"),
          sum(when(small, col("price_c")).otherwise(0L)).cast(LongType)
            .as("small_cents"),
          count(lit(1)).as("n_items"))
        .orderBy("p_brand")
    }),

    // Repeat-purchase latency — the inter-order gap distribution per
    // market segment: per-customer consecutive-order day gaps (a
    // customer-partitioned lag, per-customer history is bounded so
    // the window never concentrates), segment attached through the
    // customer shuffle join, then the q177 med2 discipline — exact
    // median from DistributedRank (range-partition + offset; 5
    // segments would collapse a per-segment window onto 5 tasks).
    // med2 = 2·median so odd/even counts stay integral.
    "q192_order_gap" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val gaps = graft.ops.Barrier(Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        .withColumn("prev", lag(col("o_orderdate"), 1).over(w))
        .filter(col("prev").isNotNull)
        .join(Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), col("o_orderkey"),
          expr("datediff(o_orderdate, prev)").cast(LongType).as("gap_days")))
      val sizes = gaps.groupBy("c_mktsegment").agg(count(lit(1)).as("m"))
      graft.ops.DistributedRank.rowNumber(gaps, "r",
          Seq("c_mktsegment"), Seq(col("gap_days"), col("o_orderkey")))
        .join(broadcast(sizes), "c_mktsegment")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_gaps"),
          sum(when(col("r") * 2 === col("m") + 1, col("gap_days") * 2)
            .when(col("r") * 2 === col("m"), col("gap_days"))
            .when(col("r") * 2 === col("m") + 2, col("gap_days"))
            .otherwise(lit(0L))).as("med2_days"),
          max(col("gap_days")).as("max_days"))
        .orderBy("c_mktsegment")
    }),

    // Cohort LTV triangle — cumulative revenue by (first-order
    // cohort month × months-since-first): the revenue companion to
    // q91's retention counts and q178's RFM snapshot. Cohorts are
    // pure integer month indexes (yr·12+mo, no calendar functions in
    // the rollup key); money is exact cents off o_totalprice. The
    // first-order frame is a customer-sized partial-agg'd min joined
    // back on custkey (both sides customer/orders-sized); the running
    // sum windows per cohort over the ~80-month age axis — bounded
    // partitions, never a global sort.
    "q193_cohort_ltv" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val first = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("fk"))
        .agg(min(col("o_orderdate")).as("first_dt"))
      val w = Window.partitionBy("cohort_m").orderBy("age_m")
        .rowsBetween(Window.unboundedPreceding, 0)
      Tables.orders(s, d)
        .join(first, col("o_custkey") === col("fk"))
        .select(
          (year(col("first_dt")) * 12 + month(col("first_dt"))).cast(LongType)
            .as("cohort_m"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).cast(LongType)
            .as("ord_m"),
          expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)")
            .as("cents"))
        .groupBy(col("cohort_m"), (col("ord_m") - col("cohort_m")).as("age_m"))
        .agg(sum(col("cents")).cast(LongType).as("rev_cents"),
          count(lit(1)).as("n_orders"))
        .withColumn("cum_cents", sum(col("rev_cents")).over(w).cast(LongType))
        .orderBy("cohort_m", "age_m")
    }),

    // Ratio-to-report — each nation's share of its REGION's revenue
    // (the windowed percent-of-total every BI layer ships, exact):
    // the corpus-sized work is one orders⨝customer shuffle into a
    // 25-row (region, nation) rollup; the share then divides through
    // a region-partitioned window over that tiny frame — Decimal
    // cross-multiplied ppm, never a float ratio. nation×region ride
    // as one broadcast.
    "q198_rev_share" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val dec = DecimalType(38, 0)
      val nr = broadcast(Tables.nation(s, d)
        .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"), col("r_name")))
      val w = Window.partitionBy("r_name")
      Tables.orders(s, d)
        .join(Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(nr, col("c_nationkey") === col("n_nationkey"))
        .groupBy("r_name", "n_name")
        .agg(sum(expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)"))
          .cast(LongType).as("cents"))
        .withColumn("tot", sum(col("cents").cast(dec)).over(w))
        .select(col("r_name"), col("n_name"), col("cents"),
          expr("cast((cast(cents as decimal(38,0)) * 1000000) div tot as bigint)")
            .as("share_ppm"))
        .orderBy("r_name", "n_name")
    }),

    // Customer order-count distribution (TPC-H Q13 shape) — the one
    // join flavor the surface hadn't pinned: LEFT OUTER, so customers
    // with zero urgent orders survive into the 0 bucket (count of the
    // non-null join key, not count(*)). The priority predicate reaches
    // the order scan before the join; both aggregations — the
    // customer-keyed count and the dozen-row histogram — keep partial
    // aggregation, so at 100 TB the only data-sized exchange is the
    // one custkey shuffle each side pays for the join.
    "q201_custdist" -> ((s, d) => {
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"), col("o_orderkey"))
      Tables.customer(s, d).select(col("c_custkey"))
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .groupBy("n_orders")
        .agg(count(lit(1)).as("n_custs"))
        .orderBy(col("n_custs").desc, col("n_orders").desc)
    }),

    // Dormant high-balance customers (TPC-H Q22 shape): the global
    // positive-balance mean rides as a broadcast 1-row (Σcents, n)
    // scalar and the "above average" test cross-multiplies in exact
    // integers (cents·n > Σ) — no float mean to diverge between
    // engines. "Never placed an urgent order" is a LEFT ANTI join
    // against the filtered, key-only order projection (the anti side
    // shuffles only custkeys); the nation rollup rides a broadcast
    // dim. At 100 TB: one custkey shuffle for the anti join, a 25-row
    // result — the mean never serializes more than 1 row.
    "q202_idle_rich" -> ((s, d) => {
      val cust = Tables.customer(s, d)
        .withColumn("bal_c",
          expr("cast(cast(c_acctbal as decimal(18,2)) * 100 as bigint)"))
      val stats = cust.filter(col("bal_c") > 0)
        .agg(sum(col("bal_c").cast(DecimalType(38, 0))).as("sum_c"),
          count(lit(1)).as("n_pos"))
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      val nat = broadcast(Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name")))
      cust.crossJoin(broadcast(stats))
        .filter(expr("cast(bal_c as decimal(38,0)) * n_pos > sum_c"))
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .join(nat, col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_cust"),
          sum(col("bal_c")).cast(LongType).as("bal_cents"))
        .orderBy("n_name")
    }),

    // Large-volume orders (TPC-H Q18 shape): group-HAVING on the fact
    // pre-aggregate — the per-order quantity rollup partial-aggs and
    // the HAVING filter runs on the aggregated frame, so the join back
    // to orders/customer is driven by the vanishing surviving fraction
    // (AQE broadcasts it at runtime). Quantities are exact integer
    // cents; top-100 rides TakeOrderedAndProject (never a full sort),
    // ties broken by orderkey for a deterministic result set.
    "q203_bigorders" -> ((s, d) => {
      val bigq = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey").as("bk"))
        .agg(sum(expr("cast(cast(l_quantity as decimal(18,2)) * 100 as bigint)"))
          .cast(LongType).as("qty_c"))
        .filter(col("qty_c") > 30000)
      Tables.orders(s, d)
        .join(bigq, col("o_orderkey") === col("bk"))
        .join(Tables.customer(s, d).select(col("c_custkey"), col("c_name")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_orderkey"), col("o_orderdate"), col("qty_c"))
        .orderBy(col("qty_c").desc, col("o_orderkey").asc)
        .limit(100)
    }),

    // Returned-item revenue (TPC-H Q10 shape): which customers drove
    // the most returned revenue in a year. Both scan filters (return
    // flag, order-date year) are pushed to the parquet scans BEFORE
    // the fact-fact join; revenue is exact 1e-4-dollar integer units
    // (price_cents × (100 − disc_cents) — the q190 no-rounding
    // discipline); the per-customer rollup partial-aggs before the
    // custkey shuffle, and the customer/nation attribution joins run
    // on the aggregated (customer-sized) frame, never on lineitems.
    // Top-20 rides TakeOrderedAndProject.
    "q209_returns" -> ((s, d) => {
      val ret = Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          expr("""cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)
                  * (100 - cast(cast(l_discount as decimal(18,2)) * 100 as bigint))""")
            .as("rev_u"))
      val ord = Tables.orders(s, d)
        .filter(expr(
          "o_orderdate >= date'1995-01-01' and o_orderdate < date'1996-01-01'"))
        .select(col("o_orderkey"), col("o_custkey"))
      val nat = broadcast(Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name")))
      ord.join(ret, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_custkey")
        .agg(sum(col("rev_u")).cast(LongType).as("rev_u"))
        .join(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_name"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(nat, col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"), col("rev_u"))
        .orderBy(col("rev_u").desc, col("c_custkey").asc)
        .limit(20)
    }),

    // Shipping-latency priority mix (TPC-H Q12 shape, adapted to this
    // schema's columns): conditional priority-class counts over the
    // fact-fact join, bucketed by order-to-ship latency (≤30 / ≤90 /
    // late). The Q12 essence — "are urgent orders actually shipping
    // faster?" — as one orderkey shuffle join into a 3-row rollup;
    // all three counts are conditional aggregates of the same pass,
    // partial-agg'd before the bucket shuffle.
    "q210_late_ship" -> ((s, d) => {
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
        .join(Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .select(expr(
          """case when datediff(l_shipdate, o_orderdate) <= 30 then 'fast'
                  when datediff(l_shipdate, o_orderdate) <= 90 then 'normal'
                  else 'late' end""").as("bucket"),
          col("o_orderpriority"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_items"),
          count(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
            .as("n_high"),
          count(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
            .as("n_low"))
        .orderBy("bucket")
    }),

    // Sole-late-supplier ranking (TPC-H Q21 on our schema: no
    // commit/receipt dates, so "late" = shipped > 60 days after the
    // order date): a late line's supplier qualifies iff the order
    // involves ANOTHER supplier (EXISTS) and NO other supplier is
    // late on it (NOT EXISTS). Landed as the AGGREGATE decorrelation
    // of the stacked correlated subqueries: per-(order, supplier)
    // late-line counts — the ONLY line-grain shuffle — then the
    // orders-grain census (suppliers on the order, late suppliers
    // among them) as a window PARTITIONED BY order over the supplier-
    // order frame (state = suppliers-per-order ≤ 7, millions of
    // partitions → full parallelism; no self-join, no second pass, no
    // checkpoint); qualify iff n_supp ≥ 2 (another supplier exists)
    // and n_late_supp = 1 (the 1 being the supplier itself, so no
    // OTHER late one exists). Replaces the round-13 Barrier +
    // LeftSemi/LeftAnti self-join pair, which shuffled line-grain
    // rows three times and measured 13.6×/decade at sf10 where its
    // 60M-row checkpoint also OOM-flirted with the 8g bench heap.
    // The semi/anti JOIN patterns stay covered by q37_semijoin.
    // Top-10 via TakeOrderedAndProject; numwait = late line items,
    // exactly the rows the semi/anti form counted.
    "q253_sole_late" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("ok")
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
          (expr("datediff(l_shipdate, o_orderdate)") > 60).as("late"))
        .groupBy("ok", "sk")
        .agg(count(when(col("late"), 1)).as("nll"))
        .withColumn("n_supp", count(lit(1)).over(w))
        .withColumn("n_late_supp",
          sum(when(col("nll") > 0, 1L).otherwise(0L)).over(w))
        .filter(col("nll") > 0 && col("n_supp") >= 2
          && col("n_late_supp") === 1)
        .groupBy(col("sk").as("s_suppkey"))
        .agg(sum(col("nll")).cast(LongType).as("numwait"))
        .orderBy(desc("numwait"), col("s_suppkey"))
        .limit(10)
    }),

    // Benford leading-digit forensics — the data-quality screen for
    // fabricated or unit-mangled numeric columns (real multiplicative
    // totals follow log10(1+1/d); synthetic/fat-fingered feeds don't):
    // exact integer cents (round ×100 — both engines round doubles
    // half-away-from-zero, and long→string leading digits can't
    // diverge the way double formatting can), a 9-row partial-agg'd
    // digit census, observed ppm via a census-window total, expected
    // ppm a hardcoded floor(log10(1+1/d)·10⁶) table. The per-digit
    // deviation is the audit a pipeline alerts on before training on
    // a new numeric feed.
    "q254_benford" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val expPpm = typedLit(Seq(301029L, 176091L, 124938L, 96910L,
        79181L, 66946L, 57991L, 51152L, 45757L))
      Tables.orders(s, d)
        .select(substring(expr(
          "cast(round(o_totalprice * 100) as bigint)").cast(StringType), 1, 1)
          .as("digit"))
        .groupBy("digit")
        .agg(count(lit(1)).as("n_orders"))
        .withColumn("total", sum(col("n_orders"))
          .over(Window.partitionBy(lit(1))))
        .select(col("digit"), col("n_orders"),
          expr("cast((n_orders * 1000000) div total as bigint)").as("obs_ppm"),
          element_at(expPpm, col("digit").cast(IntegerType)).as("exp_ppm"))
        .orderBy("digit")
    }),

    // Pricing summary with the FULL charge arithmetic (TPC-H Q1
    // faithful — q13_agg is the Q1 shape on events; this is the real
    // thing on lineitem, including the tax term): disc_price =
    // price·(1−d) in exact 1e-4-dollar units, charge =
    // price·(1−d)·(1+t) in exact 1e-6 units — every factor an
    // integer, the per-row product fits a Long, and the SUMS ride
    // Decimal(38,0) (at 100 TB a Long sum of 1e10-sized units
    // overflows; Decimal keeps the rollup exact). Ship-date cutoff
    // reaches the scan; one partial-agg'd 4-row rollup.
    "q211_pricing" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= expr("date'2001-09-01'"))
        .select(col("l_returnflag"), col("l_linestatus"),
          expr("cast(cast(l_quantity as decimal(18,2)) * 100 as bigint)").as("qty_c"),
          expr("cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)").as("price_c"),
          expr("cast(cast(l_discount as decimal(18,2)) * 100 as bigint)").as("disc_c"),
          expr("cast(cast(l_tax as decimal(18,2)) * 100 as bigint)").as("tax_c"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("qty_c")).cast(LongType).as("sum_qty_c"),
          sum(col("price_c")).cast(LongType).as("sum_base_c"),
          sum((col("price_c") * (lit(100L) - col("disc_c")))
            .cast(DecimalType(38, 0))).cast(LongType).as("sum_disc_u4"),
          sum((col("price_c") * (lit(100L) - col("disc_c"))
            * (lit(100L) + col("tax_c")))
            .cast(DecimalType(38, 0))).cast(LongType).as("sum_charge_u6"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Order-status integrity audit — the referential data-quality
    // gate a warehouse runs after ingest: an order's status must
    // agree with its lineitems (F iff all lines F, O iff none, P
    // otherwise — the TPC-H derivation rule) and line numbers must
    // be dense 1..n (max = count). One partial-agg'd per-order
    // rollup on the fact side, LEFT join so itemless orders surface
    // as violations instead of vanishing, 3-row status report.
    "q212_order_integrity" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_items"),
          count(when(col("l_linestatus") === "F", 1)).as("n_f"),
          max(col("l_linenumber")).cast(LongType).as("max_ln"))
      Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus"))
        .join(li, col("o_orderkey") === col("l_orderkey"), "left")
        .select(col("o_orderstatus"),
          when(col("n_items").isNull, "NONE")
            .when(col("n_f") === col("n_items"), "F")
            .when(col("n_f") === 0, "O").otherwise("P").as("derived"),
          when(col("n_items").isNull || col("max_ln") =!= col("n_items"), 1L)
            .otherwise(0L).as("ln_bad"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          count(when(col("derived") =!= col("o_orderstatus"), 1))
            .as("n_status_mismatch"),
          sum(col("ln_bad")).cast(LongType).as("n_linenum_bad"))
        .orderBy("o_orderstatus")
    }),

    // Realized-vs-list price by part-size band — merchandising's
    // "where do discounts actually land": parts banded by size
    // decade, realized revenue (what lineitems billed) against the
    // list value of the same quantities (qty × retail price), ratio
    // in exact ppm. The part attributes ride ONE broadcast; both
    // money columns are integer 1e-4-dollar units summed in
    // Decimal(38,0); the per-band part census joins as a second
    // broadcast-sized frame (bands × counts).
    "q213_size_value" -> ((s, d) => {
      val dec = DecimalType(38, 0)
      val pp = broadcast(Tables.part(s, d)
        .select(col("p_partkey"),
          expr("cast((p_size - 1) div 10 as bigint)").as("size_band"),
          expr("cast(cast(p_retailprice as decimal(18,2)) * 100 as bigint)")
            .as("retail_c")))
      val bands = Tables.part(s, d)
        .groupBy(expr("cast((p_size - 1) div 10 as bigint)").as("size_band"))
        .agg(count(lit(1)).as("n_parts"))
      Tables.lineitem(s, d)
        .select(col("l_partkey"),
          expr("cast(cast(l_quantity as decimal(18,2)) * 100 as bigint)").as("qty_c"),
          expr("cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)").as("price_c"))
        .join(pp, col("l_partkey") === col("p_partkey"))
        .groupBy("size_band")
        .agg(count(lit(1)).as("n_items"),
          sum((col("price_c") * 100L).cast(dec)).cast(LongType).as("sold_u4"),
          sum((col("qty_c") * col("retail_c")).cast(dec)).cast(LongType).as("list_u4"))
        .join(broadcast(bands), "size_band")
        .select(col("size_band"), col("n_parts"), col("n_items"),
          col("sold_u4"), col("list_u4"),
          expr("cast((cast(sold_u4 as decimal(38,0)) * 1000000) div list_u4 as bigint)")
            .as("realized_ppm"))
        .orderBy("size_band")
    }),

    // Supplier revenue concentration — top-10 suppliers by shipped
    // discounted revenue with their identity/balance/nation
    // attribution: the supplier-keyed rollup partial-aggs the fact
    // table BEFORE any attribution join (supplier/nation join the
    // supplier-sized frame), revenue exact 1e-4 units in
    // Decimal(38,0), top-10 via TakeOrderedAndProject with key
    // tie-break.
    "q214_top_suppliers" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .groupBy(col("l_suppkey"))
        .agg(sum(expr(
          """cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)
             * (100 - cast(cast(l_discount as decimal(18,2)) * 100 as bigint))""")
          .cast(DecimalType(38, 0))).cast(LongType).as("rev_u"))
      rev.join(Tables.supplier(s, d).select(col("s_suppkey"), col("s_name"),
          expr("cast(cast(s_acctbal as decimal(18,2)) * 100 as bigint)").as("bal_c"),
          col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"),
          col("bal_c"), col("rev_u"))
        .orderBy(col("rev_u").desc, col("s_suppkey").asc)
        .limit(10)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q29_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q30_bcast" ->
      """SELECT r_name, count(*) AS customers,
                CAST(sum(CAST(c_acctbal AS DECIMAL(28,10))) AS DOUBLE) AS balance
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",
    "q52_bloom" ->
      """SELECT o_orderpriority, count(*) AS n_orders
         FROM orders
         WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_nationkey = 1)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q53_grouptopk" ->
      """SELECT doc_id, lang, source, n_chars, rn FROM (
           SELECT doc_id, lang, source, n_chars,
                  CAST(row_number() OVER (PARTITION BY lang, source
                                          ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rn
           FROM documents)
         WHERE rn <= 3 ORDER BY lang, source, rn""",
    "q31_rollup" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(CASE WHEN GROUPING(l_returnflag) = 1 THEN 1 ELSE 0 END AS BIGINT) AS g_rf,
                CAST(CASE WHEN GROUPING(l_linestatus) = 1 THEN 1 ELSE 0 END AS BIGINT) AS g_ls,
                count(*) AS n,
                CAST(sum(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE) AS qty
         FROM lineitem
         GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""",
    "q61_cube" ->
      """SELECT l_returnflag, CAST(year(l_shipdate) AS BIGINT) AS ship_year,
                CAST(CASE WHEN GROUPING(l_returnflag) = 1 THEN 1 ELSE 0 END AS BIGINT) AS g_rf,
                CAST(CASE WHEN GROUPING(CAST(year(l_shipdate) AS BIGINT)) = 1 THEN 1 ELSE 0 END AS BIGINT) AS g_y,
                count(*) AS n,
                CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS price_cents
         FROM lineitem
         GROUP BY CUBE (l_returnflag, CAST(year(l_shipdate) AS BIGINT))
         ORDER BY g_rf, g_y, l_returnflag, ship_year""",
    "q122_gsets" ->
      """WITH li AS (SELECT *, CAST(year(l_shipdate) AS BIGINT) ship_year FROM lineitem)
         SELECT l_returnflag, l_linestatus, ship_year,
                CAST(CASE WHEN GROUPING(l_returnflag) = 1 THEN 1 ELSE 0 END AS BIGINT) AS g_rf,
                CAST(CASE WHEN GROUPING(l_linestatus) = 1 THEN 1 ELSE 0 END AS BIGINT) AS g_ls,
                CAST(CASE WHEN GROUPING(ship_year) = 1 THEN 1 ELSE 0 END AS BIGINT) AS g_y,
                count(*) AS n,
                CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS price_cents
         FROM li
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (ship_year), ())
         ORDER BY g_rf, g_ls, g_y, l_returnflag, l_linestatus, ship_year""",
    "q65_pivot" ->
      """SELECT source,
                count(CASE WHEN lang='en' THEN 1 END) AS n_en,
                count(CASE WHEN lang='fr' THEN 1 END) AS n_fr,
                count(CASE WHEN lang='de' THEN 1 END) AS n_de,
                count(CASE WHEN lang='es' THEN 1 END) AS n_es,
                count(CASE WHEN lang='zh' THEN 1 END) AS n_zh
         FROM documents GROUP BY source ORDER BY source""",
    "q67_unpivot" ->
      """WITH g AS (SELECT source, lang, count(*) AS n
                    FROM documents GROUP BY source, lang),
          s AS (SELECT DISTINCT source FROM documents),
          l AS (SELECT unnest(['en','fr','de','es','zh']) AS lang)
         SELECT s.source, l.lang, coalesce(g.n, 0) AS n
         FROM s CROSS JOIN l
         LEFT JOIN g ON g.source = s.source AND g.lang = l.lang
         ORDER BY s.source, l.lang""",
    "q66_moving" ->
      """WITH d AS (
           SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS o_day,
                  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
           FROM orders GROUP BY 1)
         SELECT o_day, cents,
                CAST(sum(cents) OVER (ORDER BY o_day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS mov7
         FROM d ORDER BY o_day LIMIT 400""",
    "q159_shipprio" ->
      """SELECT l_orderkey,
                CAST(date_trunc('day', o_orderdate) AS DATE) AS o_day,
                o_orderpriority,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
         FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-01-01'
           AND l_shipdate > TIMESTAMP '1998-01-01'
         GROUP BY l_orderkey, o_day, o_orderpriority
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q160_regional" ->
      """SELECT n_name,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
                count(*) AS n_items
         FROM region JOIN nation ON n_regionkey = r_regionkey
         JOIN customer ON c_nationkey = n_nationkey
         JOIN orders ON o_custkey = c_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY n_name
         ORDER BY revenue DESC, n_name""",
    // per-order last-ship rollup; dual-rank exact median per priority.
    "q177_aging" ->
      """WITH a AS (
           SELECT o_orderkey, o_orderpriority, o_orderdate, max(l_shipdate) last_ship
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           GROUP BY 1, 2, 3),
         g AS (SELECT o_orderpriority, o_orderkey,
                      CAST(date_diff('day', o_orderdate, last_ship) AS BIGINT) age_days
               FROM a),
         r AS (SELECT o_orderpriority, age_days,
                      row_number() OVER (PARTITION BY o_orderpriority ORDER BY age_days, o_orderkey) r,
                      count(*) OVER (PARTITION BY o_orderpriority) m
               FROM g)
         SELECT o_orderpriority, count(*) n_orders,
                CAST(sum(CASE WHEN r*2 = m+1 THEN age_days*2
                              WHEN r*2 = m OR r*2 = m+2 THEN age_days
                              ELSE 0 END) AS BIGINT) med2_days,
                CAST(max(age_days) AS BIGINT) max_days
         FROM r GROUP BY 1 ORDER BY o_orderpriority""",
    // customer rollup → three deterministic ntile(4) windows → 3-digit
    // segment code rollup.
    "q178_rfm" ->
      """WITH per AS (
           SELECT o_custkey, max(o_orderdate) last_order, count(*) freq,
                  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) cents
           FROM orders GROUP BY 1),
         t AS (SELECT *,
                 ntile(4) OVER (ORDER BY last_order DESC, o_custkey) r_q,
                 ntile(4) OVER (ORDER BY freq DESC, o_custkey) f_q,
                 ntile(4) OVER (ORDER BY cents DESC, o_custkey) m_q
               FROM per)
         SELECT CAST(r_q AS VARCHAR) || CAST(f_q AS VARCHAR) || CAST(m_q AS VARCHAR) AS segment,
                count(*) n_customers, CAST(sum(cents) AS BIGINT) cents
         FROM t GROUP BY 1 ORDER BY segment""",
    // ±1 delta stream; day-keyed net; calendar running sum.
    "q181_backlog" ->
      """WITH placed AS (
           SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day, CAST(1 AS BIGINT) delta
           FROM orders),
         done AS (
           SELECT CAST(date_trunc('day', max(l_shipdate)) AS DATE) AS day, CAST(-1 AS BIGINT) delta
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           GROUP BY o_orderkey),
         net AS (SELECT day, CAST(sum(delta) AS BIGINT) net
                 FROM (SELECT * FROM placed UNION ALL SELECT * FROM done)
                 GROUP BY 1)
         SELECT day, net,
                CAST(sum(net) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) backlog
         FROM net ORDER BY day LIMIT 500""",
    // TPC-H Q7 shape: shipped revenue between NATION_12 and NATION_20
    // by direction and ship year.
    "q187_nation_flow" ->
      """SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
                CAST(year(l_shipdate) AS BIGINT) AS yr,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                  AS revenue,
                count(*) AS n_items
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ns ON s_nationkey = ns.n_nationkey
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation nc ON c_nationkey = nc.n_nationkey
         WHERE ns.n_name IN ('NATION_12', 'NATION_20')
           AND nc.n_name IN ('NATION_12', 'NATION_20')
           AND ns.n_name <> nc.n_name
           AND l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
         GROUP BY 1, 2, 3
         ORDER BY 1, 2, 3""",
    // TPC-H Q14 shape: monthly PROMO revenue share, exact 1e-4 units.
    // TPC-H Q19 shape: three OR'd (brand, size, quantity) arms over
    // the lineitem⨝part join; same 1e-4-unit revenue integers.
    "q239_disjunctive" ->
      """WITH l AS (SELECT l_partkey,
                           CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) q_c,
                           CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))
                                * 10000 AS HUGEINT) rev_e4
                    FROM lineitem)
         SELECT CAST(count(*) AS BIGINT) n_items,
                CAST(sum(rev_e4) AS BIGINT) revenue_e4
         FROM l JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                AND q_c BETWEEN 100 AND 1100)
            OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                AND q_c BETWEEN 1000 AND 2000)
            OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
                AND q_c BETWEEN 2000 AND 3000)""",
    "q190_promo_share" ->
      """WITH j AS (SELECT CAST(year(l_shipdate) AS BIGINT) yr,
                           CAST(month(l_shipdate) AS BIGINT) mo,
                           CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))
                                * 10000 AS HUGEINT) rev_e4,
                           p_type = 'PROMO' AS promo
                    FROM lineitem JOIN part ON l_partkey = p_partkey)
         SELECT yr, mo,
                CAST(sum(CASE WHEN promo THEN rev_e4 ELSE 0 END) AS BIGINT) promo_e4,
                CAST(sum(rev_e4) AS BIGINT) total_e4,
                CAST(sum(CASE WHEN promo THEN rev_e4 ELSE 0 END) * 1000000
                     // sum(rev_e4) AS BIGINT) promo_ppm,
                count(*) n_items
         FROM j GROUP BY 1, 2 ORDER BY 1, 2""",
    // TPC-H Q17 shape: below-20%-of-part-average lineitem revenue for
    // two brands; decorrelated per-part pre-aggregate, integer test.
    "q191_small_qty" ->
      """WITH l2 AS (SELECT p_brand, l_partkey,
                            CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) price_c,
                            CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) q_c
                     FROM lineitem JOIN part ON l_partkey = p_partkey
                     WHERE p_brand IN ('Brand#2', 'Brand#4')),
         pq AS (SELECT l_partkey pk, CAST(count(*) AS BIGINT) n,
                       CAST(sum(q_c) AS BIGINT) qty_c
                FROM l2 GROUP BY 1)
         SELECT p_brand,
                CAST(count(CASE WHEN 5 * CAST(q_c AS HUGEINT) * n < qty_c THEN 1 END) AS BIGINT) n_small,
                CAST(sum(CASE WHEN 5 * CAST(q_c AS HUGEINT) * n < qty_c THEN price_c ELSE 0 END) AS BIGINT) small_cents,
                count(*) n_items
         FROM l2 JOIN pq ON l2.l_partkey = pq.pk
         GROUP BY 1 ORDER BY 1""",
    // per-customer consecutive-order gaps; q177's dual-rank exact
    // median per market segment (med2 = 2·median).
    "q192_order_gap" ->
      """WITH o AS (SELECT o_custkey, o_orderkey, o_orderdate,
                           lag(o_orderdate) OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate, o_orderkey) prev
                    FROM orders),
         g AS (SELECT c_mktsegment, o_orderkey,
                      CAST(date_diff('day', prev, o_orderdate) AS BIGINT) gap_days
               FROM o JOIN customer ON o_custkey = c_custkey WHERE prev IS NOT NULL),
         r AS (SELECT c_mktsegment, gap_days,
                      row_number() OVER (PARTITION BY c_mktsegment
                        ORDER BY gap_days, o_orderkey) r,
                      count(*) OVER (PARTITION BY c_mktsegment) m
               FROM g)
         SELECT c_mktsegment, count(*) n_gaps,
                CAST(sum(CASE WHEN r*2 = m+1 THEN gap_days*2
                              WHEN r*2 = m OR r*2 = m+2 THEN gap_days
                              ELSE 0 END) AS BIGINT) med2_days,
                CAST(max(gap_days) AS BIGINT) max_days
         FROM r GROUP BY 1 ORDER BY 1""",
    // first-order cohort month × age rollup with per-cohort running
    // revenue; integer month indexes, exact cents.
    "q193_cohort_ltv" ->
      """WITH f AS (SELECT o_custkey, min(o_orderdate) first_dt FROM orders GROUP BY 1),
         j AS (SELECT CAST(year(f.first_dt) * 12 + month(f.first_dt) AS BIGINT) cohort_m,
                      CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) AS BIGINT) ord_m,
                      CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) cents
               FROM orders o JOIN f ON o.o_custkey = f.o_custkey),
         a AS (SELECT cohort_m, ord_m - cohort_m AS age_m,
                      CAST(sum(cents) AS BIGINT) rev_cents, count(*) n_orders
               FROM j GROUP BY 1, 2)
         SELECT cohort_m, age_m, rev_cents, n_orders,
                CAST(sum(rev_cents) OVER (PARTITION BY cohort_m ORDER BY age_m
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) cum_cents
         FROM a ORDER BY cohort_m, age_m""",
    // windowed percent-of-total: nation share of region revenue, ppm.
    "q198_rev_share" ->
      """WITH nrev AS (
           SELECT r_name, n_name,
                  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) cents
           FROM orders JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           GROUP BY 1, 2)
         SELECT r_name, n_name, cents,
                CAST(CAST(cents AS HUGEINT) * 1000000 //
                     sum(CAST(cents AS HUGEINT)) OVER (PARTITION BY r_name) AS BIGINT) share_ppm
         FROM nrev ORDER BY r_name, n_name""",
    // TPC-H Q13 shape: left-outer order counts per customer (zero
    // bucket included), then the order-count histogram.
    "q201_custdist" ->
      """WITH c AS (
           SELECT c_custkey, count(o_orderkey) AS n_orders
           FROM customer LEFT JOIN orders
             ON c_custkey = o_custkey AND o_orderpriority = '1-URGENT'
           GROUP BY 1)
         SELECT n_orders, count(*) AS n_custs
         FROM c GROUP BY 1 ORDER BY n_custs DESC, n_orders DESC""",
    // TPC-H Q22 shape: above-positive-mean balances (integer
    // cross-multiplied) with no urgent orders (NOT EXISTS anti join).
    "q202_idle_rich" ->
      """WITH c AS (SELECT c_custkey, c_nationkey,
                           CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) bal_c
                    FROM customer),
         s AS (SELECT CAST(sum(bal_c) AS HUGEINT) sum_c, count(*) n_pos
               FROM c WHERE bal_c > 0)
         SELECT n_name, count(*) AS n_cust, CAST(sum(bal_c) AS BIGINT) AS bal_cents
         FROM c CROSS JOIN s
         JOIN nation ON c_nationkey = n_nationkey
         WHERE CAST(bal_c AS HUGEINT) * n_pos > sum_c
           AND NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderpriority = '1-URGENT')
         GROUP BY 1 ORDER BY 1""",
    // TPC-H Q18 shape: per-order quantity rollup, HAVING survivors
    // joined back, deterministic top-100.
    "q203_bigorders" ->
      """WITH b AS (
           SELECT l_orderkey AS bk,
                  CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) qty_c
           FROM lineitem GROUP BY 1
           HAVING sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) > 30000)
         SELECT c_name, o_orderkey, o_orderdate, qty_c
         FROM orders JOIN b ON o_orderkey = bk
         JOIN customer ON o_custkey = c_custkey
         ORDER BY qty_c DESC, o_orderkey LIMIT 100""",
    // TPC-H Q10 shape: returned revenue per customer in 1995, exact
    // 1e-4-dollar units, top-20.
    "q209_returns" ->
      """WITH r AS (
           SELECT l_orderkey,
                  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                  * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)) rev_u
           FROM lineitem WHERE l_returnflag = 'R'),
         g AS (
           SELECT o_custkey, CAST(sum(rev_u) AS BIGINT) rev_u
           FROM orders JOIN r ON o_orderkey = l_orderkey
           WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01'
           GROUP BY 1)
         SELECT c_custkey, c_name, n_name, rev_u
         FROM g JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         ORDER BY rev_u DESC, c_custkey LIMIT 20""",
    // TPC-H Q12 shape: priority-class counts per order-to-ship
    // latency bucket.
    "q210_late_ship" ->
      """SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30 THEN 'fast'
                     WHEN date_diff('day', o_orderdate, l_shipdate) <= 90 THEN 'normal'
                     ELSE 'late' END AS bucket,
                count(*) AS n_items,
                CAST(count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                                THEN 1 END) AS BIGINT) AS n_high,
                CAST(count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                                THEN 1 END) AS BIGINT) AS n_low
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY 1 ORDER BY 1""",
    // EXISTS/NOT-EXISTS correlated pair over the once-joined frame.
    "q253_sole_late" ->
      """WITH l AS (
           SELECT l_orderkey ok, l_suppkey sk,
                  date_diff('day', o_orderdate, l_shipdate) > 60 late
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         w AS (SELECT ok, sk FROM l WHERE late),
         c AS (
           SELECT w.ok, w.sk FROM w
           WHERE EXISTS (SELECT 1 FROM l x WHERE x.ok = w.ok AND x.sk <> w.sk)
             AND NOT EXISTS (SELECT 1 FROM l y
                             WHERE y.ok = w.ok AND y.sk <> w.sk AND y.late))
         SELECT sk AS s_suppkey, count(*) AS numwait
         FROM c GROUP BY 1
         ORDER BY numwait DESC, s_suppkey LIMIT 10""",
    // integer-cents leading digit census vs floor(log10(1+1/d)·1e6).
    "q254_benford" ->
      """WITH c AS (
           SELECT substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                    AS VARCHAR), 1, 1) digit
           FROM orders),
         g AS (SELECT digit, count(*) n_orders FROM c GROUP BY 1),
         t AS (SELECT digit, n_orders, SUM(n_orders) OVER () total FROM g)
         SELECT digit, n_orders,
                CAST((n_orders * 1000000) // total AS BIGINT) obs_ppm,
                CAST(([301029, 176091, 124938, 96910, 79181, 66946, 57991,
                  51152, 45757])[CAST(digit AS INT)] AS BIGINT) exp_ppm
         FROM t ORDER BY digit""",
    // TPC-H Q1 faithful: exact integer qty/base/disc-price/charge
    // sums (1e-2 / 1e-2 / 1e-4 / 1e-6 dollar units).
    "q211_pricing" ->
      """WITH l AS (
           SELECT l_returnflag, l_linestatus,
                  CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) qty_c,
                  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) price_c,
                  CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) disc_c,
                  CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT) tax_c
           FROM lineitem WHERE l_shipdate <= DATE '2001-09-01')
         SELECT l_returnflag, l_linestatus,
                CAST(sum(qty_c) AS BIGINT) sum_qty_c,
                CAST(sum(price_c) AS BIGINT) sum_base_c,
                CAST(sum(CAST(price_c * (100 - disc_c) AS HUGEINT)) AS BIGINT) sum_disc_u4,
                CAST(sum(CAST(price_c * (100 - disc_c) * (100 + tax_c) AS HUGEINT)) AS BIGINT) sum_charge_u6,
                count(*) n
         FROM l GROUP BY 1, 2 ORDER BY 1, 2""",
    // order status must derive from its lineitems; line numbers must
    // be dense 1..n.
    "q212_order_integrity" ->
      """WITH li AS (
           SELECT l_orderkey, count(*) n_items,
                  count(CASE WHEN l_linestatus = 'F' THEN 1 END) n_f,
                  CAST(max(l_linenumber) AS BIGINT) max_ln
           FROM lineitem GROUP BY 1),
         j AS (
           SELECT o_orderstatus,
                  CASE WHEN n_items IS NULL THEN 'NONE'
                       WHEN n_f = n_items THEN 'F'
                       WHEN n_f = 0 THEN 'O' ELSE 'P' END derived,
                  CASE WHEN n_items IS NULL OR max_ln <> n_items THEN 1 ELSE 0 END ln_bad
           FROM orders LEFT JOIN li ON o_orderkey = l_orderkey)
         SELECT o_orderstatus, count(*) n_orders,
                CAST(count(CASE WHEN derived <> o_orderstatus THEN 1 END) AS BIGINT) n_status_mismatch,
                CAST(sum(ln_bad) AS BIGINT) n_linenum_bad
         FROM j GROUP BY 1 ORDER BY 1""",
    // realized revenue vs list value of the same quantities, by
    // part-size decade band, exact ppm.
    "q213_size_value" ->
      """WITH pp AS (
           SELECT p_partkey, CAST((p_size - 1) // 10 AS BIGINT) size_band,
                  CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) retail_c
           FROM part),
         bands AS (SELECT size_band, count(*) n_parts FROM pp GROUP BY 1),
         g AS (
           SELECT size_band, count(*) n_items,
                  CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 100 AS HUGEINT)) AS BIGINT) sold_u4,
                  CAST(sum(CAST(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) * retail_c AS HUGEINT)) AS BIGINT) list_u4
           FROM lineitem JOIN pp ON l_partkey = p_partkey
           GROUP BY 1)
         SELECT g.size_band, n_parts, n_items, sold_u4, list_u4,
                CAST((CAST(sold_u4 AS HUGEINT) * 1000000) // list_u4 AS BIGINT) realized_ppm
         FROM g JOIN bands ON g.size_band = bands.size_band
         ORDER BY g.size_band""",
    // top-10 suppliers by shipped discounted revenue, with identity
    // and nation attribution.
    "q214_top_suppliers" ->
      """WITH rev AS (
           SELECT l_suppkey,
                  CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                       * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)) AS HUGEINT)) AS BIGINT) rev_u
           FROM lineitem GROUP BY 1)
         SELECT s_suppkey, s_name, n_name,
                CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) bal_c, rev_u
         FROM rev JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         ORDER BY rev_u DESC, s_suppkey LIMIT 10"""
  )
}
