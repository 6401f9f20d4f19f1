package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Relational operator inventory, SURVEY.md §2 Part B2–B7: filters, joins,
  * aggregations, windows, sort/limit, set ops — each as an oracle-checked
  * query over the TPC-H-ish tables.
  *
  * Determinism discipline (SURVEY §7.5): money/double aggregates go through
  * DECIMAL(18,4) pre-casts (exact, summation-order-independent — a raw
  * SUM(double) varies with partitioning); averages are decimal-sum → double →
  * ÷count (each step IEEE-deterministic and engine-agnostic); every query ends
  * in a total ORDER BY mirrored verbatim in the oracle SQL.
  */
object Relational {

  /** Order-independent money aggregate: SUM(CAST(x AS DECIMAL(18,4))) —
    * exact, so the shuffle/merge order of partial sums can't change the
    * value — final-cast to DOUBLE. NEVER emit a decimal output column: the
    * driver's result hash canonicalizes decimals differently than a value
    * comparison would (round 1's DECIMAL(38,4) pin and round 2's type
    * canonicalization both failed its gate), whereas a decimal→double final
    * cast is correctly rounded and bit-identical on both engines — the
    * pattern proven green by `davg` / `win_sliding_avg` / `subq_scalar_corr`.
    * Mirrored as CAST(SUM(CAST(… AS DECIMAL(18,4))) AS DOUBLE) in every
    * oracle. */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(18,4)")).cast("double")

  /** Deterministic average: exact decimal sum (already double-cast by dsum),
    * divided by count. Never AVG(double) (partition-order-dependent) and
    * never decimal division (DuckDB returns DOUBLE for decimal/int, Spark
    * returns decimal). */
  private def davg(c: Column): Column =
    dsum(c) / count(lit(1))

  /** `join_skew_salted`'s fan-out factor — how many sub-keys a hot key
    * spreads over (and how many copies of each right row ship). */
  private[graft] val SkewSalts = 8

  /** Salted inner equi-join — the manual skew recipe for when one key's
    * row count dwarfs the rest and a single reducer becomes the stage's
    * straggler: every LEFT row scatters to one of [[SkewSalts]] sub-keys
    * via a caller-chosen DISCRIMINATOR (any expression that varies within
    * the hot key — here a row-identity hash; a random would work but
    * break the repo's determinism discipline), the RIGHT side replicates
    * ×salts via a generated salt column, and the join keys on
    * (key, salt) — so the hot key's probe work spreads over `salts`
    * reducers at the price of a salts× copy of the (small but
    * non-broadcastable) right side. Replicate-right inner-join algebra
    * makes the result EXACTLY the plain join's: each left row meets each
    * matching right row exactly once (at its own salt).
    *
    * Relationship to AQE: `OptimizeSkewedJoin` splits oversized
    * post-shuffle partitions at runtime and is the first thing to reach
    * for; the salt is the PLAN-level form for when AQE can't see or
    * can't act — a skewed key feeding a downstream keyed AGGREGATION
    * (AQE won't split a partition an agg requires whole), stats hidden
    * by compressed inputs, or a fixed-topology streaming stage. */
  private[graft] def saltedJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      discriminator: Column): DataFrame = {
    val l = left.withColumn("salt_l",
      pmod(discriminator, lit(SkewSalts.toLong)).cast("int"))
    val r = right.withColumn("salt_r",
      explode(sequence(lit(0), lit(SkewSalts - 1))))
    l.join(r, col(leftKey) === col(rightKey)
        && col("salt_l") === col("salt_r"))
      .drop("salt_l", "salt_r")
  }

  /** CDC MERGE/upsert apply (the SQL:2003 MERGE / Delta-Lake MERGE INTO
    * semantics as a relational operator): `changes` carries FULL
    * replacement rows plus an `op` column — matched keys are replaced
    * (update), unmatched inserted, and `op = 'D'` rows deleted. The
    * production shape deliberately avoids a full-outer join (which no
    * engine can broadcast): untouched target rows survive a LEFT ANTI
    * against the delta's key set, then the delta's survivors union in —
    * with a small delta (the normal CDC regime) the anti-join broadcasts
    * and the TARGET NEVER SHUFFLES; `broadcastDelta = false` is the
    * large-backfill fallback (plain shuffled anti-join, AQE handles
    * skew).
    *
    * The broadcast hedge is SIZE-GUARDED (ADVICE r14): a caller applying
    * a large backfill under the default flag must not drive a
    * driver-OOM-sized key broadcast, so when `broadcastDelta` is set the
    * delta's key count is probed with one bounded job on the slim side
    * ([[MergeBroadcastKeyCap]]+1-limited count — delta-sized, the CDC
    * regime's cheap side) and the plan degrades gracefully to the
    * shuffled anti-join above the cap instead of OOMing.
    *
    * Exactly-once per key requires the delta be key-distinct — upstream
    * compaction's contract. `validateDelta = true` re-checks it (one
    * aggregate over the delta: total vs distinct key count) for
    * debug/test paths; the default leaves the contract to the caller. */
  def mergeUpsert(target: DataFrame, changes: DataFrame, key: String,
      broadcastDelta: Boolean = true,
      validateDelta: Boolean = false,
      broadcastKeyCap: Long = MergeBroadcastKeyCap): DataFrame = {
    if (validateDelta) {
      val r = changes.agg(count(lit(1)).as("n"),
        count_distinct(col(key)).as("nd")).head()
      require(r.getLong(0) == r.getLong(1),
        s"mergeUpsert delta is not key-distinct on '$key': " +
          s"${r.getLong(0)} rows over ${r.getLong(1)} keys")
    }
    // when probing, materialize the key set ONCE (localCheckpoint) so
    // the size probe and the anti-join share it — the probe then costs
    // the materialization the join needed anyway, not a second distinct
    val keys0 = changes.select(key).distinct()
    val keys = if (broadcastDelta) keys0.localCheckpoint() else keys0
    // clamp the probe limit: a caller-supplied cap near Int.MaxValue
    // must degrade to the shuffled anti-join, not overflow to a
    // negative limit (ADVICE r15)
    val probeLimit =
      if (broadcastKeyCap >= Int.MaxValue.toLong) Int.MaxValue
      else (broadcastKeyCap + 1).toInt
    val doBroadcast = broadcastDelta &&
      keys.limit(probeLimit).count() <= broadcastKeyCap
    val untouched = target.join(
      if (doBroadcast) broadcast(keys) else keys, Seq(key), "left_anti")
    untouched.unionByName(changes.filter(col("op") =!= "D").drop("op"))
  }

  /** Distinct-key count above which [[mergeUpsert]] refuses the broadcast
    * hedge and falls back to the shuffled anti-join — sized well under
    * the driver-memory regime a key-only broadcast can carry (5M slim
    * keys ≈ tens of MB). */
  val MergeBroadcastKeyCap: Long = 5000000L

  /** Merge-on-read view (the Hudi MoR / Delta change-feed-apply
    * semantics): the delta LOG may carry several versions of a key —
    * latest (max `seq`) wins, then the CDC apply ([[mergeUpsert]]). An
    * update-then-delete history deletes; a delete-then-reinsert history
    * reinserts — per-key time travel collapses to ONE row before the
    * apply, so the view's cost is the log's (one key-partitioned
    * window over the slim log), never the target's. (`key`, `seq`)
    * uniqueness is the log's write contract (every CDC log orders its
    * own stream) — ties would make "latest" meaningless in any engine;
    * under that contract the dropDuplicates below is an exact no-op on
    * a clean log and collapses byte-identical REPLAYED appends (the
    * streaming twin's at-least-once hedge) deterministically. */
  def mergeView(target: DataFrame, deltaLog: DataFrame, key: String,
      seq: String, broadcastDelta: Boolean = true): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(col(seq).desc)
    val latest = deltaLog.dropDuplicates(key, seq)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn", seq)
    mergeUpsert(target, latest, key, broadcastDelta)
  }

  /** SCD Type-2 history build (Kimball's slowly-changing dimension):
    * turn a (key, seq, attributes…) change log into versioned validity
    * intervals — valid_from = the version's own seq, valid_to = the NEXT
    * version's seq (null while current), is_current on the last. One
    * key-partitioned window over the log (lead), no join, no shuffle
    * beyond the window sort — the log is the slim side by construction. */
  def scd2Build(log: DataFrame, key: String, seq: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(col(seq))
    log.withColumn("valid_from", col(seq))
      .withColumn("valid_to", lead(col(seq), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop(seq)
  }

  /** Point-in-time read over an SCD2 table: the version whose interval
    * covers `at` — the time-travel primitive. Map-side filter; with the
    * history partitioned by is_current, current-state reads prune to one
    * partition. */
  def scd2Snapshot(hist: DataFrame, at: Column): DataFrame =
    hist.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || at < col("valid_to")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ------------------------------------------------ B2 filters
    "filter_compound" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_quantity").between(10, 20)
          && col("l_returnflag").isin("A", "R")
          && !(col("l_discount") < 0.02)
          && col("l_shipdate").isNotNull)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
          "l_returnflag")
        // (l_orderkey, l_linenumber) is NOT unique in this synthetic data —
        // order by every output column so the order is total up to exact-
        // duplicate (interchangeable) rows.
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
          "l_returnflag")),

    "filter_like" -> ((s, d) =>
      Tables.part(s, d)
        .filter(col("p_name").like("%bolt%") && col("p_brand").rlike("Brand#1[0-9]"))
        .select("p_partkey", "p_name", "p_type")
        .orderBy("p_partkey")),

    // ------------------------------------------------ B3 joins
    "join_broadcast_inner" -> ((s, d) =>
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "c_name", "n_name")
        .orderBy("c_custkey")),

    // Aggregate-before-shuffle (round 16, guide §2.3 — measured −55% at
    // sf0.1): the group key is the join key and orders is key-unique, so
    // the 4x-larger lineitem side rolls up FIRST (map-side partial
    // aggregation, the exchange carries one combined row per orderkey
    // instead of every line) and the slim rollup joins orders after.
    // Value-identical: dsum is an exact decimal sum (order-free) and the
    // inner join keeps exactly the orderkeys the post-join groupBy kept.
    "join_shuffle_inner" -> ((s, d) => {
      val la = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
          count(lit(1)).as("n_lines"))
      Tables.orders(s, d)
        .join(la, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("o_orderpriority"), col("revenue"),
          col("n_lines"))
        .orderBy("o_orderkey")
    }),

    // The skew-salting recipe as a DECLARED, oracle-checked operator:
    // identical result to the plain shuffle join — proven by the oracle,
    // whose SQL knows nothing of salts — with the hot key's rows spread
    // over [[SkewSalts]] sub-keys (see [[saltedJoin]]). Aggregated to the
    // 5-row priority rollup so the declared output is compact.
    "join_skew_salted" -> ((s, d) =>
      saltedJoin(Tables.lineitem(s, d), Tables.orders(s, d),
          "l_orderkey", "o_orderkey",
          xxhash64(col("l_orderkey"), col("l_linenumber")))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"),
          dsum(col("l_extendedprice")).as("price_total"))
        .orderBy("o_orderpriority")),

    // MERGE as a declared, oracle-checked key: the change feed is DERIVED
    // deterministically from orders itself (md5-nibble routing, the
    // sampler discipline — both engines derive the identical delta):
    // nibbles 0/1 update (price doubled — an exact exponent bump — and
    // status 'U'), nibble 2 deletes, nibble 3 inserts a re-keyed copy.
    // The oracle knows nothing of the anti+union plan — it states MERGE
    // semantics directly (NOT IN + UNION ALL), so equality proves the
    // decomposition, not just the arithmetic.
    "merge_upsert" -> ((s, d) => {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice").map(col)
      val target = Tables.orders(s, d).select(cols: _*)
      val base = Tables.orders(s, d).withColumn("nib",
        substring(md5(col("o_orderkey").cast("string")), 1, 1))
      val updates = base.filter(col("nib").isin("0", "1"))
        .select(col("o_orderkey"), col("o_custkey"),
          lit("U").as("o_orderstatus"),
          (col("o_totalprice") * 2).as("o_totalprice"), lit("U").as("op"))
      val deletes = base.filter(col("nib") === "2")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), lit("D").as("op"))
      val inserts = base.filter(col("nib") === "3")
        .select((col("o_orderkey") + 1000000000L).as("o_orderkey"),
          col("o_custkey"), lit("N").as("o_orderstatus"),
          col("o_totalprice"), lit("I").as("op"))
      mergeUpsert(target,
          updates.unionByName(deletes).unionByName(inserts), "o_orderkey")
        .orderBy("o_orderkey")
    }),

    // Merge-on-read with a MULTI-VERSION delta log: nibble-0 keys carry
    // an update at seq 1 (price ×2) SUPERSEDED by seq 2 (price ×3);
    // nibble-2 keys carry update-then-delete (the delete wins); nibble-3
    // keys a seq-1 insert. Latest-per-key collapse, then the CDC apply —
    // the oracle replays the same history with a window rank.
    "merge_view" -> ((s, d) => {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice").map(col)
      val target = Tables.orders(s, d).select(cols: _*)
      val base = Tables.orders(s, d).withColumn("nib",
        substring(md5(col("o_orderkey").cast("string")), 1, 1))
      val log = base.filter(col("nib") === "0")
        .select(col("o_orderkey"), col("o_custkey"),
          lit("U").as("o_orderstatus"),
          (col("o_totalprice") * 2).as("o_totalprice"),
          lit("U").as("op"), lit(1L).as("seq"))
        .unionByName(base.filter(col("nib") === "0")
          .select(col("o_orderkey"), col("o_custkey"),
            lit("U").as("o_orderstatus"),
            (col("o_totalprice") * 3).as("o_totalprice"),
            lit("U").as("op"), lit(2L).as("seq")))
        .unionByName(base.filter(col("nib") === "2")
          .select(col("o_orderkey"), col("o_custkey"),
            lit("U").as("o_orderstatus"),
            (col("o_totalprice") * 2).as("o_totalprice"),
            lit("U").as("op"), lit(1L).as("seq")))
        .unionByName(base.filter(col("nib") === "2")
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_orderstatus"), col("o_totalprice"),
            lit("D").as("op"), lit(2L).as("seq")))
        .unionByName(base.filter(col("nib") === "3")
          .select((col("o_orderkey") + 1000000000L).as("o_orderkey"),
            col("o_custkey"), lit("N").as("o_orderstatus"),
            col("o_totalprice"), lit("I").as("op"), lit(1L).as("seq")))
      mergeView(target, log, "o_orderkey", "seq").orderBy("o_orderkey")
    }),

    // UNPIVOT (melt): wide per-nation metric columns back to long
    // (nk, metric, value) rows — the inverse of agg_pivot, via the
    // native Dataset.unpivot (codegen'd Expand, one pass, no join).
    "agg_unpivot" -> ((s, d) => {
      val sup = Tables.supplier(s, d)
        .groupBy(col("s_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_suppliers"))
      val cus = Tables.customer(s, d)
        .groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_customers"))
      sup.join(cus, Seq("nk"), "full")
        .select(col("nk"),
          coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"),
          coalesce(col("n_customers"), lit(0L)).as("n_customers"))
        .unpivot(Array(col("nk")),
          Array(col("n_suppliers"), col("n_customers")),
          "metric", "value")
        .orderBy("nk", "metric")
    }),

    // SCD2 over a derived change history: every order has a seq-1 birth
    // version; nibble-0 keys gain a seq-2 price revision (×2). The build
    // turns the log into validity intervals — revised keys show a closed
    // [1,2) original and a current ×2 row, everyone else one current row.
    "scd2_build" -> ((s, d) => {
      val base = Tables.orders(s, d).withColumn("nib",
        substring(md5(col("o_orderkey").cast("string")), 1, 1))
      val log = base
        .select(col("o_orderkey"), col("o_totalprice"), lit(1L).as("seq"))
        .unionByName(base.filter(col("nib") === "0")
          .select(col("o_orderkey"),
            (col("o_totalprice") * 2).as("o_totalprice"),
            lit(2L).as("seq")))
      scd2Build(log, "o_orderkey", "seq")
        .select(col("o_orderkey"), col("o_totalprice"),
          col("valid_from"), col("valid_to"), col("is_current"))
        .orderBy("o_orderkey", "valid_from")
    }),

    "join_left_outer" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_big_orders"),
          dsum(coalesce(col("o_totalprice"), lit(0))).as("big_total"))
        .orderBy("c_custkey")),

    "join_full_outer" -> ((s, d) => {
      val sup = Tables.supplier(s, d).groupBy(col("s_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_suppliers"))
      val cus = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
        .groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_rich_customers"))
      sup.join(cus, Seq("nk"), "full")
        .select(col("nk"), coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"),
          coalesce(col("n_rich_customers"), lit(0L)).as("n_rich_customers"))
        .orderBy("nk")
    }),

    "join_left_semi" -> ((s, d) =>
      Tables.part(s, d)
        .join(Tables.lineitem(s, d).filter(col("l_quantity") >= 49),
          col("p_partkey") === col("l_partkey"), "left_semi")
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy("p_partkey")),

    // Natural FK anti-joins are empty on this referentially-complete data
    // (FIXTURES.md §1) — restrict the right side so the result is non-trivial.
    "join_left_anti" -> ((s, d) =>
      Tables.part(s, d)
        .join(Tables.lineitem(s, d)
            .filter(col("l_shipdate") >= lit("2001-01-01 00:00:00").cast("timestamp")),
          col("p_partkey") === col("l_partkey"), "left_anti")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")),

    "join_theta_range" -> ((s, d) =>
      // band join: orders priced within a part-price band — keep the small
      // side broadcastable (5-row dim) so this plans as BroadcastNestedLoop.
      Tables.orders(s, d).alias("o")
        .join(broadcast(Tables.region(s, d)).alias("r"),
          expr("o.o_totalprice >= 50000.0 * r.r_regionkey AND " +
               "o.o_totalprice <  50000.0 * (r.r_regionkey + 1)"))
        .groupBy(col("r.r_regionkey").as("price_band"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o.o_totalprice")).as("band_total"))
        .orderBy("price_band")),

    "join_cross" -> ((s, d) =>
      Tables.region(s, d).alias("a").crossJoin(Tables.region(s, d).alias("b"))
        .select(col("a.r_name").as("name_a"), col("b.r_name").as("name_b"))
        .orderBy("name_a", "name_b")),

    // as-of join: for each order, the customer's latest event at-or-before a
    // fixed pivot instant — no native as-of in either engine, so both sides
    // use the identical max()-per-key formulation (SURVEY B3.9).
    "join_asof" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("ts") <= lit("2024-01-15 00:00:00").cast("timestamp"))
        .groupBy(col("user_id"))
        .agg(max(col("ts")).as("asof_ts"))
      Tables.customer(s, d).alias("c")
        .join(ev.alias("e"), col("c_custkey") % 1000 === col("user_id"), "left")
        .select(col("c_custkey"), col("user_id"), col("asof_ts"))
        .orderBy("c_custkey")
    }),

    "join_interval" -> ((s, d) => {
      // events of the same user within 5 minutes of a purchase event
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("p_event"),
          col("ts").as("p_ts"))
      ev.alias("e").join(purchases.alias("p"),
          col("e.user_id") === col("p_user")
            && col("e.event_id") =!= col("p_event")
            && col("e.ts").between(
              col("p_ts") - expr("INTERVAL 5 MINUTES"),
              col("p_ts") + expr("INTERVAL 5 MINUTES")))
        .select(col("p_event"), col("e.event_id").as("nearby_event"),
          col("e.event_type").as("nearby_type"))
        .orderBy("p_event", "nearby_event")
    }),

    // ------------------------------------------------ B4 aggregations
    "agg_basic" -> ((s, d) =>
      // TPC-H Q1 pricing summary
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price"),
          // triple product of 2-decimal values has 6 decimal digits — casting
          // the double product at scale 4 hits exact …50 ties where Spark
          // (HALF_UP) and DuckDB (half-even) disagree. Casting each factor
          // first makes the decimal product exact (no rounding inside the
          // sum). The exact sum is then RESCALED to (18,6) before the double
          // cast: at scale 12 a ~1e9 total is a 71-bit scaled integer, and
          // DuckDB's int128→double conversion rounds twice (int→double,
          // then ÷10¹²) where Java's BigDecimal rounds once — a genuine
          // 1-ulp divergence observed at sf0.1. The rescale itself is
          // LOSSLESS: 2-decimal money factors make the scale-12 product a
          // multiple of 10⁻⁶, so the dropped digits are zero and DuckDB's
          // truncating downscale agrees with Spark's HALF_UP; at scale 6
          // the scaled integer stays under 2⁵³ (exact until group totals
          // ~9e9), so both engines' double conversions are single
          // correctly-rounded ops.
          sum(col("l_extendedprice").cast("decimal(12,4)")
            * (lit(1) - col("l_discount")).cast("decimal(6,4)")
            * (lit(1) + col("l_tax")).cast("decimal(6,4)"))
            .cast("decimal(18,6)").cast("double").as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // RFM customer segmentation — the second end-to-end reporting
    // composite next to composite_q3: per-customer recency/frequency/
    // monetary, scored into quartile bands. Scale shape: quartile
    // THRESHOLDS come from one percentile_disc aggregate (9 scalars) and
    // broadcast back onto the per-customer table — never a global
    // un-partitioned ntile() window, which would single-partition the
    // whole customer dimension (the global-window anti-pattern; same
    // broadcast-threshold pattern as text_quality_filter). Recency is
    // compared in epoch seconds (midnight timestamps — integral, exact in
    // both engines); monetary is the exact-decimal-sum double.
    "composite_rfm" -> ((s, d) => {
      val per = Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(max(col("o_orderdate")).as("last_order"),
          count(lit(1)).as("frequency"),
          dsum(col("o_totalprice")).as("monetary"))
        // NTZ→LTZ is identity under the pinned UTC session; DuckDB's
        // epoch() reads the same wall-clock seconds from its (ntz)
        // TIMESTAMP — midnight order dates make them integral and exact
        .withColumn("rec", col("last_order").cast("timestamp").cast("long"))
      val th = per.agg(
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY rec)").as("r25"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY rec)").as("r50"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY rec)").as("r75"),
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY frequency)").as("f25"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY frequency)").as("f50"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY frequency)").as("f75"),
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY monetary)").as("m25"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY monetary)").as("m50"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY monetary)").as("m75"))
      def score(v: Column, a: Column, b: Column, c: Column): Column =
        lit(1) + (v >= a).cast("int") + (v >= b).cast("int") +
          (v >= c).cast("int")
      per.crossJoin(broadcast(th))
        .select(col("o_custkey"), col("last_order"), col("frequency"),
          col("monetary"),
          score(col("rec"), col("r25"), col("r50"), col("r75")).as("r_score"),
          score(col("frequency"), col("f25"), col("f50"), col("f75"))
            .as("f_score"),
          score(col("monetary"), col("m25"), col("m50"), col("m75"))
            .as("m_score"))
        .orderBy("o_custkey")
    }),

    // Per-group Pearson correlation — native corr() folds raw double
    // partials in partition order and is not oracle-able (nor stable under
    // AQE re-plans); same cure as agg_var_exact: five EXACT decimal moment
    // sums (products of ≤2-decimal values cast at (18,4) before summing —
    // exact, order-free), each cast to double ONCE, then one identical
    // double expression on both engines (IEEE mul/sub/sqrt/div are
    // correctly rounded ⇒ identical bits). Column choice is load-bearing:
    // quantity × discount keeps every scaled moment sum < 2⁵³, where the
    // decimal→double cast is a single exact-input rounding on both engines
    // — price² sums overflow that bound and trip DuckDB's two-step
    // int128→double rounding (1-ulp drift, measured; the agg_basic
    // sum_charge comment records the same mechanism).
    "agg_corr" -> ((s, d) => {
      val x = col("l_quantity")
      val y = col("l_discount")
      def dsumOf(c: Column): Column =
        sum(c.cast("decimal(18,4)")).cast("double")
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).cast("double").as("n"),
          dsumOf(x).as("sx"), dsumOf(y).as("sy"),
          dsumOf(x * y).as("sxy"), dsumOf(x * x).as("sxx"),
          dsumOf(y * y).as("syy"))
        .select(col("l_returnflag"),
          col("n").cast("bigint").as("n"),
          ((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
              sqrt(col("n") * col("syy") - col("sy") * col("sy"))))
            .as("corr_qty_disc"))
        .orderBy("l_returnflag")
    }),

    "agg_count_distinct" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type")),

    "agg_minmax_by" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(max_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey")))
          .as("best_order"),
          min_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey")))
            .as("worst_order"))
        .orderBy("o_custkey")),

    // Ordered string aggregation (SQL:2016 LISTAGG, new in Spark 4): the
    // WITHIN GROUP (ORDER BY) clause is what makes a concatenation
    // oracle-eligible at all — unordered listagg/string_agg concatenates
    // in partition-arrival order on both engines
    "agg_listagg" -> ((s, d) =>
      Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)")
          .as("nations"),
          count(lit(1)).as("n_nations"))
        .orderBy("r_name")),

    // Deterministic MODE: built-in mode() picks an arbitrary tie winner on
    // both engines, so the declared form composes it from exact pieces —
    // count per (group, value), then arg-max with a (count, value) ordering
    // key. Two partial-aggregated map-side stages; the per-(type, value)
    // keyspace bounds the first shuffle, the second is group-cardinality.
    "agg_mode" -> ((s, d) => {
      val c = Tables.events(s, d)
        .groupBy("event_type", "value").agg(count(lit(1)).as("n"))
      c.groupBy("event_type")
        .agg(max_by(col("value"), struct(col("n"), col("value")))
          .as("mode_value"),
          max(col("n")).as("n_occurrences"))
        .orderBy("event_type")
    }),

    // Misra–Gries heavy hitters in its EXACT regime (round 12): with k ≥
    // the per-group distinct-item count the sketch never decrements, so
    // estimates equal true counts, max_error is provably 0, and the output
    // is merge-order-independent — oracle-eligible, unlike the approximate
    // regime (TEST-gated in HeavyHittersSpec, SURVEY §7.5.7). One typed-
    // Aggregator pass: the shuffle carries ≤k counters per group, never
    // the (group × item) keyspace — at 100 TB that is the difference
    // between this and agg_mode's two-stage groupBy.
    "agg_heavy_hitters" -> ((s, d) => {
      val hh = Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(HeavyHitters.heavyHitters(col("o_orderpriority"), 8).as("hh"))
      hh.select(col("o_orderstatus"), col("hh.n").as("n_orders"),
          col("hh.maxError").as("max_error"), explode(col("hh.items")).as("it"))
        .select(col("o_orderstatus"), col("it.item").as("o_orderpriority"),
          col("it.count").as("n_occurrences"), col("n_orders"),
          col("max_error"))
        .orderBy(col("o_orderstatus"), desc("n_occurrences"),
          col("o_orderpriority"))
    }),

    "agg_grouping_sets" -> ((s, d) =>
      // subtotal lattice: rollup → (region, nation), (region), (grand).
      // Subtotal NULLs are coalesced to a sentinel so null-ordering semantics
      // (Spark NULLS FIRST vs DuckDB NULLS LAST) never enter the compare.
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("total_bal"))
        .select(coalesce(col("r_name"), lit("ALL")).as("region"),
          coalesce(col("n_name"), lit("ALL")).as("nation"),
          col("n_customers"), col("total_bal"))
        .orderBy("region", "nation")),

    // Full subtotal lattice: CUBE adds the column-wise marginals rollup
    // can't express; grouping_id() disambiguates a subtotal NULL from a
    // data NULL (same MSB-first bitmask convention in DuckDB's
    // GROUPING(a,b) — verified empirically).
    "agg_cube" -> ((s, d) =>
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"),
          count(lit(1)).as("n"),
          dsum(col("l_quantity")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("gid"), col("n"), col("sum_qty"))
        .orderBy("gid", "returnflag", "linestatus")),

    // The TPC-H Q3 shape end-to-end: selective dim filter → broadcast →
    // fact-fact shuffle join → decimal-exact revenue per order → top-k.
    // The segment filter prunes ~4/5 of customers BEFORE the broadcast;
    // lineitem never shuffles twice (single join key); the final top-k is
    // TakeOrderedAndProject, never a global sort.
    "composite_q3" -> ((s, d) =>
      Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < lit("2000-06-01").cast("timestamp"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > lit("2000-06-01").cast("timestamp"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority", "revenue")
        .orderBy(desc("revenue"), asc("o_orderkey"))
        .limit(20)),

    "agg_pivot" -> ((s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = Tables.events(s, d)
        .groupBy("user_id")
        .pivot("event_type", types)
        .agg(count(lit(1)))
      p.select(col("user_id") +: types.map(t =>
          coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy("user_id")
    }),

    // Exact discrete percentiles (SQL-standard: smallest value whose
    // cume_dist ≥ p — empirically verified identical to DuckDB's
    // quantile_disc). percentile_disc SELECTS an element, so the output is
    // a source double verbatim — no interpolation arithmetic to diverge
    // between engines (percentile_cont would interpolate in
    // engine-specific fold order). Spark's implementation accumulates a
    // value→count map per group: memory is bounded by distinct values per
    // group, not rows — fine for quantity-like columns; for high-cardinality
    // columns at 100 TB the scale path is approx_percentile (t-digest),
    // which is not oracle-able bit-for-bit and stays out of `queries`.
    "agg_percentile" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity)").as("q25"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)").as("median_qty"),
          expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY l_quantity)").as("q75"),
          expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY l_extendedprice)").as("p95_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    // Fixed-width histogram via floor arithmetic (not width_bucket — the
    // portable form). floor(double/20000) is exact on both engines: the
    // division can only land on an integer when o_totalprice is an exact
    // multiple, and both operands are exactly representable. Spark FLOOR
    // returns BIGINT while DuckDB's returns DOUBLE — cast pins the type.
    "agg_histogram" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy((floor(col("o_totalprice") / 20000) * 20000)
          .cast("long").as("bucket_lo"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("bucket_total"))
        .orderBy("bucket_lo")),

    // Boolean + bitwise aggregate families per event_type: bool_and/bool_or
    // and bit_and/bit_or/bit_xor are all order-independent (idempotent or
    // associative-commutative), so partial aggregation is exact under any
    // partitioning — trivially deterministic oracle candidates.
    "agg_bool_bit" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          bool_and(col("user_id") % 2 === 0).as("all_even"),
          bool_or(col("user_id") % 2 === 0).as("any_even"),
          bit_and(col("user_id")).as("uid_band"),
          bit_or(col("user_id")).as("uid_bor"),
          bit_xor(col("user_id")).as("uid_bxor"))
        .orderBy("event_type")),

    // Exact variance/stddev from order-independent sums: var_samp(double)
    // directly would fold partials in partition order (and DuckDB's own
    // var_samp differs from Spark's in the last ulps — measured), so the
    // moments are gathered as exact decimal sums (n, Σx, Σx²) and the
    // variance is ONE identical double expression on both engines:
    // (ss - s*s/n)/(n-1). Per-row x*x is a single IEEE multiply (exact and
    // engine-agnostic); the decimal Σ makes the cross-row part
    // partitioning-proof. Headroom: Σx² of quantities ≤ 50² per row keeps
    // the scaled int128 far below the 2^53 double-round limit even at sf10.
    "agg_var_exact" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          dsum(col("l_quantity")).as("s"),
          dsum(col("l_quantity") * col("l_quantity")).as("ss"))
        .select(col("l_returnflag"), col("n"),
          ((col("ss") - col("s") * col("s") / col("n")) / (col("n") - 1))
            .as("var_qty"),
          sqrt((col("ss") - col("s") * col("s") / col("n")) / (col("n") - 1))
            .as("stddev_qty"))
        .orderBy("l_returnflag")),

    "agg_collect" -> ((s, d) =>
      Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(array_join(sort_array(collect_set(col("n_name"))), ",")
          .as("nations"))
        .orderBy("r_name")),

    // Data-profiling one-pass summary (the pre-training data-quality
    // staple): row/distinct/null counts and extremes in a single
    // aggregation — at 100 TB this is one scan + partial aggregation, and
    // the two COUNT(DISTINCT)s share the expand. MIN/MAX of timestamps
    // select source values verbatim; the value total uses the exact
    // decimal-sum pattern.
    // Distribution drift report (round 12 cont.) — the train/serve skew
    // audit an ML pipeline runs between two data periods before trusting
    // a model or a mixture: split the event stream at its MEDIAN
    // timestamp (percentile_disc — element-SELECTING on integer micros,
    // so both engines pick the same source value), then per event_type
    // report each period's count, share, and the absolute share drift.
    // Determinism: every output is an integer count or ONE mirrored
    // double division/subtraction per row — there is no cross-type float
    // sum, so no summation-order hazard. Scale shape: the projected
    // 2-column stream is checkpointed and read once; the median and the
    // 1-row totals ride broadcasts back onto partial-aggregated rollups —
    // the fact stream never shuffles.
    "profile_drift" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), unix_micros(col("ts")).as("us"))
        .localCheckpoint()
      val med = ev.agg(
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY us)").as("med_us"))
      val per = ev.crossJoin(broadcast(med))
        .groupBy("event_type")
        .agg(sum(when(col("us") < col("med_us"), 1L).otherwise(0L))
            .cast("long").as("n_early"),
          sum(when(col("us") >= col("med_us"), 1L).otherwise(0L))
            .cast("long").as("n_late"))
      val tot = per.agg(sum("n_early").cast("long").as("tot_early"),
        sum("n_late").cast("long").as("tot_late"))
      val shareE = col("n_early").cast("double") /
        col("tot_early").cast("double")
      val shareL = col("n_late").cast("double") /
        col("tot_late").cast("double")
      per.crossJoin(broadcast(tot))
        .select(col("event_type"), col("n_early"), col("n_late"),
          shareE.as("share_early"), shareL.as("share_late"),
          abs(shareE - shareL).as("drift"))
        .orderBy("event_type")
    }),

    "profile_events" -> ((s, d) =>
      Tables.events(s, d)
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("user_id")).as("n_users"),
          countDistinct(col("event_type")).as("n_types"),
          (count(lit(1)) - count(col("props"))).as("null_props"),
          min(col("ts")).as("min_ts"),
          max(col("ts")).as("max_ts"),
          dsum(col("value")).as("total_value"))),

    // Robust outlier report (round 9) — the data-quality screen a
    // training pipeline runs over numeric features before trusting them:
    // per group, median and MAD (median absolute deviation — the robust
    // spread statistic that a few wild values cannot poison, unlike
    // stddev), and the count/extremes of values outside the standard
    // |x − median| > 3·MAD fence. Both statistics are percentile_disc —
    // element-SELECTING, so every compared number is a source value or an
    // exact double subtract/multiply of two (no interpolation, the
    // text_quality_filter discipline). Scale shape: two map-side
    // ObjectHashAggregate passes over the fact stream with the tiny
    // per-type statistics BROADCAST back between them — the events table
    // shuffles zero times, and the projected 2-column input is
    // localCheckpointed (cluster: `checkpoint`) so the fact file is READ
    // ONCE: the three downstream passes re-read the materialized blocks,
    // not the scan (ADVICE r9). The fence filter is a narrow map.
    "profile_outliers" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"), col("value"))
        .localCheckpoint()
      val med = ev.groupBy("event_type")
        .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)")
          .as("med"))
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("adev", abs(col("value") - col("med")))
      val mad = dev.groupBy("event_type")
        .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)")
          .as("mad"), count(lit(1)).as("n"))
      // conditional aggregation keeps EVERY type in the report (a clean
      // type shows n_outliers = 0 and NULL extremes on both engines)
      val out = col("adev") > col("mad") * 3.0
      dev.join(broadcast(mad), "event_type")
        .groupBy(col("event_type"), col("med"), col("mad"), col("n"))
        .agg(count(when(out, 1)).as("n_outliers"),
          min(when(out, col("value"))).as("min_outlier"),
          max(when(out, col("value"))).as("max_outlier"))
        .select(col("event_type"), col("n"), col("med"), col("mad"),
          col("n_outliers"),
          (col("n_outliers").cast("double") / col("n"))
            .as("outlier_frac"),
          col("min_outlier"), col("max_outlier"))
        .orderBy("event_type")
    }),

    // Key-skew diagnostic — the "will this key explode my shuffle" check
    // run before any big groupBy/join: per-key counts reduced to
    // max/avg/ratio. Exact-integer sums divided once keep the doubles
    // bit-identical cross-engine.
    "skew_report" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("user_id").agg(count(lit(1)).as("cnt"))
        .agg(count(lit(1)).as("n_keys"),
          max(col("cnt")).as("max_cnt"),
          (sum(col("cnt")).cast("double") / count(lit(1))).as("avg_cnt"),
          (max(col("cnt")) / (sum(col("cnt")).cast("double") / count(lit(1))))
            .as("skew_ratio"))),

    // ------------------------------------------------ B6 sort/limit/topk
    "sort_global" -> ((s, d) =>
      Tables.supplier(s, d)
        .select("s_suppkey", "s_nationkey", "s_acctbal")
        .orderBy(desc("s_nationkey"), asc("s_acctbal"), asc("s_suppkey"))),

    "topk" -> ((s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(10)),

    "limit_offset" -> ((s, d) =>
      Tables.customer(s, d)
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
        .offset(20).limit(10)),

    // Deterministic content-hash sampling — the reproducible alternative to
    // rand()/TABLESAMPLE: membership is a pure function of the key (first
    // md5 hex nibble ∈ {0,1} ⇒ a 2/16 = 12.5% expected draw), so the sample
    // is identical across runs, engines, partitionings, and cluster sizes,
    // and a row keeps its fate as the table grows. The filter is a per-row
    // map — no shuffle; at 100 TB it composes with any downstream agg. The
    // 64-bit xxhash64 variant (TextOps.hashSplit) is the faster in-engine
    // form; md5 is the cross-engine-oracle-able one.
    "sample_det" -> ((s, d) =>
      Tables.orders(s, d)
        .filter(substring(md5(col("o_orderkey").cast("string")), 1, 1)
          .isin("0", "1"))
        .select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
        .orderBy("o_orderkey")),

    // ------------------------------------------------ B7 set ops
    "set_union_all" -> ((s, d) => {
      val a = Tables.customer(s, d).select(col("c_nationkey").as("nk"))
      val b = Tables.supplier(s, d).select(col("s_nationkey").as("nk"))
      a.unionByName(b).groupBy("nk").agg(count(lit(1)).as("n"))
        .orderBy("nk")
    }),

    "set_union_distinct" -> ((s, d) => {
      val a = Tables.customer(s, d).select(col("c_nationkey").as("nk"))
      val b = Tables.supplier(s, d).select(col("s_nationkey").as("nk"))
      a.union(b).distinct().orderBy("nk")
    }),

    "set_intersect" -> ((s, d) => {
      val a = Tables.customer(s, d).filter(col("c_acctbal") > 5000)
        .select(col("c_nationkey").as("nk"))
      val b = Tables.supplier(s, d).filter(col("s_acctbal") > 5000)
        .select(col("s_nationkey").as("nk"))
      a.intersect(b).orderBy("nk")
    }),

    "set_except" -> ((s, d) => {
      val a = Tables.nation(s, d).select(col("n_nationkey").as("nk"))
      val b = Tables.customer(s, d).filter(col("c_acctbal") > 9900)
        .select(col("c_nationkey").as("nk"))
      a.except(b).orderBy("nk")
    }),

    "set_intersect_all" -> ((s, d) => {
      // multiset intersect: keeps min(multiplicity) copies per key
      val a = Tables.supplier(s, d).select(col("s_nationkey").as("nk"))
      val b = Tables.customer(s, d).filter(col("c_acctbal") > 5000)
        .select(col("c_nationkey").as("nk"))
      a.intersectAll(b).orderBy("nk")
    }),

    "set_except_all" -> ((s, d) => {
      val a = Tables.supplier(s, d).select(col("s_nationkey").as("nk"))
      val b = Tables.supplier(s, d).filter(col("s_acctbal") > 5000)
        .select(col("s_nationkey").as("nk"))
      a.exceptAll(b).orderBy("nk")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "filter_compound" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
        |FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag IN ('A','R')
        |  AND NOT (l_discount < 0.02) AND l_shipdate IS NOT NULL
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag""".stripMargin,

    "filter_like" ->
      """SELECT p_partkey, p_name, p_type FROM part
        |WHERE p_name LIKE '%bolt%' AND regexp_matches(p_brand, 'Brand#1[0-9]')
        |ORDER BY p_partkey""".stripMargin,

    "join_broadcast_inner" ->
      """SELECT c_custkey, c_name, n_name
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY c_custkey""".stripMargin,

    "join_shuffle_inner" ->
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
        |    AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderkey, o_orderpriority
        |ORDER BY o_orderkey""".stripMargin,

    // deliberately salt-free: the oracle is the PLAIN join, so equality
    // IS the proof that salting preserves join semantics exactly
    "join_skew_salted" ->
      """SELECT o_orderpriority, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
        |    AS DOUBLE) AS price_total
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // MERGE semantics stated directly (NOT IN + UNION ALL) — the Spark
    // side's broadcast-anti + union decomposition must reproduce it
    "merge_upsert" ->
      """WITH chg AS (
        |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |    o_totalprice * 2 AS o_totalprice, 'U' AS op
        |  FROM orders
        |  WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0','1')
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 'D'
        |  FROM orders
        |  WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '2'
        |  UNION ALL
        |  SELECT o_orderkey + 1000000000, o_custkey, 'N', o_totalprice, 'I'
        |  FROM orders
        |  WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '3')
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM chg)
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM chg WHERE op <> 'D'
        |ORDER BY o_orderkey""".stripMargin,

    // the same history replayed declaratively: window-rank to the latest
    // version per key, then MERGE semantics stated as NOT IN + UNION ALL
    "merge_view" ->
      """WITH lg AS (
        |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |    o_totalprice * 2 AS o_totalprice, 'U' AS op, 1 AS seq
        |  FROM orders
        |  WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, 'U', o_totalprice * 3, 'U', 2
        |  FROM orders
        |  WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, 'U', o_totalprice * 2, 'U', 1
        |  FROM orders
        |  WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '2'
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 'D', 2
        |  FROM orders
        |  WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '2'
        |  UNION ALL
        |  SELECT o_orderkey + 1000000000, o_custkey, 'N', o_totalprice,
        |    'I', 1
        |  FROM orders
        |  WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '3'),
        |latest AS (
        |  SELECT * FROM (SELECT *, row_number() OVER (
        |      PARTITION BY o_orderkey ORDER BY seq DESC) AS rn FROM lg)
        |  WHERE rn = 1)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM latest)
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM latest WHERE op <> 'D'
        |ORDER BY o_orderkey""".stripMargin,

    // UNPIVOT stated as UNION ALL — the relational definition the Expand
    // plan must reproduce
    "agg_unpivot" ->
      """WITH sup AS (SELECT s_nationkey AS nk, COUNT(*) AS n
        |  FROM supplier GROUP BY 1),
        |cus AS (SELECT c_nationkey AS nk, COUNT(*) AS n
        |  FROM customer GROUP BY 1),
        |wide AS (SELECT COALESCE(sup.nk, cus.nk) AS nk,
        |    COALESCE(sup.n, 0) AS n_suppliers,
        |    COALESCE(cus.n, 0) AS n_customers
        |  FROM sup FULL JOIN cus ON sup.nk = cus.nk)
        |SELECT nk, 'n_suppliers' AS metric, n_suppliers AS value FROM wide
        |UNION ALL
        |SELECT nk, 'n_customers', n_customers FROM wide
        |ORDER BY nk, metric""".stripMargin,

    "scd2_build" ->
      """WITH lg AS (
        |  SELECT o_orderkey, o_totalprice, 1 AS seq FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice * 2, 2 FROM orders
        |  WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0')
        |SELECT o_orderkey, o_totalprice,
        |  CAST(seq AS BIGINT) AS valid_from,
        |  CAST(lead(seq) OVER (PARTITION BY o_orderkey ORDER BY seq)
        |    AS BIGINT) AS valid_to,
        |  lead(seq) OVER (PARTITION BY o_orderkey ORDER BY seq) IS NULL
        |    AS is_current
        |FROM lg ORDER BY o_orderkey, valid_from""".stripMargin,

    "join_left_outer" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_big_orders,
        |  CAST(SUM(CAST(COALESCE(o_totalprice, 0) AS DECIMAL(18,4)))
        |    AS DOUBLE) AS big_total
        |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000) o
        |  ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "join_full_outer" ->
      """SELECT COALESCE(s.nk, c.nk) AS nk,
        |  COALESCE(n_suppliers, 0) AS n_suppliers,
        |  COALESCE(n_rich_customers, 0) AS n_rich_customers
        |FROM (SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1) s
        |FULL OUTER JOIN (SELECT c_nationkey AS nk, COUNT(*) AS n_rich_customers
        |  FROM customer WHERE c_acctbal > 9000 GROUP BY 1) c USING (nk)
        |ORDER BY nk""".stripMargin,

    "join_left_semi" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_partkey = p_partkey AND l_quantity >= 49)
        |ORDER BY p_partkey""".stripMargin,

    "join_left_anti" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_partkey = p_partkey AND l_shipdate >= TIMESTAMP '2001-01-01 00:00:00')
        |ORDER BY p_partkey""".stripMargin,

    "join_theta_range" ->
      """SELECT r.r_regionkey AS price_band, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS band_total
        |FROM orders o JOIN region r
        |  ON o.o_totalprice >= 50000.0 * r.r_regionkey
        | AND o.o_totalprice <  50000.0 * (r.r_regionkey + 1)
        |GROUP BY 1 ORDER BY price_band""".stripMargin,

    "join_cross" ->
      """SELECT a.r_name AS name_a, b.r_name AS name_b
        |FROM region a CROSS JOIN region b
        |ORDER BY name_a, name_b""".stripMargin,

    "join_asof" ->
      """SELECT c_custkey, user_id, asof_ts
        |FROM customer c LEFT JOIN (
        |  SELECT user_id, MAX(ts) AS asof_ts FROM events
        |  WHERE ts <= TIMESTAMP '2024-01-15 00:00:00' GROUP BY user_id) e
        |ON c_custkey % 1000 = e.user_id
        |ORDER BY c_custkey""".stripMargin,

    "join_interval" ->
      """SELECT p.p_event AS p_event, e.event_id AS nearby_event,
        |  e.event_type AS nearby_type
        |FROM events e JOIN (SELECT user_id AS p_user, event_id AS p_event, ts AS p_ts
        |  FROM events WHERE event_type = 'purchase') p
        |  ON e.user_id = p.p_user AND e.event_id <> p.p_event
        | AND e.ts BETWEEN p.p_ts - INTERVAL 5 MINUTE AND p.p_ts + INTERVAL 5 MINUTE
        |ORDER BY p_event, nearby_event""".stripMargin,

    "agg_basic" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1 - l_discount AS DECIMAL(6,4)) * CAST(1 + l_tax AS DECIMAL(6,4))) AS DECIMAL(18,6)) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "agg_corr" ->
      """WITH m AS (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  (n * sxy - sx * sy) /
        |    (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
        |    AS corr_qty_disc
        |FROM m ORDER BY l_returnflag""".stripMargin,

    "composite_rfm" ->
      """WITH per AS (
        |  SELECT o_custkey, MAX(o_orderdate) AS last_order,
        |    COUNT(*) AS frequency,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS monetary,
        |    CAST(epoch(MAX(o_orderdate)) AS BIGINT) AS rec
        |  FROM orders GROUP BY o_custkey),
        |th AS (SELECT
        |  quantile_disc(rec, 0.25) AS r25, quantile_disc(rec, 0.5) AS r50,
        |  quantile_disc(rec, 0.75) AS r75,
        |  quantile_disc(frequency, 0.25) AS f25, quantile_disc(frequency, 0.5) AS f50,
        |  quantile_disc(frequency, 0.75) AS f75,
        |  quantile_disc(monetary, 0.25) AS m25, quantile_disc(monetary, 0.5) AS m50,
        |  quantile_disc(monetary, 0.75) AS m75 FROM per)
        |SELECT o_custkey, last_order, frequency, monetary,
        |  1 + CAST(rec >= r25 AS INT) + CAST(rec >= r50 AS INT)
        |    + CAST(rec >= r75 AS INT) AS r_score,
        |  1 + CAST(frequency >= f25 AS INT) + CAST(frequency >= f50 AS INT)
        |    + CAST(frequency >= f75 AS INT) AS f_score,
        |  1 + CAST(monetary >= m25 AS INT) + CAST(monetary >= m50 AS INT)
        |    + CAST(monetary >= m75 AS INT) AS m_score
        |FROM per CROSS JOIN th ORDER BY o_custkey""".stripMargin,

    "agg_count_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "agg_listagg" ->
      """SELECT r_name,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |  COUNT(*) AS n_nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "agg_mode" ->
      // same struct-ordering workaround as agg_minmax_by: the window picks
      // the (n, value)-max row exactly like Spark's max_by struct key
      """WITH c AS (SELECT event_type, value, COUNT(*) AS n
        |  FROM events GROUP BY event_type, value),
        |r AS (SELECT event_type, value, n,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY n DESC, value DESC) AS rk
        |  FROM c)
        |SELECT event_type, value AS mode_value, n AS n_occurrences
        |FROM r WHERE rk = 1 ORDER BY event_type""".stripMargin,

    "agg_heavy_hitters" ->
      // exact regime ⇒ the sketch's estimates ARE the group counts; the
      // CAST keeps DuckDB's window-sum at BIGINT (it widens to HUGEINT)
      """SELECT o_orderstatus, o_orderpriority,
        |  COUNT(*) AS n_occurrences,
        |  CAST(sum(COUNT(*)) OVER (PARTITION BY o_orderstatus) AS BIGINT)
        |    AS n_orders,
        |  CAST(0 AS BIGINT) AS max_error
        |FROM orders GROUP BY o_orderstatus, o_orderpriority
        |ORDER BY o_orderstatus, n_occurrences DESC, o_orderpriority"""
        .stripMargin,

    "agg_minmax_by" ->
      // DuckDB 1.0's arg_max can't order by a struct; the window formulation
      // below has identical first-match-by-(price,key) semantics.
      """WITH ranked AS (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey DESC) AS rb,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice ASC, o_orderkey ASC) AS rw
        |  FROM orders)
        |SELECT o_custkey,
        |  MAX(CASE WHEN rb = 1 THEN o_orderkey END) AS best_order,
        |  MAX(CASE WHEN rw = 1 THEN o_orderkey END) AS worst_order
        |FROM ranked GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
        |  COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY region, nation""".stripMargin,

    "agg_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, returnflag, linestatus""".stripMargin,

    "composite_q3" ->
      """WITH r AS (
        |  SELECT o_orderkey, o_orderdate, o_orderpriority,
        |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
        |      AS DOUBLE) AS revenue
        |  FROM customer JOIN orders ON c_custkey = o_custkey
        |    JOIN lineitem ON l_orderkey = o_orderkey
        |  WHERE c_mktsegment = 'BUILDING'
        |    AND o_orderdate < TIMESTAMP '2000-06-01'
        |    AND l_shipdate > TIMESTAMP '2000-06-01'
        |  GROUP BY o_orderkey, o_orderdate, o_orderpriority)
        |SELECT * FROM r ORDER BY revenue DESC, o_orderkey LIMIT 20""".stripMargin,

    "agg_pivot" ->
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "agg_percentile" ->
      """SELECT l_returnflag,
        |  quantile_disc(l_quantity, 0.25) AS q25,
        |  quantile_disc(l_quantity, 0.5) AS median_qty,
        |  quantile_disc(l_quantity, 0.75) AS q75,
        |  quantile_disc(l_extendedprice, 0.95) AS p95_price,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_histogram" ->
      """SELECT CAST(floor(o_totalprice / 20000) * 20000 AS BIGINT) AS bucket_lo,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS bucket_total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "agg_bool_bit" ->
      """SELECT event_type,
        |  bool_and(user_id % 2 = 0) AS all_even,
        |  bool_or(user_id % 2 = 0) AS any_even,
        |  bit_and(user_id) AS uid_band,
        |  bit_or(user_id) AS uid_bor,
        |  bit_xor(user_id) AS uid_bxor
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "agg_var_exact" ->
      """WITH g AS (SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS s,
        |    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS ss
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  (ss - s * s / n) / (n - 1) AS var_qty,
        |  SQRT((ss - s * s / n) / (n - 1)) AS stddev_qty
        |FROM g ORDER BY l_returnflag""".stripMargin,

    "agg_collect" ->
      """SELECT r_name, array_to_string(list_sort(list(DISTINCT n_name)), ',') AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "sort_global" ->
      """SELECT s_suppkey, s_nationkey, s_acctbal FROM supplier
        |ORDER BY s_nationkey DESC, s_acctbal ASC, s_suppkey ASC""".stripMargin,

    "topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "limit_offset" ->
      """SELECT c_custkey, c_name FROM customer
        |ORDER BY c_custkey LIMIT 10 OFFSET 20""".stripMargin,

    "sample_det" ->
      """SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice
        |FROM orders
        |WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
        |ORDER BY o_orderkey""".stripMargin,

    // the MAD fence comparison and outlier_frac are exact double ops over
    // element-selected percentiles — bit-identical cross-engine
    "profile_outliers" ->
      """WITH med AS (SELECT event_type,
        |    quantile_disc(value, 0.5) AS med FROM events GROUP BY event_type),
        |dev AS (SELECT e.event_type, e.value, m.med,
        |    abs(e.value - m.med) AS adev
        |  FROM events e JOIN med m ON e.event_type = m.event_type),
        |mad AS (SELECT event_type, quantile_disc(adev, 0.5) AS mad,
        |    COUNT(*) AS n
        |  FROM dev GROUP BY event_type)
        |SELECT d.event_type, s.n, d.med, s.mad,
        |  COUNT(CASE WHEN d.adev > s.mad * 3.0 THEN 1 END) AS n_outliers,
        |  CAST(COUNT(CASE WHEN d.adev > s.mad * 3.0 THEN 1 END) AS DOUBLE)
        |    / s.n AS outlier_frac,
        |  MIN(CASE WHEN d.adev > s.mad * 3.0 THEN d.value END) AS min_outlier,
        |  MAX(CASE WHEN d.adev > s.mad * 3.0 THEN d.value END) AS max_outlier
        |FROM dev d JOIN mad s ON d.event_type = s.event_type
        |GROUP BY d.event_type, s.n, d.med, s.mad
        |ORDER BY d.event_type""".stripMargin,

    "profile_drift" ->
      """WITH ev AS (SELECT event_type, epoch_us(ts) AS us FROM events),
        |med AS (SELECT quantile_disc(us, 0.5) AS med_us FROM ev),
        |per AS (SELECT event_type,
        |    CAST(sum(CASE WHEN us < med_us THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_early,
        |    CAST(sum(CASE WHEN us >= med_us THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_late
        |  FROM ev CROSS JOIN med GROUP BY event_type),
        |tot AS (SELECT CAST(sum(n_early) AS BIGINT) AS tot_early,
        |    CAST(sum(n_late) AS BIGINT) AS tot_late FROM per)
        |SELECT event_type, n_early, n_late,
        |  CAST(n_early AS DOUBLE) / CAST(tot_early AS DOUBLE) AS share_early,
        |  CAST(n_late AS DOUBLE) / CAST(tot_late AS DOUBLE) AS share_late,
        |  abs(CAST(n_early AS DOUBLE) / CAST(tot_early AS DOUBLE)
        |    - CAST(n_late AS DOUBLE) / CAST(tot_late AS DOUBLE)) AS drift
        |FROM per CROSS JOIN tot ORDER BY event_type""".stripMargin,

    "profile_events" ->
      """SELECT COUNT(*) AS n_rows,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  COUNT(DISTINCT event_type) AS n_types,
        |  COUNT(*) - COUNT(props) AS null_props,
        |  MIN(ts) AS min_ts, MAX(ts) AS max_ts,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM events""".stripMargin,

    "skew_report" ->
      """WITH k AS (SELECT user_id, COUNT(*) AS cnt FROM events
        |  GROUP BY user_id)
        |SELECT COUNT(*) AS n_keys, MAX(cnt) AS max_cnt,
        |  CAST(SUM(cnt) AS DOUBLE) / COUNT(*) AS avg_cnt,
        |  MAX(cnt) / (CAST(SUM(cnt) AS DOUBLE) / COUNT(*)) AS skew_ratio
        |FROM k""".stripMargin,

    "set_union_all" ->
      """SELECT nk, COUNT(*) AS n FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION ALL SELECT s_nationkey FROM supplier)
        |GROUP BY nk ORDER BY nk""".stripMargin,

    "set_union_distinct" ->
      """SELECT c_nationkey AS nk FROM customer
        |UNION SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin,

    "set_intersect" ->
      """SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 5000
        |INTERSECT SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000
        |ORDER BY nk""".stripMargin,

    "set_except" ->
      """SELECT n_nationkey AS nk FROM nation
        |EXCEPT SELECT c_nationkey FROM customer WHERE c_acctbal > 9900
        |ORDER BY nk""".stripMargin,

    "set_intersect_all" ->
      """SELECT s_nationkey AS nk FROM supplier
        |INTERSECT ALL SELECT c_nationkey FROM customer WHERE c_acctbal > 5000
        |ORDER BY nk""".stripMargin,

    "set_except_all" ->
      """SELECT s_nationkey AS nk FROM supplier
        |EXCEPT ALL SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000
        |ORDER BY nk""".stripMargin
  )
}
