package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Arbitrary-function operator surface (SURVEY.md §2.B2 map-partitions
  * row / §2.B7): the rebuild of dask's `groupby(...).apply(f)` and
  * `delayed(f)` custom callables
  * (reference: SS/wukong/tests/test_collections.py:152-177).
  *
  * Three typed shapes, all of which keep Catalyst in charge of the
  * shuffle and only hand the *per-group / per-partition* work to Scala:
  *  - `groupByKey(...).mapGroups(f)` — apply-style: one imperative pass
  *    per group, state bounded by the group;
  *  - typed `Aggregator[IN, BUF, OUT]` — partial-aggregatable custom
  *    reduction (map-side combine preserved, unlike mapGroups);
  *  - `mapPartitions` — per-partition imperative logic (see
  *    graft.ml.Predict for the broadcast-model scoring use).
  */
object Apply {
  type Q = (SparkSession, String) => DataFrame

  /** groupby-apply: per customer, the second-highest order price, found
    * with one imperative scan per group (no per-group sort — O(n) state
    * of two values). Customers with a single order are dropped. */
  def secondHighestOrder(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapGroups { (cust, rows) =>
        // rank by (price desc, orderkey asc); track top-2 in one pass
        var best: (Double, Long) = null
        var second: (Double, Long) = null
        def beats(a: (Double, Long), b: (Double, Long)): Boolean =
          b == null || a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
        rows.foreach { case (_, key, price) =>
          val cand = (price, key)
          if (beats(cand, best)) { second = best; best = cand }
          else if (beats(cand, second)) second = cand
        }
        (cust, if (second == null) Double.NaN else second._1, second != null)
      }
      .filter(_._3)
      .map(t => (t._1, t._2))
      .toDF("o_custkey", "second_price")
  }

  /** Typed Aggregator (UDAF surface): exact per-priority spend stats in
    * the integer-cents domain. Unlike mapGroups, an Aggregator keeps
    * partial aggregation — the shuffle carries one (count, sum) pair per
    * priority per map partition, not the rows. */
  object SpendAgg extends Aggregator[(String, Long), (Long, Long), (Long, Long)] {
    def zero: (Long, Long) = (0L, 0L)
    def reduce(b: (Long, Long), a: (String, Long)): (Long, Long) = (b._1 + 1, b._2 + a._2)
    def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) = (x._1 + y._1, x._2 + y._2)
    def finish(r: (Long, Long)): (Long, Long) = r
    def bufferEncoder = Encoders.product[(Long, Long)]
    def outputEncoder = Encoders.product[(Long, Long)]
  }

  def typedSpendStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .select(col("o_orderpriority"),
              round(col("o_totalprice") * 100).cast("long").as("cents"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .agg(SpendAgg.toColumn.name("stats"))
      .map { case (prio, (n, sum)) => (prio, n, sum) }
      .toDF("o_orderpriority", "n_orders", "sum_cents")
  }

  /** Bag surface (dask `db.range(n).groupby(key)` — reference
    * SS/wukong/tests/test_collections.py:107-111): an unordered
    * collection built from a generator, grouped by an arbitrary Scala
    * key function with per-group imperative folds. Same Spark shape as
    * groupby-apply — `groupByKey` owns the shuffle, the fold sees one
    * group at a time — demonstrated here on a generated range rather
    * than a table. */
  def bagGroupby(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    s.range(100000L).as[Long]
      .groupByKey(_ % 7)
      .mapGroups { (k, it) =>
        var n = 0L; var sum = 0L; var mx = Long.MinValue
        it.foreach { v => n += 1; sum += v; if (v > mx) mx = v }
        (k, n, sum, mx)
      }
      .toDF("k", "n", "total", "max_v")
  }

  /** Bag foldby (dask `db.foldby(key, binop, initial, combine)` — the
    * combiner-based fold dask recommends over `groupby` precisely
    * because it pre-aggregates map-side): `aggregateByKey` keeps the
    * same property in Spark — each map partition folds its rows into
    * one (count, modular sum-of-squares) accumulator per key BEFORE the
    * shuffle, so only #keys×#partitions tiny pairs move. Modular
    * addition is associative+commutative, making the arbitrary binop
    * still exactly SQL-checkable: (Σv²) mod p == incremental mod. */
  def bagFoldby(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val P = 1000003L
    s.range(150000L).rdd.map(v => (v % 11, v))
      .aggregateByKey((0L, 0L))(
        { case ((n, m), v) => (n + 1, (m + (v * v) % P) % P) },
        { case ((n1, m1), (n2, m2)) => (n1 + n2, (m1 + m2) % P) })
      .map { case (k, (n, m)) => (k, n, m) }
      .toDF("k", "n_items", "sq_mod")
  }

  /** Typed COGROUP (the dask `align`-then-apply / pandas two-frame
    * combine shape): one arbitrary Scala function sees BOTH sides of a
    * key at once — here each customer's balance next to all their
    * orders, folded imperatively into spend totals and an over-budget
    * flag. Catalyst still owns the data movement: cogroup co-partitions
    * the two inputs on the key in one exchange each, and per-key state
    * is one running (count, sum) — no join materialization, no
    * wide row. Order rows for a key missing from customers (none in
    * TPC-H's referential fixture) drop explicitly, making the function
    * the LEFT-side semantics the oracle SQL states. */
  def cogroupSpend(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"), round(col("c_acctbal") * 100).cast("long").as("bal"))
      .as[(Long, Long)]
    val ords = Tables.orders(s, d)
      .select(col("o_custkey"), round(col("o_totalprice") * 100).cast("long").as("cents"))
      .as[(Long, Long)]
    cust.groupByKey(_._1).cogroup(ords.groupByKey(_._1)) { (k, cs, os) =>
      val bal = cs.map(_._2).toSeq.headOption    // 0 or 1 customer row per key
      var n = 0L; var spend = 0L
      os.foreach { o => n += 1; spend += o._2 }
      bal.iterator.map(b => (k, b, n, spend, if (spend > b) 1L else 0L))
    }.toDF("c_custkey", "bal_cents", "n_orders", "spend_cents", "over_budget")
  }

  /** Bag frequencies + topk (dask `db.frequencies()` then `.topk(10)` —
    * the remaining bag combinators after b01 groupby / b02 foldby):
    * `reduceByKey` keeps the count partial-aggregable (≤ |keys| pairs
    * leave each map partition), and topk is `takeOrdered` — per-
    * partition heaps, the driver sees exactly 10 rows, dask's own topk
    * contract. The knuth-hash key spread makes the counts non-trivial
    * while staying a pure closed form for the oracle. */
  def bagFrequencies(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val top = s.range(200000L).rdd
      .map(v => ((v * 2654435761L) % 997L, 1L))
      .reduceByKey(_ + _)
      .takeOrdered(10)(Ordering.by { case (k, n) => (-n, k) })
    top.zipWithIndex.map { case ((k, n), i) => (i + 1L, k, n) }
      .toSeq.toDF("rank", "k", "n")
  }

  val queries: Map[String, Q] = Map(
    "b03_bag_frequencies" -> (bagFrequencies _),
    "g01_groupby_apply" -> (secondHighestOrder _),
    "g02_typed_agg"     -> (typedSpendStats _),
    "g03_cogroup"       -> (cogroupSpend _),
    "b01_bag_groupby"   -> (bagGroupby _),
    "b02_bag_foldby"    -> (bagFoldby _),
  )

  val oracles: Map[String, String] = Map(
    // same closed-form key hash, count, and (n desc, k) top-10
    "b03_bag_frequencies" ->
      """WITH f AS (SELECT (r.range * 2654435761) % 997 AS k, count(*) AS n
                    FROM range(200000) r GROUP BY 1),
         t AS (SELECT k, n, CAST(row_number() OVER (ORDER BY n DESC, k)
                                 AS BIGINT) AS rank FROM f)
         SELECT rank, k, n FROM t WHERE rank <= 10""",
    "g01_groupby_apply" ->
      """SELECT o_custkey, o_totalprice AS second_price FROM (
           SELECT o_custkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) t
         WHERE rn = 2""",
    "g02_typed_agg" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
         FROM orders GROUP BY o_orderpriority""",
    // the cogroup fold restated as a left join + group-by
    "g03_cogroup" ->
      """SELECT c_custkey,
                CAST(round(c_acctbal*100) AS BIGINT) AS bal_cents,
                count(o_custkey) AS n_orders,
                CAST(coalesce(sum(CAST(round(o_totalprice*100) AS BIGINT)), 0) AS BIGINT)
                  AS spend_cents,
                CAST(CASE WHEN coalesce(sum(CAST(round(o_totalprice*100) AS BIGINT)), 0)
                            > CAST(round(c_acctbal*100) AS BIGINT)
                     THEN 1 ELSE 0 END AS BIGINT) AS over_budget
         FROM customer LEFT JOIN orders ON o_custkey = c_custkey
         GROUP BY 1, 2""",
    "b01_bag_groupby" ->
      """SELECT range % 7 AS k, count(*) AS n,
                CAST(sum(range) AS BIGINT) AS total, max(range) AS max_v
         FROM range(100000) GROUP BY 1""",
    // sum(v²) stays < 2^53 so the exact sum's residue equals the
    // incremental modular fold
    "b02_bag_foldby" ->
      """SELECT range % 11 AS k, count(*) AS n_items,
                CAST(sum(range * range) % 1000003 AS BIGINT) AS sq_mod
         FROM range(150000) GROUP BY 1""",
  )
}
