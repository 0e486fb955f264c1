package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pins the float-log floor discipline (t46/t53/t54/t56/ml17): those
  * entries floor `c · ln(r) · 1e9` (or 1e6) terms to integers before
  * summing, relying on Spark's and DuckDB's libm `ln` agreeing to the
  * last ulp AT THE FLOOR BOUNDARY. That holds unless a term sits so
  * close to an integer that a 1-ulp `ln` disagreement flips the floor.
  *
  * This spec recomputes every floored term on the gate fixtures
  * (sf0.001 and the driver's sf0.01) token-for-token and asserts each
  * sits ≥1e3 × its log-sensitivity from the nearest integer — where
  * sensitivity = Σ |coefficient_i| · ulp(ln_i), the worst movement a
  * last-ulp libm disagreement could cause, with three decimal orders of
  * safety on top. Terms with zero sensitivity (coefficient exactly 0,
  * or ln(1) = 0 exactly) are engine-exact by IEEE semantics and exempt.
  */
class FloorMarginSpec extends SparkSpec {

  // ulp of the ln result; ln(1) = 0 exactly is a REQUIRED identity in
  // every conforming libm, so a zero log has zero disagreement room
  private val ulpU = udf((x: Double) => if (x == 0.0) 0.0 else math.ulp(x))
  private val distIntU = udf((m: Double) => {
    val f = m - math.floor(m); math.min(f, 1.0 - f)
  })

  /** Assert no floored term in `df` (columns `m` = the pre-floor double,
    * `sens` = Σ|coef|·ulp(ln)) is within 1e3 sensitivities of a floor
    * boundary. */
  private def checkMargins(df: DataFrame, what: String): Unit = {
    val terms = df.select(col("m"), col("sens"),
      distIntU(col("m")).as("margin")).cache()
    val n = terms.count()
    assert(n > 0, s"$what produced no terms — fixture mismatch?")
    val atRisk = terms.filter(col("sens") > 0.0 &&
      col("margin") < lit(1000.0) * col("sens"))
    val bad = atRisk.limit(5).collect()
    assert(bad.isEmpty,
      s"$what: ${bad.length}+ of $n floored terms sit <1e3 log-ulps from a " +
      s"floor boundary: ${bad.map(r => s"m=${r.getDouble(0)} sens=${r.getDouble(1)}").mkString("; ")}")
    terms.unpersist()
  }

  private def tokens(s: SparkSession, d: String) =
    TextSim.spread(Tables.documents(s, d))
      .select(col("doc_id"), col("lang"),
        explode(TextSim.words(col("text"))).as("tok"))
      .filter(col("tok") =!= "")

  // --- the five term pipelines, mirrored from the entries with the
  // --- floor() replaced by (m, sens) extraction

  private def t46Terms(s: SparkSession, d: String): DataFrame = {
    val tk = tokens(s, d)
    val g = tk.groupBy(col("tok")).agg(count(lit(1)).as("gcnt"))
    val gt = g.agg(sum(col("gcnt")).cast("long").as("gtot"))
    val l = tk.groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("lcnt"))
    val lt = l.groupBy(col("lang")).agg(sum(col("lcnt")).cast("long").as("ltot"))
    val p = coalesce(col("lcnt"), lit(0L)).cast("double") / col("ltot").cast("double")
    val q = col("gcnt").cast("double") / col("gtot").cast("double")
    val mm = (p + q) / lit(2.0)
    val term = when(col("lcnt").isNotNull,
        lit(0.5) * p * log(p / mm) + lit(0.5) * q * log(q / mm))
      .otherwise(lit(0.5) * q * log(q / mm))
    val sens = when(col("lcnt").isNotNull,
        lit(0.5) * p * ulpU(log(p / mm)) + lit(0.5) * q * ulpU(log(q / mm)))
      .otherwise(lit(0.5) * q * ulpU(log(q / mm)))
    g.crossJoin(broadcast(gt)).crossJoin(broadcast(lt))
      .join(l, Seq("lang", "tok"), "left")
      .select((term * lit(1.0e9)).as("m"), (sens * lit(1.0e9)).as("sens"))
  }

  private def t53Terms(s: SparkSession, d: String): DataFrame = {
    val tf = tokens(s, d)
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val totals = tf.groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n"), count(lit(1)).as("n_types"))
    val p = col("tf").cast("double") / col("n").cast("double")
    tf.join(totals, "doc_id")
      .select((-p * log(p) * lit(1.0e9)).as("m"),
              (p * ulpU(log(p)) * lit(1.0e9)).as("sens"))
  }

  private def t54Terms(s: SparkSession, d: String): DataFrame = {
    val B = 128L
    val tok = tokens(s, d)
      .select(col("doc_id"),
        (conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long") % B).as("b"))
    val isTgt = col("doc_id") % 5 === 0
    val totals = tok.agg(count(lit(1)).as("tr"), count(when(isTgt, 1)).as("tt"))
    val ratio = ((col("ct") + 1L) * (col("tr") + B)).cast("double") /
                ((col("cr") + 1L) * (col("tt") + B)).cast("double")
    tok.groupBy(col("b"))
      .agg(count(lit(1)).as("cr"), count(when(isTgt, 1)).as("ct"))
      .crossJoin(broadcast(totals))
      .select((log(ratio) * lit(1.0e9)).as("m"),
              (ulpU(log(ratio)) * lit(1.0e9)).as("sens"))
  }

  private def t56Terms(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = tokens(s, d)
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val ranked = counts.orderBy(col("cnt").desc, col("tok")).limit(100)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("tok"))).cast("long"))
    ranked.select((log(col("rank").cast("double")) * lit(1.0e6)).as("m"),
                  (ulpU(log(col("rank").cast("double"))) * lit(1.0e6)).as("sens"))
      .unionByName(
        ranked.select((log(col("cnt").cast("double")) * lit(1.0e6)).as("m"),
                      (ulpU(log(col("cnt").cast("double"))) * lit(1.0e6)).as("sens")))
  }

  private def ml17Terms(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d).select(
      col("o_orderpriority").as("prio"),
      expr("cast(round(o_totalprice * 100) as bigint) div 100000").as("bucket"),
      when(year(col("o_orderdate").cast("date")) <= 1995, "a").otherwise("b").as("period"))
    val cnt = base.groupBy(col("prio"), col("bucket"))
      .agg(sum(when(col("period") === "a", 1L).otherwise(0L)).as("ca"),
           sum(when(col("period") === "b", 1L).otherwise(0L)).as("cb"))
    val tot = cnt.groupBy(col("prio"))
      .agg(sum(col("ca")).as("ta"), sum(col("cb")).as("tb"))
    val p = col("ca").cast("double") / col("ta").cast("double")
    val q = col("cb").cast("double") / col("tb").cast("double")
    cnt.join(broadcast(tot), "prio")
      .filter(col("ca") > 0 && col("cb") > 0)
      .select(((p - q) * log(p / q) * lit(1.0e9)).as("m"),
              (abs(p - q) * ulpU(log(p / q)) * lit(1.0e9)).as("sens"))
  }

  private val gateDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .filter(d => new java.io.File(d).isDirectory)

  test("t46 JSD floor-nano terms sit >=1e3 log-ulps from every floor boundary") {
    gateDirs.foreach(d => checkMargins(t46Terms(spark, d), s"t46 @ $d"))
  }
  test("t53 entropy floor-nano terms sit >=1e3 log-ulps from every floor boundary") {
    gateDirs.foreach(d => checkMargins(t53Terms(spark, d), s"t53 @ $d"))
  }
  test("t54 DSIR floor-nano scores sit >=1e3 log-ulps from every floor boundary") {
    gateDirs.foreach(d => checkMargins(t54Terms(spark, d), s"t54 @ $d"))
  }
  test("t56 Zipf floor-micro logs sit >=1e3 log-ulps from every floor boundary") {
    gateDirs.foreach(d => checkMargins(t56Terms(spark, d), s"t56 @ $d"))
  }
  test("ml17 PSI floor-nano terms sit >=1e3 log-ulps from every floor boundary") {
    gateDirs.foreach(d => checkMargins(ml17Terms(spark, d), s"ml17 @ $d"))
  }
}
