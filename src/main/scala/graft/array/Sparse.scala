package graft.array

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sparse matrix payloads (reference ships scipy.sparse protocol handlers
  * — SS/wukong/protocol/sparse.py, tests/test_collections.py:179).
  *
  * The Spark-native sparse representation is the COO `(i, j, v)`
  * DataFrame, not a port of CSR blocks: shuffles then move only present
  * cells, the sparse kernels ARE relational operators (equi-join on the
  * contracted index + hash aggregation), and Catalyst prunes columns /
  * pushes filters into the scan like any other plan. Cost is O(aligned
  * nnz pairs) — nothing ever densifies, so a 100 TB sparse corpus flows
  * through the same plan shape as the sf fixtures.
  */
object Sparse {

  /** Sparse×sparse matmul over COO frames: join A's column index to B's
    * row index, hash-agg partial products per output cell (map-side
    * combine). Output contains only cells with ≥1 contributing pair —
    * true sparse semantics. */
  def spmm(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("i").as("ai"), col("j").as("k"), col("v").as("av"))
      .join(b.select(col("i").as("bk"), col("j").as("bj"), col("v").as("bv")),
            col("k") === col("bk"))
      .groupBy(col("ai").as("i"), col("bj").as("j"))
      .agg(sum(col("av") * col("bv")).as("v"))

  /** Sparse matrix × sparse vector: `x` is a COO vector frame (i, v).
    * The vector side is typically small → Catalyst broadcasts it and the
    * kernel is a map-side hash join + one aggregation. */
  def spmv(a: DataFrame, x: DataFrame): DataFrame =
    a.join(x.select(col("i").as("k"), col("v").as("xv")), col("j") === col("k"))
      .groupBy(col("i")).agg(sum(col("v") * col("xv")).as("v"))

  /** Sparse transpose / scalar scale — trivial projections, listed for
    * surface completeness. */
  def transpose(a: DataFrame): DataFrame =
    a.select(col("j").as("i"), col("i").as("j"), col("v"))
  def scale(a: DataFrame, s: Double): DataFrame =
    a.select(col("i"), col("j"), (col("v") * s).as("v"))

  /** COO → blocked dense [[DMatrix]] (the scipy `.toarray()` analog,
    * distributed): cells shuffle once on their block key and each block
    * materializes from its own group. Per-group state is bounded by
    * bs² cells, so the groupByKey holds one block's worth at a time. */
  def toDense(coords: DataFrame, m: Long, n: Long, bs: Int): DMatrix = {
    val spark = coords.sparkSession
    import spark.implicits._
    val blocks = coords
      .select(col("i").cast("long"), col("j").cast("long"), col("v").cast("double"))
      .as[(Long, Long, Double)].rdd
      .map { case (i, j, v) => (((i / bs).toInt, (j / bs).toInt), (i, j, v)) }
      .groupByKey()
      .map { case ((bi, bj), cells) =>
        val rows = DMatrix.blockDim(m, bs, bi)
        val cols = DMatrix.blockDim(n, bs, bj)
        val data = new Array[Double](rows * cols)
        cells.foreach { case (i, j, v) =>
          data(((i - bi.toLong * bs) + (j - bj.toLong * bs) * rows).toInt) = v
        }
        Block(bi, bj, rows, cols, data)
      }
    new DMatrix(spark.createDataset(blocks), m, n, bs)
  }
}
