package graft.core

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory so Verify / Bench / tests share one
  * scale-aware configuration.
  *
  *  - shuffle.partitions defaults to the local core count (32 on the
  *    harness); on a real cluster AQE coalesces post-shuffle partitions
  *    anyway (`spark.sql.adaptive.enabled=true`).
  *  - AQE on: runtime re-planning (skew joins, dynamic coalescing) is
  *    the 100 TB insurance policy for every shuffle in this library.
  *  - `parquet.nanosAsLong`: the driver's `events` table carries
  *    TIMESTAMP(NANOS) which Spark's vectorized reader refuses; we read
  *    it as long and convert in Tables.events.
  */
object GraftSession {
  def builder(master: String, cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(graft.plans.GraftExtensions.register)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // static conf, default 100: the ~92-entry gate generates >100
      // distinct codegen classes, so by the time Bench re-runs an entry
      // its class was evicted and Janino recompiles (~1-9 s first-rep tail
      // on a12/e04/ml04 — BENCH_NOTES.md). 2000 entries ≈ tens of MB of
      // class metadata, far below heap; eviction noise disappears.
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      // RDD-side block algebra (DMatrix multiply/tsqr) shuffles 8-80 MB
      // double-array payloads; Java serialization moves them at a few
      // hundred MB/s and dominated the flagship GEMM wall time. Kryo
      // writes primitive arrays at memcpy speed. DataFrame paths are
      // unaffected (Tungsten rows have their own serializer).
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.kryoserializer.buffer.max", "256m")
      // tmpfs scratch for shuffle/spill when available: the flagship
      // GEMM writes ~2 GB compressed shuffle per pass, and /tmp's
      // virtio disk stalled shuffle writes for minutes under load
      // (measured 6 MB/s/task); worst case here is a few GB against
      // 126 GB of tmpfs. On a real cluster this maps to the standard
      // local-SSD spark.local.dir provisioning.
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-scratch"
        else System.getProperty("java.io.tmpdir"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")

  /** Breeze/netlib static initialization is forced once, single-threaded,
    * before any parallel linalg tasks: 32 tasks racing the netlib
    * InstanceBuilder class init intermittently deadlocked treeAggregate
    * stages in local mode. */
  lazy val breezeWarm: Unit = {
    import breeze.linalg.{DenseMatrix, qr, svd, cholesky}
    val m = DenseMatrix.tabulate(4, 3)((i, j) => (i * 3 + j + 1).toDouble)
    qr.reduced(m); svd.reduced(m)
    cholesky(m.t * m + DenseMatrix.eye[Double](3) * 100.0)
    ()
  }

  /** Best-effort reaper for crash debris in the tmpfs scratch dir:
    * Spark removes its blockmgr/spark-* dirs on clean shutdown, but a
    * killed JVM leaves them pinned in RAM (tmpfs). Only entries older
    * than 3 h are touched — far beyond any single run here, so a
    * concurrently-running JVM's scratch is never swept. */
  private def sweepStaleScratch(root: java.io.File): Unit =
    try {
      val cutoff = System.currentTimeMillis() - 3L * 3600 * 1000
      Option(root.listFiles()).getOrElse(Array.empty)
        .filter(_.lastModified() < cutoff)
        .foreach { d =>
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
            f.delete(): Unit
          }
          rm(d)
        }
    } catch { case _: Exception => () }

  /** Local session sized from SPARK_GRAFT_CPUS (default 32, matching the
    * harness). */
  def local(): SparkSession = {
    sweepStaleScratch(new java.io.File("/dev/shm/graft-scratch"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = builder(s"local[$cpus]", cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    breezeWarm
    s
  }
}
