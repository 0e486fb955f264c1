ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "wukongspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  // netlib's VectorBLAS (SIMD DGEMM — ~2× Java11BLAS on this box) only
  // loads when the incubator vector module is present; Spark's own
  // mllib BLAS uses the same dispatch.
  "--add-modules=jdk.incubator.vector",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 24g default: local[32] runs 32 concurrent tasks plus pinned /
  // checkpointed blocks in ONE JVM; at 8g the bench spent multi-second
  // stretches in GC under the full 59-query run (machine has 125g).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // pre-commit the heap: the flagship GEMM allocates ~30 GB/min of block
  // arrays, and growing the heap from the 1 GB default under that
  // pressure spent 3× longer in GC than the steady state.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // NOTE: -XX:+AlwaysPreTouch was tried here (to move first-touch page
  // zeroing out of the first timed stage) and REJECTED by measurement:
  // with a 48 g heap + ParallelGC adaptive generation resizing it put the
  // JVM into a kernel page-zeroing storm (~10,000 CPU-s of system time,
  // first stage stalled for minutes, jstack attach unresponsive). The
  // first-rep outlier it targeted is seconds, the cure was minutes.
  // Throughput collector: the block-matrix paths allocate tens of GB/min
  // of short-lived 8-32 MB double[]s (G1 "humongous" churn — measured 85%
  // GC time on the flagship GEMM's first pass); ParallelGC compacts young
  // gen at memcpy speed and has no humongous-object path.
  "-XX:+UseParallelGC",
  // half the heap as young gen: block-algebra stages stream GBs of
  // short-lived 8-32 MB arrays, and the adaptive default starts young
  // small enough that a cold run promotes them all (then pays major
  // collections for objects that were about to die).
  "-XX:NewRatio=1",
  // Pin generation sizes: with Xms=Xmx and NewRatio set, ParallelGC's
  // adaptive size policy has nothing useful left to decide, and on this
  // virtualized host its uncommit/recommit cycles are actively harmful —
  // measured on the 20k² GEMM probe: RES oscillating 30 GB → 18 GB
  // mid-collection with 23 GC threads pinned in kernel page management
  // and a young pause logged at 186 s (fresh-page faults on this VM run
  // ~170 MB/s under co-tenant load, so every uncommitted-then-reused
  // page is re-zeroed at that rate). Fixed sizes fault each page once.
  "-XX:-UseAdaptiveSizePolicy",
) ++ sys.env.get("SPARK_GRAFT_JVM_OPTS").toSeq.flatMap(_.split(' ').filter(_.nonEmpty))
// SPARK_GRAFT_JVM_OPTS: extra per-run JVM flags (GC logging, NewRatio
// overrides) for probes — appended last so they win.
