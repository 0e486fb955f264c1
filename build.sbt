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
)
