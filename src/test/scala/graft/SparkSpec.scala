package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared test session: one small local SparkSession per suite run.
  * sf0.001 testdata keeps suites fast (~6k lineitem rows). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  val sfDir = "/root/testdata/sf0.001"
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = graft.core.GraftSession.builder("local[4]", "4").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    // same single-threaded netlib class init the bench/verify sessions
    // get — parallel linalg tasks racing the netlib InstanceBuilder
    // static init intermittently deadlocked local-mode stages.
    graft.core.GraftSession.breezeWarm
    s
  }
}
