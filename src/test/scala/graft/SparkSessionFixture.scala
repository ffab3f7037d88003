package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.{BeforeAndAfterAll, Suite}

/** Shared local SparkSession for all suites (one JVM-wide session — Spark
  * reuses it via getOrCreate, so suites don't pay repeated boot cost).
  */
trait SparkSessionFixture extends BeforeAndAfterAll { self: Suite =>
  lazy val spark: SparkSession = SparkSessionFixture.session

  val Sf0001 = "/root/testdata/sf0.001"
  val Sf001 = "/root/testdata/sf0.01"
}

object SparkSessionFixture {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the engine's session-extension point (graft_dot SQL function +
      // DotProductRewrite optimizer rule), exercised by ExtensionsSpec
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
