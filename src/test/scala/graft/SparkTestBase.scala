package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs. */
trait SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkTestBase.session

  override def afterAll(): Unit = super.afterAll()
}

object SparkTestBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      // Every action serializes its plan string for the listener bus
      // (SQLExecution.explainString). Deep iterative test plans (the
      // property-check fixpoints) can render to 100s of MB each; with
      // 50 suites sharing one 8g fork, an uncapped render OOMed the
      // whole suite (round 14). Listener strings are diagnostics, not
      // semantics — cap them. Plan ASSERTIONS are unaffected:
      // PlanAuditSpec reads executedPlan.toString, which does not go
      // through this conf.
      .config("spark.sql.maxPlanStringLength", (4 * 1024 * 1024).toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
