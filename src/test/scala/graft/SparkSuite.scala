package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** One local SparkSession per suite (lazy), UTC, small shuffle width. */
trait SparkSuite extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val sf0001 = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // keep the session for sibling suites in the same JVM (Test/fork=true
    // means one JVM per test run, so getOrCreate shares it)
    super.afterAll()
  }
}
