package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one per JVM — Test/fork gives one). */
object SparkSuite {
  lazy val spark: SparkSession = GraftSession.get("4")
}

trait SparkSuite extends AnyFunSuite {
  def spark: SparkSession = SparkSuite.spark
  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"
}
