package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared session for the whole test run (Spark boot is ~5s;
  * per-suite sessions would dominate test time). */
object TestSession {
  lazy val spark: SparkSession = Sessions.local("graft-test", cpus = 4)
  val sfDir = "/root/testdata/sf0.001"
  val sfDir01 = "/root/testdata/sf0.01"
}

abstract class SparkSpecBase extends AnyFunSuite {
  def spark: SparkSession = TestSession.spark
  def sfDir: String = TestSession.sfDir
}
