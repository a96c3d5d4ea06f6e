package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM-wide session — specs
  * run in a single forked JVM, see build.sbt).
  */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local(cores = 4, shufflePartitions = 8)
  val sfDir = "/root/testdata/sf0.001"
}

abstract class GraftSpec extends AnyFunSuite {
  def spark: SparkSession = TestSpark.spark
  def sfDir: String = TestSpark.sfDir
}
