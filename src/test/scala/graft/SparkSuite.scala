package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared lazy session (one per suite JVM — build.sbt forks tests). */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(cpus = 4, appName = "graft-test")
  lazy val sf: String = "/root/testdata/sf0.001"
}
