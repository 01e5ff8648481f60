package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole test run (sessions are
  * expensive; ScalaTest suites run sequentially in the forked JVM). */
object TestSpark {
  lazy val spark: SparkSession = Sessions.local("graft-test", 4)
}
