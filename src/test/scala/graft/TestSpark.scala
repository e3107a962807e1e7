package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (forked test JVM). */
object TestSpark {
  lazy val spark: SparkSession = Engine.localSession(4, "graft-test")

  /** Absolute path of a test resource directory. */
  def resourceDir(name: String): String =
    getClass.getClassLoader.getResource(name).getPath
}
