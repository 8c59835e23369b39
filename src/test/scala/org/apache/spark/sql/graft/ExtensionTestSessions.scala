package org.apache.spark.sql.graft

import org.apache.spark.SparkContext
import org.apache.spark.sql.SparkSessionExtensions

/** Test-side factory for a sibling session (same SparkContext, fresh
  * SessionState) built WITH the graft extensions: parser injection only
  * happens at session construction, and the shared fixture session is
  * already running by the time extension specs execute. Lives under the
  * sql namespace because the classic SparkSession constructor is
  * private[sql]. */
object ExtensionTestSessions {
  def withGraftExtensions(sc: SparkContext)
      : org.apache.spark.sql.classic.SparkSession = {
    // the public compat constructor applies extensions from the
    // CONTEXT conf; the primary 6-arg constructor is class-private
    sc.conf.set("spark.sql.extensions",
      "org.apache.spark.sql.graft.GraftExtensions")
    new org.apache.spark.sql.classic.SparkSession(
      sc, new java.util.HashMap[String, String]())
  }
}
