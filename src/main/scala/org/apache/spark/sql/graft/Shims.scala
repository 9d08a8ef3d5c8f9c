package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.catalog.CatalogTable
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.connector.catalog.{Table, V1Table}

/** The two `private[sql]` seams the SQL-DML face needs, re-exported from
  * inside the `org.apache.spark.sql` package (the standard extension
  * technique — Spark's own connectors ship the same kind of shim file).
  * Nothing here adds behavior: `ofRows` is how every Spark command turns
  * a captured [[LogicalPlan]] back into a DataFrame, and [[v1Table]]
  * unwraps the `V1Table` envelope the session catalog hands to v2 code
  * paths (DELETE/UPDATE/MERGE resolution) for v1-provider tables. */
object Shims {

  /** `Dataset.ofRows` — LogicalPlan → DataFrame on the given session. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  /** The wrapped [[CatalogTable]] when `table` is the session catalog's
    * v1 envelope; None for genuine v2 tables. */
  def v1Table(table: Table): Option[CatalogTable] = table match {
    case v1: V1Table => Some(v1.v1Table)
    case _ => None
  }
}
