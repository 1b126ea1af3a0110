package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 removed the public `Column.expr`
  * (Connect refactor); the classic converters are private[sql], so this
  * one-file shim lives in the org.apache.spark.sql namespace — the standard
  * pattern for Spark extension libraries. */
object ColumnShim {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}

/** RDD[InternalRow] ⇄ DataFrame bridge (private[sql] in Spark 4's classic
  * session) — lets the decode hot path emit catalyst rows directly
  * (UTF8String slices of the wire buffer, no java.lang.String round-trip,
  * no Row→InternalRow encoder pass). */
object InternalDf {
  def create(
      spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  def toRdd(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.toRdd
}
