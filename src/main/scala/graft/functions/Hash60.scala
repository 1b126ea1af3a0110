package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `hash60(str)` — the top 60 bits of md5(utf8(str)) as a non-negative LONG.
  *
  * Numerically identical to `CAST(conv(substring(md5(s),1,15),16,10) AS
  * BIGINT)` (the form the DuckDB oracles use: first 15 hex chars = top 60
  * bits of the first 8 digest bytes) but computed straight from the digest
  * bytes — no hex string, no substring, no base-conversion parse. Codegen'd
  * (participates in whole-stage codegen) — this is the hot hash inside
  * MinHash/SimHash/fingerprint operators.
  */
final case class Hash60(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hash60"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hash60 expects STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    Hash60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}

object Hash60 {
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** top 60 bits of md5, i.e. big-endian first 8 bytes >>> 4. */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }

  def hash60(c: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      Hash60(org.apache.spark.sql.graft.ColumnShim.expression(c)))

  /** register for SQL + expr() use: hash60(str) */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hash60", exprs => Hash60(exprs.head), "scala_udf")
}
