package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table access + the operator-registration shape shared by all
  * operator modules. Each entry: (name, spark impl, optional DuckDB oracle
  * SQL over the same parquet tables). Column names/aliases must match the
  * oracle exactly (the driver sorts columns by name before hashing). */
object Tables {
  def ld(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}

final case class OpQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
