package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the query layer.
  *
  * Oracle-parity rules (driver compares our parquet output against DuckDB
  * running `SparkEntry.oracleSql` on the same tables):
  *  - double aggregation order is engine-dependent -> cast source doubles to
  *    DECIMAL first, aggregate exactly, cast the final result back to double;
  *  - averages are computed as exact-decimal-sum / count in double;
  *  - every query ends with an explicit deterministic ORDER BY mirrored in
  *    the oracle SQL (ties broken by a unique key);
  *  - DuckDB sum(BIGINT) returns HUGEINT -> oracles cast to BIGINT.
  */
object T {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Exact money/quantity arithmetic: double -> DECIMAL(18,2). */
  def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Final projection back to double for schema parity with DuckDB. */
  def dbl(c: Column): Column = c.cast("double")

  /** sum over exact decimals, emitted as double. */
  def dsum(c: Column): Column = dbl(sum(dec(c)))
}
