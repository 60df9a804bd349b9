package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** ONE-ROW SWEEP: every SparkEntry query executes against a dataset
  * where each of the ten tables holds exactly ONE row — the
  * zero-variance / empty-self-join / singular-system degenerate class
  * (EmptyCorpusSweepSpec's sibling). Spark 4's ANSI mode turns these
  * into hard failures (it throws on EVERY division by zero, doubles
  * included, and on NaN→integral casts), so "a statistic over a
  * one-row slice" must be explicitly defined everywhere: this sweep
  * found six in round 14 (q107/q159/q188/q211 zero-variance divides,
  * q240's zero-covariance power iteration, q242's singular leave-out
  * folds). Contract: no exception; degenerate statistics come back
  * NULL/NaN/0 per each query's documented convention. */
class OneRowSweepSpec extends AnyFunSuite with SparkSpecBase {
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_onerow").toString
    def w(name: String, schema: StructType, row: Row): Unit =
      spark.createDataFrame(java.util.List.of(row), schema)
        .coalesce(1).write.mode("overwrite").parquet(s"$d/$name.parquet")
    val ts = java.sql.Timestamp.valueOf("2024-01-10 10:00:00")
    w("region", StructType(Seq(StructField("r_regionkey", IntegerType), StructField("r_name", StringType))), Row(0, "AMERICA"))
    w("nation", StructType(Seq(StructField("n_nationkey", IntegerType), StructField("n_name", StringType), StructField("n_regionkey", IntegerType))), Row(0, "BRAZIL", 0))
    w("customer", StructType(Seq(StructField("c_custkey", LongType), StructField("c_name", StringType), StructField("c_nationkey", IntegerType), StructField("c_acctbal", DoubleType), StructField("c_mktsegment", StringType))), Row(1L, "c1", 0, 10.0, "BUILDING"))
    w("supplier", StructType(Seq(StructField("s_suppkey", LongType), StructField("s_name", StringType), StructField("s_nationkey", IntegerType), StructField("s_acctbal", DoubleType))), Row(1L, "s1", 0, 5.0))
    w("part", StructType(Seq(StructField("p_partkey", LongType), StructField("p_name", StringType), StructField("p_brand", StringType), StructField("p_type", StringType), StructField("p_size", IntegerType), StructField("p_retailprice", DoubleType))), Row(1L, "p1", "B1", "T1", 5, 100.0))
    w("orders", StructType(Seq(StructField("o_orderkey", LongType), StructField("o_custkey", LongType), StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType), StructField("o_orderdate", TimestampType), StructField("o_orderpriority", StringType))), Row(1L, 1L, "O", 100.0, ts, "1-URGENT"))
    w("lineitem", StructType(Seq(StructField("l_orderkey", LongType), StructField("l_partkey", LongType), StructField("l_suppkey", LongType), StructField("l_linenumber", IntegerType), StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType), StructField("l_discount", DoubleType), StructField("l_tax", DoubleType), StructField("l_returnflag", StringType), StructField("l_linestatus", StringType), StructField("l_shipdate", TimestampType))), Row(1L, 1L, 1L, 1, 10.0, 100.0, 0.05, 0.02, "N", "O", ts))
    w("events", StructType(Seq(StructField("event_id", LongType), StructField("ts", TimestampType), StructField("user_id", LongType), StructField("event_type", StringType), StructField("value", DoubleType), StructField("props", StringType))), Row(1L, ts, 1L, "view", 3.5, "{}"))
    w("documents", StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType), StructField("lang", StringType), StructField("source", StringType), StructField("n_chars", LongType))), Row(1L, "the quick brown fox jumps over the lazy dog", "en", "src0", 44L))
    w("embeddings", StructType(Seq(StructField("vec_id", LongType), StructField("embedding", ArrayType(FloatType)), StructField("label", IntegerType))), Row(0L, (0 until 64).map(i => 0.1f + 0.01f * i), 1))
    d
  }
  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name executes on a one-row dataset") {
      try fn(spark, dir).collect()
      finally { graft.ops.ScratchCache.releaseAll(); spark.catalog.clearCache() }
    }
  }
}
