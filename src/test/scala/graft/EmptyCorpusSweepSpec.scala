package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

/** EMPTY-CORPUS SWEEP: every SparkEntry query executes against a
  * dataset where ALL ten tables exist but hold zero rows, and must not
  * throw. This is the degenerate class that has produced a finding in
  * every recent round — q176's zero-arg greatest(), the training
  * loops' divide-by-zero CTEs, q245's reps(-1) — each found one query
  * at a time; this sweep closes the whole class at once. The contract
  * is NOT zero output rows (literal-driven and store-backed queries
  * may legitimately emit rows from an empty corpus); it is "no
  * exception, and the collect returns" — the property a 100 TB
  * pipeline needs when a filter chain or a partition slice comes back
  * empty mid-run. */
class EmptyCorpusSweepSpec extends AnyFunSuite with SparkSpecBase {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_all").toString
    def write(name: String, schema: StructType): Unit =
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")
    write("region", StructType(Seq(
      StructField("r_regionkey", IntegerType), StructField("r_name", StringType))))
    write("nation", StructType(Seq(
      StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType))))
    write("customer", StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType), StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType))))
    write("supplier", StructType(Seq(
      StructField("s_suppkey", LongType), StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType), StructField("s_acctbal", DoubleType))))
    write("part", StructType(Seq(
      StructField("p_partkey", LongType), StructField("p_name", StringType),
      StructField("p_brand", StringType), StructField("p_type", StringType),
      StructField("p_size", IntegerType), StructField("p_retailprice", DoubleType))))
    write("orders", StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType), StructField("o_orderpriority", StringType))))
    write("lineitem", StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType), StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType), StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType), StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampType))))
    write("events", StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType))))
    write("documents", StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType))))
    write("embeddings", StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType))))
    dir
  }

  // one test per query so a failure names its query directly and the
  // rest of the sweep still runs
  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name executes on an all-empty dataset") {
      try fn(spark, emptyDir).collect()
      finally {
        graft.ops.ScratchCache.releaseAll()
        spark.catalog.clearCache()
      }
    }
  }
}
