package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pipeline guardrails: declarative data-quality constraints and snapshot
  * diffing — the two operational ops a continuously rebuilt corpus needs
  * (validate every build; explain what changed between builds).
  *
  * Scale notes: every constraint is an ALGEBRAIC aggregate (one shared
  * scan per table, map-side combined, a handful of scalar results), except
  * key-uniqueness/FK-orphans which are one hash aggregation / one
  * anti-join each — never a sort, never driver-material beyond the report
  * rows. Snapshot diff is a single full-outer hash join on the key with
  * content hashes compared in place.
  */
object Audit {

  /** A named check producing (metric value, pass flag) from one scan. */
  final case class Check(name: String, metric: Column, pass: Column)

  /** Run checks that are plain aggregates over `df` — ONE aggregation job
    * for the whole list. Returns (check_name, metric, pass) rows. On an
    * EMPTY table most aggregates are NULL: a null metric surfaces as NaN
    * and a null pass as FALSE (an empty build fails its gate loudly
    * instead of NPE-ing the report). */
  def aggregateChecks(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = checks.flatMap(c =>
      Seq(coalesce(c.metric.cast("double"), lit(Double.NaN)).as(c.name + "__m"),
        coalesce(c.pass, lit(false)).as(c.name + "__p")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    checks.zipWithIndex.map { case (c, i) =>
      (c.name, row.getDouble(2 * i), row.getBoolean(2 * i + 1))
    }.toDF("check_name", "metric", "pass")
  }

  /** Duplicate-key count for a supposed primary key (0 = unique). */
  def duplicateKeys(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key)).count().filter(col("count") > 1)

  /** Orphaned foreign keys: child rows whose `childKey` has no match in
    * `parent.parentKey` (anti-join — the planner broadcasts the smaller
    * side; at scale this is the standard referential-integrity sweep). */
  def fkOrphans(child: DataFrame, childKey: String,
                parent: DataFrame, parentKey: String): DataFrame =
    child.join(parent.select(col(parentKey).as(childKey)),
      Seq(childKey), "left_anti")

  /** Snapshot diff by primary key: full-outer join of two table versions,
    * rows classified added / removed / changed (content hash differs) —
    * unchanged rows are dropped (the interesting set is the delta). At
    * corpus scale both sides bucket by the key; the join is the only
    * shuffle and unchanged rows never leave the reducers. */
  def snapshotDiff(before: DataFrame, after: DataFrame, key: String,
                   contentHash: Column): DataFrame = {
    val b = before.select(col(key).as("k"), contentHash.as("h_before"))
    val a = after.select(col(key).as("k"), contentHash.as("h_after"))
    b.join(a, Seq("k"), "full_outer")
      .withColumn("change_type",
        when(col("h_before").isNull, "added")
          .when(col("h_after").isNull, "removed")
          .when(col("h_before") =!= col("h_after"), "changed"))
      .filter(col("change_type").isNotNull)
      .select(col("k").as(key), col("change_type"))
  }
}
