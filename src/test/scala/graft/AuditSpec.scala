package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Audit

/** Constraint audit + snapshot diff: classification correctness on
  * constructed fixtures, and the fixture queries' invariants. */
class AuditSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  test("aggregateChecks evaluates metric and pass from one scan") {
    val df = Seq((1L, 10.0), (2L, 20.0), (3L, -5.0)).toDF("id", "v")
    val out = Audit.aggregateChecks(df, Seq(
      Audit.Check("rowcount", count(lit(1)), count(lit(1)) > 0),
      Audit.Check("v_nonneg",
        sum(when($"v" < 0, 1L).otherwise(0L)),
        sum(when($"v" < 0, 1L).otherwise(0L)) === 0)))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
    assert(out.toSeq == Seq(("rowcount", 3.0, true), ("v_nonneg", 1.0, false)))
  }

  test("empty inputs: audit reports NaN/false, weightedSample returns empty") {
    val empty = Seq.empty[(Long, Double)].toDF("id", "v")
    val out = Audit.aggregateChecks(empty, Seq(
      Audit.Check("v_max", max($"v"), max($"v") < 100))).head()
    assert(out.getDouble(1).isNaN && !out.getBoolean(2))
    val ed = Seq.empty[(Long, String, Long)].toDF("doc_id", "text", "n_chars")
    assert(graft.ops.Sampling.weightedSample(ed, $"text", $"n_chars",
      10L, "s").isEmpty)
  }

  test("duplicateKeys and fkOrphans find exactly the violations") {
    val parent = Seq(1L, 2L, 2L, 3L).toDF("k")
    assert(Audit.duplicateKeys(parent, "k").as[(Long, Long)].collect()
      .toSeq == Seq((2L, 2L)))
    val child = Seq(1L, 3L, 9L).toDF("k")
    assert(Audit.fkOrphans(child, "k", parent.distinct(), "k")
      .as[Long].collect().toSeq == Seq(9L))
  }

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    val before = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "t")
    val after = Seq((2L, "b"), (3L, "C!"), (4L, "d")).toDF("id", "t")
    val got = Audit.snapshotDiff(before, after, "id",
        graft.functions.TextFunctions.polyHash(col("t")))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "removed"), (3L, "changed"), (4L, "added")))
  }

  test("q67 audit passes every check on the fixture; q68 diff is non-trivial") {
    val audit = graft.queries.AdvancedQueries.q67ConstraintAudit(spark, sfSmoke)
      .collect()
    assert(audit.length == 6)
    assert(audit.forall(_.getBoolean(2)),
      audit.map(r => s"${r.getString(0)}=${r.getBoolean(2)}").mkString(","))
    val diff = graft.queries.AdvancedQueries.q68SnapshotDiff(spark, sfSmoke)
      .as[(Long, String)].collect()
    val byType = diff.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byType.keySet == Set("added", "removed", "changed"), byType.toString)
    // deterministic construction: counts derive from the id residues
    val n = Tables.documents(spark, sfSmoke).count()
    assert(byType("added") == (0L until n).count(_ % 101 == 0))
    assert(byType("removed") == (0L until n).count(_ % 97 == 0))
    assert(byType("changed") ==
      (0L until n).count(i => i % 89 == 0 && i % 97 != 0))
  }
}
