package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.CurationQueries

/** q102 PII redaction, q103 triangle counting, q104 SemDeDup, q105 skyline. */
class CurationSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  test("q124 hash-space overlap == string-space overlap (no fnv64 collision on ANY fixture)") {
    // the engine aggregates on fnv64(shingle) while the oracle dedups
    // exact strings — equality is probabilistic in general (documented
    // ≈ n²/2⁶⁵), so PIN it on EVERY fixture scale the harness runs
    // (sf0.001 smoke, sf0.01 correctness gate, sf0.1 bench): a new or
    // regenerated fixture can't silently reintroduce a hash-vs-string
    // divergence without this test seeing it
    import org.apache.spark.sql.functions._
    val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
      .filter(d => java.nio.file.Files.exists(
        java.nio.file.Paths.get(d, "documents.parquet")))
    assert(dirs.nonEmpty, "no fixture dirs found")
    for (d <- dirs) {
      val docs = Tables.documents(spark, d)
      val strings = docs.select($"source", explode(coalesce(
          graft.functions.ShingleExpressions.wordShingles($"text", 3),
          array().cast("array<string>"))).as("sh"))
        .select($"source", $"sh").distinct().count()
      val hashes = docs.select($"source", explode(
          graft.functions.ShingleExpressions.wordShingleHashes64($"text", 3))
          .as("h"))
        .select($"source", $"h").distinct().count()
      assert(strings == hashes,
        s"fnv64 collision on $d: $strings distinct shingles vs $hashes hashes")
    }
  }

  test("q124 set-keyed overlap regime == bitmask regime on the fixture") {
    val docs = Tables.documents(spark, sfSmoke)
    val viaBitmask = CurationQueries.sourceOverlap(docs).collect()
    val viaSets = CurationQueries.sourceOverlapViaSets(docs).collect()
    assert(viaBitmask.nonEmpty)
    assert(viaBitmask.toSeq == viaSets.toSeq)
  }

  test("sourceOverlap dispatches past 63 sources instead of failing fast") {
    // 70 sources: src00/src01 share every shingle (jac 1.0), the rest are
    // pairwise-disjoint — zero-intersection pairs never emit a row in
    // either regime, so the full 70-source matrix is exactly one row
    val rows = Seq(
      ("src00", "alpha beta gamma delta"),
      ("src01", "alpha beta gamma delta")) ++
      (2 until 70).map(i => (f"src$i%02d", f"w$i%02da w$i%02db w$i%02dc"))
    val docs = rows.toDF("source", "text")
    val out = CurationQueries.sourceOverlap(docs).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "src00" && r.getString(1) == "src01")
    assert(r.getLong(2) == 2L) // "alpha beta gamma" + "beta gamma delta"
    assert(r.getDouble(3) == 1.0)
  }

  test("redactPii masks emails, phones and account ids; counts match") {
    val rows = Seq(
      "write to jane.doe+spam@sub.example.org today",
      "call 12-345-678-9012 or 99-111-222-3333",
      "Customer#000000042 owes nothing",
      "no pii here at all",
      "x@y.io and 10-000-000-0000 and Customer#1")
      .toDF("text")
      .select($"text", CurationQueries.redactPii($"text").as("r"),
        CurationQueries.piiCount($"text").as("n"))
      .collect().map(r => (r.getString(1), r.getInt(2)))
    assert(rows(0) == ("write to [EMAIL] today", 1))
    assert(rows(1) == ("call [PHONE] or [PHONE]", 2))
    assert(rows(2) == ("[ID] owes nothing", 1))
    assert(rows(3) == ("no pii here at all", 0))
    assert(rows(4) == ("[EMAIL] and [PHONE] and [ID]", 3))
  }

  test("q102 redacted output keeps no raw phone or id pattern") {
    val out = CurationQueries.q102PiiRedact(spark, sfSmoke).collect()
    assert(out.nonEmpty)
    val phone = CurationQueries.PhonePat.r
    out.foreach { r =>
      val red = r.getString(1)
      assert(phone.findFirstIn(red).isEmpty, red)
      assert(!red.contains("@"), red)
      assert(r.getLong(2) >= 3, r.toString) // email + >=1 phone + id
    }
  }

  test("triangleCount matches known graphs") {
    // K4 (complete on 4 nodes) has 4 triangles; adding a pendant edge adds 0
    val k4 = (for (u <- 0 to 3; v <- (u + 1) to 3) yield (u.toLong, v.toLong))
      .toDF("u", "v")
    assert(graft.queries.GraphQueries.triangleCount(k4)
      .head().getLong(0) == 4L)
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    assert(graft.queries.GraphQueries.triangleCount(path)
      .head().getLong(0) == 0L)
  }

  test("packedPairs kernel: sorts, dedups, packs, guards") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def run(xs: Seq[java.lang.Long]): Seq[Long] = {
      val r = graft.functions.GraphKernels.packedPairs(
        new GenericArrayData(xs.toArray[Any]))
      (0 until r.numElements()).map(r.getLong)
    }
    assert(run(Seq(3L, 1L, 2L, 1L)) ==
      Seq((1L << 32) | 2L, (1L << 32) | 3L, (2L << 32) | 3L))
    assert(run(Seq(5L)) == Seq.empty)
    assert(run(Seq(null, 7L, null, 4L)) == Seq((4L << 32) | 7L))
    assert(graft.functions.GraphKernels.packedPairs(null).numElements() == 0)
    intercept[IllegalArgumentException] { run(Seq(-1L, 2L)) }
    // matches the HOF formulation on random arrays (including the SQL path)
    val rnd = new scala.util.Random(3)
    val arrs = Seq.fill(40)(Seq.fill(rnd.nextInt(8))(rnd.nextInt(50).toLong))
    val df = arrs.toDF("ps")
    val hof = df.selectExpr(
      "flatten(transform(array_sort(array_distinct(ps)), (a, i) -> " +
      "transform(slice(array_sort(array_distinct(ps)), i + 2, size(ps)), " +
      "b -> a * 4294967296 + b))) AS want").collect().map(_.getSeq[Long](0))
    val got = df.select(
      graft.functions.GraphFunctions.packedPairs($"ps").as("got"))
      .collect().map(_.getSeq[Long](0))
    got.zip(hof).foreach { case (g, h) => assert(g == h) }
  }

  test("packedPairsAndSingles kernel: pairs plus one diagonal per distinct id") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def run(xs: Seq[java.lang.Long]): Seq[Long] = {
      val r = graft.functions.GraphKernels.packedPairsAndSingles(
        new GenericArrayData(xs.toArray[Any]))
      (0 until r.numElements()).map(r.getLong)
    }
    // per id: diagonal first, then its a<b pairs — kernel order
    assert(run(Seq(3L, 1L, 2L, 1L)) == Seq(
      (1L << 32) | 1L, (1L << 32) | 2L, (1L << 32) | 3L,
      (2L << 32) | 2L, (2L << 32) | 3L,
      (3L << 32) | 3L))
    assert(run(Seq(5L)) == Seq((5L << 32) | 5L))
    assert(run(Seq.empty) == Seq.empty)
    assert(graft.functions.GraphKernels.packedPairsAndSingles(null).numElements() == 0)
    intercept[IllegalArgumentException] { run(Seq(-1L, 2L)) }
    // pair subset == packedPairs; diagonal subset == distinct ids
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 30) {
      val xs = Seq.fill(rnd.nextInt(9))(rnd.nextInt(40).toLong)
      val all = run(xs.map(java.lang.Long.valueOf))
      val (diag, pairs) = all.partition(p => (p >>> 32) == (p & 0xFFFFFFFFL))
      val want = graft.functions.GraphKernels.packedPairs(
        new GenericArrayData(xs.toArray[Any]))
      assert(pairs.sorted ==
        (0 until want.numElements()).map(want.getLong).sorted)
      assert(diag.map(_ >>> 32).sorted == xs.distinct.sorted)
    }
  }

  test("triangle strategies agree on a random graph") {
    val rnd = new scala.util.Random(11)
    val e = (1 to 300).map { _ =>
      val a = rnd.nextInt(40).toLong; val b = rnd.nextInt(40).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct.toDF("u", "v")
    val viaJoins = graft.ops.Triangles.countViaJoins(e).head().getLong(0)
    val viaSet = graft.ops.Triangles.countViaBroadcastSet(e).head().getLong(0)
    assert(viaJoins == viaSet && viaJoins > 0)
  }

  test("graphMetrics equals the per-metric jobs, incl. duplicated input") {
    val rnd = new scala.util.Random(7)
    val pairs = (1 to 400).map { _ =>
      val a = rnd.nextInt(50).toLong; val b = rnd.nextInt(50).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2) // duplicates kept on purpose
    val e = pairs.distinct.toDF("u", "v")
    val packed = pairs // duplicated stream, as q103's explode emits it
      .map { case (u, v) => (u << 32) | v }
      .toDF("uv").as[Long]
    val m = graft.ops.Triangles.graphMetrics(packed)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val wantEdges = pairs.distinct.size.toLong
    val wantNodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct.size.toLong
    val wantTris = graft.ops.Triangles.countViaJoins(e).head().getLong(0)
    assert(m == Map("edges" -> wantEdges, "nodes" -> wantNodes,
      "triangles" -> wantTris))
  }

  test("metrics auto-switch: distributed path engages past the byte threshold") {
    val rnd = new scala.util.Random(13)
    val pairs = (1 to 400).map { _ =>
      val a = rnd.nextInt(50).toLong; val b = rnd.nextInt(50).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2)
    val packed = pairs.map { case (u, v) => (u << 32) | v }.toDF("uv").as[Long]
    val a = graft.ops.Triangles.metrics(packed)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(graft.ops.Triangles.lastChoice == "broadcast")
    graft.ops.ScratchCache.releaseAll()
    val b = graft.ops.Triangles.metrics(packed, maxBroadcastBytes = 0L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(graft.ops.Triangles.lastChoice == "distributed")
    graft.ops.ScratchCache.releaseAll()
    assert(a == b) // the switch may never change the metrics
  }

  test("q104 drop rule: every drop has a lower-id cluster-mate above tau") {
    // replay the rule brute-force on the smoke embeddings
    val emb = Tables.embeddings(spark, sfSmoke)
      .select($"vec_id".cast("long"), $"embedding")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def dot(x: Array[Float], y: Array[Float]) =
        x.zip(y).foldLeft(0.0)((acc, p) => acc + p._1.toDouble * p._2.toDouble)
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val cents = emb.take(CurationQueries.SemDedupK)
    val assign = emb.map { case (id, v) =>
      val best = cents.map { case (cid, cv) => (cos(v, cv), -cid) }.max
      (id, -best._2, v)
    }
    val p = math.pow(10, 6)
    val expected = assign.groupBy(_._2).map { case (cl, members) =>
      val dropped = members.count { case (id, _, v) =>
        members.exists { case (id2, _, v2) =>
          id2 < id && math.round(cos(v2, v) * p) / p >= CurationQueries.SemDedupTau
        }
      }
      (cl, members.size.toLong, dropped.toLong)
    }.toSeq.sortBy(_._1)
    val got = CurationQueries.q104SemDedup(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    graft.ops.ScratchCache.releaseAll()
  }

  test("q104 pair generation stays an equi-join — no cartesian, no BNLJ") {
    val df = CurationQueries.q104SemDedup(spark, sfSmoke)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    graft.ops.ScratchCache.releaseAll()
  }

  test("skyline frontier equals the quadratic dominance definition") {
    val rnd = new scala.util.Random(7)
    val pts = (1 to 400).map(i =>
      (i.toLong, (rnd.nextInt(40) / 4.0), rnd.nextInt(50).toLong))
    val expected = pts.filter { case (_, c, g) =>
      !pts.exists { case (_, c2, g2) =>
        c2 <= c && g2 >= g && (c2 < c || g2 > g)
      }
    }.map(t => (t._1, t._2, t._3)).sortBy(_._1)
    val got = graft.ops.Skyline
      .frontier(pts.toDS(), parts = 5)
      .as[(Long, Double, Long)].collect().sortBy(_._1).toSeq
    assert(got == expected)
    graft.ops.ScratchCache.releaseAll()
  }

  test("skyline plan: one range exchange, no Window, no self-join") {
    val pts = (1 to 50).map(i => (i.toLong, i / 3.0, (i % 7).toLong)).toDS()
    val df = graft.ops.Skyline.frontier(pts, parts = 4)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Join"), plan)
    graft.ops.ScratchCache.releaseAll()
  }

  test("mixtureRates: binding stratum keeps all, shares match the recipe") {
    val rates = graft.ops.Sampling.mixtureRates(
      counts = Map("web" -> 1000L, "books" -> 100L, "code" -> 300L),
      weights = Map("web" -> 4.0, "books" -> 1.0, "code" -> 2.0))
    // books is binding: 100/1 < 300/2 < 1000/4
    assert(rates("books") == 1.0)
    assert(rates.values.forall(r => r > 0 && r <= 1.0))
    // expected kept counts proportional to weights: 400 : 100 : 200
    val kept = rates.map { case (s, r) =>
      s -> r * Map("web" -> 1000L, "books" -> 100L, "code" -> 300L)(s) }
    assert(math.abs(kept("web") / kept("books") - 4.0) < 1e-9)
    assert(math.abs(kept("code") / kept("books") - 2.0) < 1e-9)
  }

  test("q112: rerun-deterministic, kept <= docs, binding source keeps all") {
    val out = CurationQueries.q112MixtureRebalance(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.nonEmpty)
    out.foreach { case (_, n, k, rate) =>
      assert(k <= n && rate > 0 && rate <= 1.0)
    }
    assert(out.exists(_._4 == 1.0)) // some source is binding
    val again = CurationQueries.q112MixtureRebalance(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq == again.toSeq)
  }

  test("sequence packing: greedy invariants + known hand case") {
    // budget 10: [4,5] fill bin 0; 3 opens bin 1; oversized 12 sits alone
    // in bin 2 (never split); 2 opens bin 3 because 12 closed its bin
    val rows = Seq(("a", 1L, 4L), ("a", 2L, 5L), ("a", 3L, 3L),
      ("a", 4L, 12L), ("a", 5L, 2L), ("b", 1L, 10L), ("b", 2L, 1L)).toDS()
    val got = graft.ops.SequencePack.greedy(rows, 10L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 1L),
      ("a", 4L, 2L), ("a", 5L, 3L), ("b", 1L, 0L), ("b", 2L, 1L)))
  }

  test("q114: bins are dense, ordered, and within budget unless singleton") {
    val out = CurationQueries.q114SequencePack(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (src, docs) =>
      val sorted = docs.sortBy(_._2)
      // bins start at 0, never skip, never decrease along doc order
      assert(sorted.head._4 == 0L, src)
      sorted.sliding(2).foreach { case Array(p, n) =>
        assert(n._4 == p._4 || n._4 == p._4 + 1, s"$src bin jump")
      case _ => }
      sorted.groupBy(_._4).foreach { case (_, binDocs) =>
        val tot = binDocs.map(_._3).sum
        assert(tot <= CurationQueries.PackBudget || binDocs.length == 1,
          s"$src overfull shared bin")
      }
    }
  }

  test("q113 equals the row_number window replay; plan is window-free") {
    val df = CurationQueries.q113Curriculum(spark, sfSmoke)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = Tables.documents(spark, sfSmoke)
      .select($"doc_id".cast("long"), $"n_chars".cast("long"))
      .as[(Long, Long)].collect()
    val want = docs.sortBy { case (id, ch) => (-ch, id) }.zipWithIndex
      .map { case ((id, ch), i) =>
        (id, ch, i.toLong, i.toLong * 10 / docs.length) }
    assert(got.toSeq == want.toSeq)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    graft.ops.ScratchCache.releaseAll()
  }
}
