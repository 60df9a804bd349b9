package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The round-14 inference family (q245 bootstrap CI, q246 hashed LR,
  * q247 nDCG retrieval eval, q248 JL distortion, q249 PQ codebook
  * training) pinned against straight-line driver-side references — the
  * oracle gate proves DuckDB parity; these prove the MATH. */
class InferenceSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._
  import graft.queries.InferenceQueries

  private def writeDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_inf").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq.empty[(Long, Seq[Float], Int)].toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def writeEmbs(rows: Seq[(Long, Seq[Float], Int)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_inf_e").toString
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def r6(x: Double) = BigDecimal(x * 1e6)
    .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1e6 + 0.0
  private def q9(x: Double) = BigDecimal(x * 1e9)
    .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def writeEvents(rows: Seq[(Long, java.sql.Timestamp, Long, String,
      Double, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_inf_ev").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("inference family on an EMPTY corpus: zero rows, no job failure") {
    val dir = writeDocs(Seq.empty)
    Seq.empty[(Long, java.sql.Timestamp, Long, String, Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(InferenceQueries.q245BootstrapCi(spark, dir).count() == 0)
    assert(InferenceQueries.q246HashedLr(spark, dir).count() == 0)
    assert(InferenceQueries.q247NdcgRetrieval(spark, dir).count() == 0)
    assert(InferenceQueries.q248JlDistortion(spark, dir).count() == 0)
    assert(InferenceQueries.q249PqTrain(spark, dir).count() == 0)
    assert(InferenceQueries.q250IsotonicCalibration(spark, dir).count() == 0)
    assert(InferenceQueries.q251Cuped(spark, dir).count() == 0)
    assert(InferenceQueries.q252SimpsonAudit(spark, dir).count() == 0)
    graft.ops.ScratchCache.releaseAll()
  }

  test("q250 isotonic fit is monotone, respects pooled means, equals minimax reference") {
    val rnd = new scala.util.Random(250)
    val docs = (1L to 200L).map { i =>
      // diversity correlates with lang=en so the fit has real structure
      val n = 5 + rnd.nextInt(30)
      val distinct = 1 + rnd.nextInt(n)
      val text = ((0 until distinct).map(k => s"w$k") ++
        Seq.fill(n - distinct)("w0")).mkString(" ")
      val lang = if (distinct * 2 > n == (rnd.nextInt(4) > 0)) "en" else "de"
      (i, text, lang, "s1", text.length.toLong)
    }
    val dir = writeDocs(docs)
    val got = InferenceQueries.q250IsotonicCalibration(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.nonEmpty)
    // monotone non-decreasing in bin
    got.map(_._4).zip(got.map(_._4).tail).foreach { case (a, b) =>
      assert(a <= b, s"iso not monotone: $a > $b")
    }
    // straight-line minimax reference over the same bins
    val binned = docs.map { case (_, text, lang, _, _) =>
      val ws = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val div = ws.distinct.length.toDouble / ws.length
      (math.min(math.floor(div * 64).toInt, 63),
        if (lang == "en") 1L else 0L)
    }.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (b, g) => (b, g.size.toLong, g.map(_._2).sum) }
    val cn = binned.map(_._2).scanLeft(0L)(_ + _)
    val cs = binned.map(_._3).scanLeft(0L)(_ + _)
    def avg(j: Int, k: Int) =
      (cs(k + 1) - cs(j)).toDouble / (cn(k + 1) - cn(j)).toDouble
    val want = binned.indices.map { i =>
      (0 to i).map(j => (i until binned.length).map(k => avg(j, k)).min).max
    }
    got.map(_._4).zip(want.map(r6)).foreach { case (g, w) =>
      assert(g == w, s"iso $g != $w")
    }
  }

  test("q251 CUPED equals a straight-line reference and preserves the overall mean") {
    val rnd = new scala.util.Random(251)
    val split = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val evs = (1L to 600L).map { i =>
      val uid = 1L + (i % 30)
      val pre = i % 2 == 0
      val ts = java.sql.Timestamp.valueOf(
        if (pre) s"2024-01-${(1 + i % 14).formatted("%02d")} 10:00:00"
        else s"2024-01-${(17 + i % 14).formatted("%02d")} 10:00:00")
      // per-user activity level makes x and y correlated → theta != 0
      val level = 1.0 + (uid % 5)
      (i, ts, uid, "view", level * (1.0 + rnd.nextInt(100) / 50.0), "{}")
    }
    val dir = writeEvents(evs)
    val got = InferenceQueries.q251Cuped(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got.length == 2)
    // straight-line reference
    def q6(x: Double) = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val users = evs.groupBy(_._3).toSeq.map { case (uid, g) =>
      val ux = g.filter(_._2.before(split)).map(e => q6(e._5)).sum
      val uy = g.filterNot(_._2.before(split)).map(e => q6(e._5)).sum
      (uid % 2, ux, uy)
    }
    // the winsorized grid form: x/y capped at 10k units, first moments
    // on the 1e2 grid, second moments rounded to integers (the engine's
    // row-bounded moment discipline)
    def q0(x: Double) = BigDecimal(x)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def q2(x: Double) = BigDecimal(x * 1e2)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val wu = users.map { case (grp, ux, uy) =>
      (grp, math.min(ux, 10000000000L).toDouble / 1e6,
        math.min(uy, 10000000000L).toDouble / 1e6)
    }
    val nAll = wu.length
    val mxAll = (wu.map(u => q2(u._2)).sum.toDouble / 1e2) / nAll
    val myAll = (wu.map(u => q2(u._3)).sum.toDouble / 1e2) / nAll
    val theta = (wu.map(u => q0(u._2 * u._3)).sum.toDouble / nAll -
      mxAll * myAll) /
      (wu.map(u => q0(u._2 * u._2)).sum.toDouble / nAll - mxAll * mxAll)
    val want = wu.groupBy(_._1).toSeq.sortBy(_._1).map { case (grp, g) =>
      val mx = (g.map(u => q2(u._2)).sum.toDouble / 1e2) / g.size
      val my = (g.map(u => q2(u._3)).sum.toDouble / 1e2) / g.size
      (grp, g.size.toLong, r6(my), r6(my - theta * (mx - mxAll)), r6(theta))
    }
    assert(got.toSeq == want, s"got=${got.toSeq}\nwant=$want")
    // CUPED preserves the user-weighted overall mean: the group
    // adjustments cancel (up to the 6dp rounding of the outputs)
    val pooledRaw = got.map(r => r._3 * r._2).sum / got.map(_._2).sum
    val pooledAdj = got.map(r => r._4 * r._2).sum / got.map(_._2).sum
    assert(math.abs(pooledRaw - pooledAdj) < 1e-5, s"$pooledRaw vs $pooledAdj")
  }

  test("q251 winsorizes a bot user at the 10k cap — no Long-overflow channel") {
    val split = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    // user 1: a bot with a 50k pre-period total (5 × the cap);
    // users 2-4: honest, far under the cap
    val evs =
      (1 to 50).map(i => (i.toLong,
        java.sql.Timestamp.valueOf("2024-01-05 10:00:00"), 1L, "view",
        1000.0, "{}")) ++
      Seq((100L, java.sql.Timestamp.valueOf("2024-01-20 10:00:00"), 1L,
        "view", 7.0, "{}")) ++
      (2 to 4).flatMap(u => Seq(
        (200L + u, java.sql.Timestamp.valueOf("2024-01-05 10:00:00"),
          u.toLong, "view", 10.0 * u, "{}"),
        (300L + u, java.sql.Timestamp.valueOf("2024-01-20 10:00:00"),
          u.toLong, "view", 5.0 * u, "{}")))
    val dir = writeEvents(evs)
    val got = InferenceQueries.q251Cuped(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(4)))
    // replay theta with the bot CAPPED at 10,000 (not its true 50,000):
    // x values post-cap are 10000 (bot), 20, 40 (u2, u4 odd? u2,u4 even)
    val users = Seq( // (grp, x capped, y)
      (1L, 10000.0, 7.0), (0L, 20.0, 10.0), (1L, 30.0, 15.0),
      (0L, 40.0, 20.0))
    def q2(x: Double) = BigDecimal(x * 1e2)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def q0(x: Double) = BigDecimal(x)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val n = users.length
    val mx = (users.map(u => q2(u._2)).sum.toDouble / 1e2) / n
    val my = (users.map(u => q2(u._3)).sum.toDouble / 1e2) / n
    val theta = (users.map(u => q0(u._2 * u._3)).sum.toDouble / n - mx * my) /
      (users.map(u => q0(u._2 * u._2)).sum.toDouble / n - mx * mx)
    got.foreach { case (_, t) => assert(t == r6(theta), s"$t != ${r6(theta)}") }
  }

  test("q251/q252 singular corners: zero-variance covariate yields non-finite output, no exception") {
    // q251: both users have IDENTICAL pre-period totals → var(x) = 0 →
    // θ = 0/0 = NaN; the q241 singular contract is non-finite output
    val split = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val evs = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-05 10:00:00"), 1L, "view", 10.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-20 10:00:00"), 1L, "view", 3.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-05 10:00:00"), 2L, "view", 10.0, "{}"),
      (4L, java.sql.Timestamp.valueOf("2024-01-20 10:00:00"), 2L, "view", 7.0, "{}"))
    val d1 = writeEvents(evs)
    val r1 = InferenceQueries.q251Cuped(spark, d1).collect()
    assert(r1.length == 2)
    assert(r1.forall(r => r.getDouble(4).isNaN))
    // q252: every doc has exactly 100 tokens (x = 1.0, exactly
    // representable so the quantized moments cancel to a true 0/0) and
    // constant diversity → NaN slope, sign_flip 0, no crash
    val text100 = (0 until 100).map(k => s"w$k").mkString(" ")
    val docs = (1L to 6L).map(i => (i, text100, "en", "s1", 100L))
    val d2 = writeDocs(docs)
    val r2 = InferenceQueries.q252SimpsonAudit(spark, d2).collect()
    assert(r2.length == 1)
    assert(r2.head.getDouble(2).isNaN && r2.head.getLong(4) == 0L)
  }

  test("q252 flags a constructed Simpson reversal") {
    // two sources: within each, diversity FALLS with token count; but the
    // high-count source has uniformly higher diversity → pooled slope rises
    def mk(src: String, baseN: Int, baseDiv: Double, ids: Range) =
      ids.map { i =>
        val n = baseN + (i % 5) * 2           // token count
        val div = baseDiv - (i % 5) * 0.06    // diversity falls as n rises
        val distinct = math.max(1, math.round(div * n).toInt)
        val text = ((0 until distinct).map(k => s"${src}w$k") ++
          Seq.fill(n - distinct)(s"${src}w0")).mkString(" ")
        (i.toLong, text, "en", src, text.length.toLong)
      }
    val docs = mk("s1", 10, 0.55, 1 to 40) ++ mk("s2", 40, 0.95, 41 to 80)
    val dir = writeDocs(docs)
    val got = InferenceQueries.q252SimpsonAudit(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4)))
    assert(got.length == 2)
    got.foreach { case (src, n, slope, pooled, flip) =>
      assert(n == 40L)
      assert(slope < 0.0, s"$src slope $slope should be negative")
      assert(pooled > 0.0, s"pooled $pooled should be positive")
      assert(flip == 1L, s"$src should flag the reversal")
    }
  }

  test("q245 equals a straight-line Poisson-bootstrap reference") {
    val docs = (1L to 40L).map(i =>
      (i, "t", "en", "s1", (50 + (i * 37) % 400)))
    val dir = writeDocs(docs)
    val got = InferenceQueries.q245BootstrapCi(spark, dir).collect()
    assert(got.length == 1)
    // straight-line: same LCG, same thresholds, same order statistics
    val cum = {
      var p = math.exp(-1.0); var c = p
      (0 to 5).map { k =>
        val t = math.floor(c * 2147483648.0).toLong
        p = p / (k + 1); c += p; t
      }
    }
    def w(docId: Long, b: Int): Long = {
      val u = (1103515245L * ((docId * 31 + b) % 2147483648L) + 12345L) %
        2147483648L
      val k = cum.indexWhere(u < _)
      if (k < 0) 6L else k.toLong
    }
    val means = (0 until 32).flatMap { b =>
      val sw = docs.map { case (id, _, _, _, _) => w(id, b) }.sum
      val swx = docs.map { case (id, _, _, _, nc) => w(id, b) * nc }.sum
      if (sw > 0) Some(swx.toDouble / sw.toDouble) else None
    }.sorted
    val point = docs.map(_._5).sum.toDouble / docs.length
    val r = got(0)
    assert(r.getLong(0) == docs.length.toLong)
    assert(r.getDouble(1) == r6(point))
    assert(r.getDouble(2) == r6(means(math.min(1, means.length - 1))))
    assert(r.getDouble(3) == r6(means(math.min(30, means.length - 1))))
    // the interval must bracket the point estimate on a well-behaved corpus
    assert(r.getDouble(2) <= r.getDouble(1) && r.getDouble(1) <= r.getDouble(3))
  }

  test("q246 equals a straight-line hashed-feature logistic regression") {
    val docs = Seq(
      (1L, "the quick brown fox", "en", "s1", 19L),
      (2L, "ein kleiner brauner fuchs", "de", "s1", 25L),
      (3L, "hello world again and again", "en", "s2", 27L),
      (4L, "bonjour le monde encore", "fr", "s2", 23L),
      (5L, "short text here", "en", "s1", 15L),
      (6L, "une phrase un peu plus longue", "fr", "s1", 29L))
    val dir = writeDocs(docs)
    val got = InferenceQueries.q246HashedLr(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // straight-line: same hash buckets, quantized gradients, update shape
    val feats = docs.map { case (_, text, lang, _, _) =>
      val ws = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val y = if (lang == "en") 1.0 else 0.0
      val x = Array.tabulate(16) { j =>
        ws.count(w => graft.functions.ShingleKernel.polyHash32(w) % 16 == j)
          .toDouble / ws.length
      }
      (y, x)
    }
    val wl = Array.fill(16)(0.0)
    var bias = 0.0
    val want = (1 to 3).map { r =>
      var gb = 0L; var ncorr = 0L
      val gj = Array.fill(16)(0L)
      feats.foreach { case (y, x) =>
        val z = bias + x.indices.foldLeft(0.0)((a, i) => a + x(i) * wl(i))
        val p = 1.0 / (1.0 + math.exp(-z))
        val resid = y - p
        if ((z >= 0 && y == 1.0) || (z < 0 && y == 0.0)) ncorr += 1
        gb += q9(resid)
        for (j <- 0 until 16) gj(j) += q9(x(j) * resid)
      }
      val n = feats.length
      for (j <- 0 until 16) wl(j) = wl(j) + 0.5 * ((gj(j).toDouble / 1e9) / n)
      bias = bias + 0.5 * ((gb.toDouble / 1e9) / n)
      val wn = math.sqrt(wl.foldLeft(0.0)((a, x) => a + x * x))
      (r.toLong, ncorr, r6(bias), r6(wn))
    }
    assert(got.toSeq == want, s"got=${got.toSeq}\nwant=$want")
    graft.ops.ScratchCache.releaseAll()
  }

  test("bucketFracs kernel equals the staged HOF composition") {
    val docs = Seq(
      (1L, "The quick  brown fox\tjumps", "en", "s1", 26L),
      (2L, "  ", "en", "s1", 2L),
      (3L, "einzelwort", "de", "s1", 10L),
      (4L, "a b c d e f g h i j k l m n o p q r s t", "en", "s2", 40L))
    val dir = writeDocs(docs)
    val df = spark.read.parquet(s"$dir/documents.parquet")
    val kernel = df.select($"doc_id",
        graft.functions.ShingleExpressions.bucketFracs($"text", 16).as("x"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val ws = graft.functions.TextFunctions.tokens($"text")
    val staged = df
      .select($"doc_id", ws.as("ws"))
      .select($"doc_id",
        transform($"ws", wd =>
          graft.functions.TextFunctions.polyHash(wd) % 16).as("hs"),
        size($"ws").as("nt"))
      .select($"doc_id",
        when($"nt" >= 1, transform(sequence(lit(0), lit(15)),
          j => size(filter($"hs", h => h === j)).cast("double") / $"nt"))
          .otherwise(typedlit(Seq.empty[Double])).as("x"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(kernel == staged, s"kernel=$kernel\nstaged=$staged")
  }

  test("q247 equals a brute-force nDCG/MRR reference; perfect retrieval scores 1") {
    // two well-separated label clusters: retrieval by cosine is perfect,
    // so every query's ndcg@10 and mrr must be exactly 1
    val rnd = new scala.util.Random(247)
    val embs = (0L until 40L).map { i =>
      val lab = (i % 2).toInt
      val base = Array.tabulate(64)(d =>
        if (d < 32 == (lab == 0)) 1.0f else 0.0f)
      val v = base.map(x => x + rnd.nextFloat() * 0.01f)
      (i, v.toSeq, lab)
    }
    val dir = writeEmbs(embs)
    val got = InferenceQueries.q247NdcgRetrieval(spark, dir).collect()
    assert(got.length == 20)
    got.foreach { r =>
      assert(r.getLong(1) == 19L, s"n_rel ${r.getLong(1)}")
      assert(r.getDouble(2) == 1.0, s"ndcg ${r.getDouble(2)}")
      assert(r.getDouble(3) == 1.0, s"mrr ${r.getDouble(3)}")
    }
    // and against a straight-line reference on a mixed corpus
    val embs2 = (0L until 30L).map { i =>
      (i, Seq.tabulate(64)(d => rnd.nextFloat() * 2f - 1f), (i % 3).toInt)
    }
    val dir2 = writeEmbs(embs2)
    val got2 = InferenceQueries.q247NdcgRetrieval(spark, dir2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1.toDouble * p._2.toDouble)
    val disc = Array.tabulate(10)(i => 1.0 / (math.log(i + 2.0) / math.log(2.0)))
    val cum = disc.scanLeft(0.0)(_ + _)
    val want2 = embs2.filter(_._1 < 20).sortBy(_._1).map { case (qid, qv, qlab) =>
      val cands = embs2.filter(_._1 != qid).map { case (cid, cv, clab) =>
        val cos = dot(qv, cv) / (math.sqrt(dot(qv, qv)) * math.sqrt(dot(cv, cv)))
        (cid, r6(cos), if (clab == qlab) 1L else 0L)
      }
      val ranked = cands.sortBy(c => (-c._2, c._1 * 2 + c._3)).take(10)
      val nRel = cands.map(_._3).sum
      val dcgq = ranked.zipWithIndex
        .map { case ((_, _, rel), i) => q9(rel.toDouble * disc(i)) }.sum
      val fr = ranked.zipWithIndex.collectFirst {
        case ((_, _, 1L), i) => i + 1 }
      val ndcg = if (nRel == 0) 0.0
        else (dcgq.toDouble / 1e9) / cum(math.min(nRel, 10L).toInt)
      (qid, nRel, r6(ndcg), r6(fr.map(1.0 / _).getOrElse(0.0)))
    }
    assert(got2.toSeq == want2, s"got=${got2.toSeq}\nwant=$want2")
  }

  test("q248 distortion equals a straight-line JL reference and centers near 1") {
    val rnd = new scala.util.Random(248)
    val embs = (0L until 50L).map { i =>
      (i, Seq.tabulate(64)(_ => rnd.nextFloat() * 2f - 1f), (i % 2).toInt)
    }
    val dir = writeEmbs(embs)
    val got = InferenceQueries.q248JlDistortion(spark, dir).collect()
    def sign(j: Int, dd: Int): Double =
      if (((1103515245L * (j * 64L + dd) + 12345L) % 2147483648L) >=
        1073741824L) 1.0 else -1.0
    val dists = embs.map { case (_, v, lab) =>
      val ys = Array.tabulate(16)(j =>
        (0 until 64).foldLeft(0.0)((a, dd) => a + v(dd).toDouble * sign(j, dd)))
      val n2 = v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)
      val y2 = ys.foldLeft(0.0)((a, y) => a + y * y)
      lab -> ((y2 / 16.0) / n2)
    }
    val want = dists.groupBy(_._1).toSeq.sortBy(_._1).map { case (lab, g) =>
      val ds = g.map(_._2)
      (lab, g.size.toLong, r6((ds.map(q9).sum.toDouble / 1e9) / g.size),
        ds.map(r6).min, ds.map(r6).max)
    }
    val gotT = got.map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4)))
    assert(gotT.toSeq == want, s"got=${gotT.toSeq}\nwant=$want")
    // E[distortion] = 1 for ±1 projections: sanity-check the concentration
    want.foreach { case (_, _, mean, mn, mx) =>
      assert(mean > 0.5 && mean < 1.5, s"mean distortion $mean")
      assert(mn > 0.05 && mx < 4.0, s"spread [$mn, $mx]")
    }
  }

  test("q249 equals a straight-line per-subspace Lloyd reference") {
    val rnd = new scala.util.Random(249)
    val embs = (0L until 60L).map { i =>
      (i, Seq.tabulate(64)(_ => rnd.nextFloat() * 2f - 1f), (i % 3).toInt)
    }
    val dir = writeEmbs(embs)
    val got = InferenceQueries.q249PqTrain(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val vecs = embs.sortBy(_._1).map(_._2.map(_.toDouble).toArray)
    def q8(x: Double) = BigDecimal(x * 1e8)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def qm(x: Double) = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val cents = Array.tabulate(4, 4) { (ss, j) =>
      vecs(j).slice(ss * 16, ss * 16 + 16) }
    var sizes = Map.empty[(Int, Int), Long]
    var iqs = Map.empty[(Int, Int), Long]
    for (_ <- 1 to 2) {
      val assigned = for (v <- vecs; ss <- 0 until 4) yield {
        val sub = v.slice(ss * 16, ss * 16 + 16)
        val ds = cents(ss).zipWithIndex.map { case (c, j) =>
          (sub.zip(c).foldLeft(0.0) { case (acc, (a, b)) =>
            acc + (a - b) * (a - b) }, j) }
        val (d2, j) = ds.minBy(identity)
        (ss, j, d2, sub)
      }
      val byCell = assigned.groupBy(a => (a._1, a._2))
      sizes = byCell.map { case (k, g) => k -> g.size.toLong }
      iqs = byCell.map { case (k, g) => k -> g.map(a => qm(a._3)).sum }
      for (((ss, j), g) <- byCell) {
        cents(ss)(j) = (0 until 16).map { p =>
          g.map(a => q8(a._4(p))).sum.toDouble / (1e8 * g.size)
        }.toArray
      }
    }
    val want = sizes.keys.toSeq.sorted.map { case (ss, j) =>
      (ss, j, sizes((ss, j)), iqs((ss, j)),
        r6(math.sqrt(cents(ss)(j).foldLeft(0.0)((a, x) => a + x * x))))
    }
    assert(got.toSeq == want, s"got=${got.toSeq}\nwant=$want")
    graft.ops.ScratchCache.releaseAll()
  }
}
