package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{documents, embeddings}
import graft.functions.TextFunctions.{tokens, roundp}

/** Scalable statistical-inference operators (round 14): resampled
  * uncertainty, hashed-feature training, retrieval evaluation, and
  * random-projection auditing — the layer a training-data pipeline runs
  * ABOVE its curation queries to decide whether the numbers it just
  * computed can be trusted. Design rule shared by all four: model /
  * replica / query state is BOUNDED (32 replica sums, 17 hashed weights,
  * 20 query vectors, a 16×64 sign matrix) whatever the corpus, every
  * per-row source of randomness is a deterministic integer LCG identical
  * in both engines, and every cross-row reduction is an exact-integer
  * sum — so the DuckDB twins replay everything bit-for-bit. */
object InferenceQueries {

  // ---------------------------------------------------------------- q245

  private val BootB = 32
  /** Cumulative Poisson(1) thresholds scaled to 2³¹ and floored — the
    * replica weight is chosen by INTEGER comparison of the LCG draw
    * against these, so both engines pick the same k with no float
    * compares anywhere. k is capped at 6 (P(K>6) ≈ 8·10⁻⁵ — the cap is
    * part of the estimator's definition, mirrored in the twin). */
  private val PoisCum: Array[Long] = {
    var p = math.exp(-1.0)
    var c = p
    val out = Array.newBuilder[Long]
    for (k <- 0 to 5) {
      out += math.floor(c * 2147483648.0).toLong
      p = p / (k + 1)
      c += p
    }
    out.result()
  }

  /** q245: BOOTSTRAP confidence interval for a corpus mean in ONE pass —
    * the online-bootstrap (Poisson resampling) form every 100 TB metrics
    * job needs: instead of materializing B resamples, each row carries a
    * deterministic Poisson(1) weight per replica (Oza & Russell 2001's
    * online bagging; Chamandy et al., "Estimating Uncertainty for
    * Massive Data Streams", Google 2012), so the whole CI costs one
    * explode(B+1) scan whose map-side combine collapses to B+1 groups.
    * Replica b's weight for a row is Poisson-inverse-CDF of an integer
    * LCG draw on (doc_id, b) — deterministic, so the oracle replays the
    * exact resamples. b = B is the unweighted original (the point
    * estimate rides the same scan). The 95% CI is the 2nd/31st order
    * statistic of the 32 replica means — driver math over 32 rows. */
  def q245BootstrapCi(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val doc = documents(s, d)
    val idx = pmod($"doc_id" * 31 + $"b", lit(2147483648L))
    val u = (lit(1103515245L) * idx + lit(12345L)) % lit(2147483648L)
    val w = when($"b" === BootB, lit(1L)).otherwise(
      PoisCum.zipWithIndex.reverse.foldLeft(lit(6L)) { case (acc, (t, k)) =>
        when(u < lit(t), lit(k.toLong)).otherwise(acc)
      })
    val g = doc
      .select($"doc_id", $"n_chars",
        explode(sequence(lit(0), lit(BootB))).as("b"))
      .select($"b", (w * $"n_chars").as("wx"), w.as("w"))
      .groupBy($"b").agg(sum($"wx").as("swx"), sum($"w").as("sw"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val point = g.find(_._1 == BootB)
    if (point.isEmpty || point.get._3 == 0L)
      return Seq.empty[(Long, Double, Double, Double)]
        .toDF("n_docs", "mean_chars", "ci_lo", "ci_hi")
    val (_, psum, n) = point.get
    val reps = g.filter(r => r._1 < BootB && r._3 > 0L)
      .map(r => r._2.toDouble / r._3.toDouble).sorted
    // all 32 replicas drawing weight 0 is deterministically possible on
    // a 1-2 doc corpus (each replica zeroes with prob e^{-n}); the CI is
    // undefined then — zero rows, and the twin's len(ms) guard matches
    if (reps.isEmpty)
      return Seq.empty[(Long, Double, Double, Double)]
        .toDF("n_docs", "mean_chars", "ci_lo", "ci_hi")
    def r6(x: Double) = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1e6 + 0.0
    Seq((n, r6(psum.toDouble / n.toDouble),
        r6(reps(math.min(1, reps.length - 1))),
        r6(reps(math.min(30, reps.length - 1)))))
      .toDF("n_docs", "mean_chars", "ci_lo", "ci_hi")
  }

  val q245Sql: String = {
    val cases = PoisCum.zipWithIndex
      .map { case (t, k) => s"WHEN u < $t THEN $k" }.mkString(" ")
    s"""WITH ex AS (SELECT doc_id, n_chars, b
       |  FROM documents CROSS JOIN range(0, ${BootB + 1}) t(b)),
       |wt AS (SELECT b, n_chars,
       |    CASE WHEN b = $BootB THEN 1
       |         ELSE (CASE $cases ELSE 6 END) END AS w
       |  FROM (SELECT *, ((1103515245 * ((doc_id * 31 + b) % 2147483648)
       |      + 12345) % 2147483648) AS u FROM ex)),
       |g AS (SELECT b, sum(w * n_chars)::BIGINT AS swx, sum(w)::BIGINT AS sw
       |  FROM wt GROUP BY b),
       |reps AS (SELECT list(swx::DOUBLE / sw::DOUBLE
       |    ORDER BY swx::DOUBLE / sw::DOUBLE) AS ms
       |  FROM g WHERE b < $BootB AND sw > 0),
       |pt AS (SELECT swx::DOUBLE / sw::DOUBLE AS m, sw AS n
       |  FROM g WHERE b = $BootB)
       |SELECT pt.n AS n_docs,
       |  ${DuckSql.roundpSql("pt.m", 6)} AS mean_chars,
       |  ${DuckSql.roundpSql("ms[least(2, len(ms))]", 6)} AS ci_lo,
       |  ${DuckSql.roundpSql("ms[least(31, len(ms))]", 6)} AS ci_hi
       |FROM pt, reps WHERE pt.n > 0 AND len(ms) >= 1""".stripMargin
  }

  // ---------------------------------------------------------------- q246

  private val HlrBuckets = 16
  private val HlrRounds = 3
  private val HlrLr = 0.5

  /** q246: FEATURE-HASHED logistic regression (Weinberger et al. 2009,
    * "Feature Hashing for Large Scale Multitask Learning") — the trick
    * that makes text-model training state BOUNDED at unbounded vocab:
    * tokens hash into 16 buckets, the feature vector is the per-bucket
    * token fraction, and training is q238's quantized-gradient GD with
    * 17 weights on the driver however large the corpus or vocabulary.
    * Each round is ONE posexplode aggregation over the persisted
    * feature frame (16 groups out); z/p/resid expression shapes and the
    * weight-update form are the q238 contract, so every weight is the
    * same double in both engines. */
  def q246HashedLr(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val Q9 = 1000000000.0
    // feature build runs on the fused graft_bucket_fracs kernel: one
    // tokenize pass + one integer histogram per doc, vs the staged HOF
    // form's 16 interpreted filter passes over the hash list (12.2 →
    // 3.3 s on the sf1 cache fill). Same doubles — the kernel divides
    // the same counts by the same token total — so the oracle keeps the
    // staged list_filter replay.
    val feats = graft.ops.ScratchCache.register(documents(s, d)
      .select(
        when($"lang" === "en", 1.0).otherwise(0.0).as("y"),
        graft.functions.ShingleExpressions.bucketFracs($"text", HlrBuckets)
          .as("x"))
      .filter(size($"x") > 0)
      .persist())
    val wl = Array.fill(HlrBuckets)(0.0)
    var bias = 0.0
    val out = Seq.newBuilder[(Long, Long, Double, Double)]
    var done = false
    for (r <- 1 to HlrRounds if !done) {
      val z = lit(bias) + aggregate(
        zip_with($"x", lit(wl), (xi, wi) => xi * wi),
        lit(0.0), (a, v) => a + v)
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      val resid = ($"y" - p)
      val correct = ((z >= 0) && ($"y" === 1.0)) || ((z < 0) && ($"y" === 0.0))
      val rows = feats
        .select($"y", resid.as("resid"),
          when(correct, 1L).otherwise(0L).as("ok"), posexplode($"x"))
        .groupBy($"pos")
        .agg(
          coalesce(sum(round(($"col" * $"resid") * lit(Q9)).cast("long")),
            lit(0L)).as("gj"),
          sum(when($"pos" === 0, round($"resid" * lit(Q9)).cast("long"))
            .otherwise(lit(0L))).as("gb"),
          sum(when($"pos" === 0, 1L).otherwise(0L)).as("n"),
          sum(when($"pos" === 0, $"ok").otherwise(lit(0L))).as("ncorr"))
        .collect()
      if (rows.isEmpty) done = true
      else {
        val byJ = rows.map(x => x.getInt(0) -> x).toMap
        val n = byJ(0).getLong(3)
        val nCorr = byJ(0).getLong(4)
        val gb = byJ(0).getLong(2)
        for (j <- 0 until HlrBuckets)
          wl(j) = wl(j) + HlrLr * ((byJ(j).getLong(1).toDouble / Q9) / n)
        bias = bias + HlrLr * ((gb.toDouble / Q9) / n)
        val wnorm = math.sqrt(wl.foldLeft(0.0)((a, x) => a + x * x))
        out += ((r.toLong, nCorr, bias, wnorm))
      }
    }
    out.result().toDF("round", "n_correct", "biasr", "wnr")
      .select($"round", $"n_correct",
        roundp($"biasr", 6).as("bias"), roundp($"wnr", 6).as("w_norm"))
      .orderBy($"round")
  }

  val q246Sql: String = {
    val ws = DuckSql.tokensSql
    val hash = DuckSql.polyHashSql("wd")
    // DuckDB rejects subqueries inside lambdas — the previous round's
    // weight list joins in as a plain column (one row) instead
    def z(r: Int) =
      s"(pw.bi + list_reduce(list_transform(" +
        s"range(1, ${HlrBuckets + 1}), i -> x[i] * " +
        s"list_extract(pw.wl, i)), (a, v) -> a + v))"
    def body(r: Int): String = {
      val resid = s"(y - (1.0 / (1.0 + exp(-z))))"
      s"""z$r AS MATERIALIZED (SELECT y, x, ${z(r)} AS z
         |  FROM f, w${r - 1} pw),
         |g$r AS MATERIALIZED (SELECT count(*)::BIGINT AS n,
         |    coalesce(sum(CASE WHEN ((z >= 0) AND y = 1.0)
         |      OR ((z < 0) AND y = 0.0) THEN 1 ELSE 0 END), 0)::BIGINT
         |      AS ncorr,
         |    coalesce(sum(CAST(round(($resid) * 1000000000.0) AS BIGINT)),
         |      0)::BIGINT AS gb
         |  FROM z$r),
         |gj$r AS MATERIALIZED (SELECT list(gj ORDER BY j) AS gl FROM (
         |  SELECT j, coalesce(sum(CAST(round((x[j + 1] * $resid)
         |      * 1000000000.0) AS BIGINT)), 0)::BIGINT AS gj
         |  FROM z$r CROSS JOIN range(0, $HlrBuckets) t(j) GROUP BY j)),
         |w$r AS (SELECT
         |    pw.bi + $HlrLr * ((g.gb::DOUBLE / 1000000000.0) / g.n) AS bi,
         |    list_transform(range(1, ${HlrBuckets + 1}), i ->
         |      list_extract(pw.wl, i)
         |        + $HlrLr * ((list_extract(gj.gl, i)::DOUBLE
         |          / 1000000000.0) / g.n)) AS wl
         |  FROM w${r - 1} pw, g$r g, gj$r gj)"""
        .stripMargin
    }
    val wn = s"sqrt(list_reduce(list_transform(range(1, ${HlrBuckets + 1}), " +
      "i -> wl[i] * wl[i]), (a, b) -> a + b))"
    val rounds = (1 to HlrRounds).map(r =>
      s"SELECT $r::BIGINT AS round, (SELECT ncorr FROM g$r) AS n_correct, " +
        s"${DuckSql.roundpSql("bi", 6)} AS bias, " +
        s"${DuckSql.roundpSql(wn, 6)} AS w_norm " +
        s"FROM w$r WHERE (SELECT n FROM g1) > 0").mkString("\nUNION ALL ")
    s"""WITH f AS (SELECT y, list_transform(range(0, $HlrBuckets), j ->
       |    len(list_filter(hs, h -> h = j))::DOUBLE / nt) AS x
       |  FROM (SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
       |      list_transform(ws, wd -> $hash % $HlrBuckets) AS hs,
       |      len(ws) AS nt
       |    FROM (SELECT lang, $ws AS ws FROM documents)
       |    WHERE len(ws) >= 1)),
       |w0 AS (SELECT 0.0::DOUBLE AS bi,
       |  list_transform(range(0, $HlrBuckets), j -> 0.0::DOUBLE) AS wl),
       |${(1 to HlrRounds).map(body).mkString(",\n")}
       |$rounds
       |ORDER BY round""".stripMargin
  }

  // ---------------------------------------------------------------- q247

  private val NdcgQueries = 20
  private val NdcgK = 10
  /** Rank discounts 1/log₂(r+1) for r = 1..10 and their cumulative sums,
    * computed ONCE on the driver and embedded as literals in BOTH
    * engines — no ln() parity risk (JVM Math.log and libm may differ in
    * the last ulp; a literal can't). Double.toString round-trips, so the
    * SQL literals parse back to the identical doubles. */
  private val NdcgDisc: Array[Double] =
    Array.tabulate(NdcgK)(i => 1.0 / (math.log(i + 2.0) / math.log(2.0)))
  private val NdcgCum: Array[Double] = NdcgDisc.scanLeft(0.0)(_ + _)

  /** q247: retrieval evaluation — nDCG@10 and MRR of brute-force cosine
    * retrieval against label-match relevance, per query. The eval layer
    * of the ANN family (q31/q32/q40/...): given the first 20 vectors as
    * queries, rank the rest of the corpus by rounded cosine and score
    * the ranking. Scale shape: queries fold back as literals (bounded
    * category), scoring is one pass with a k-BOUNDED native TopKScore
    * aggregate per query — no global sort, no join, state = 20·k cells.
    * Candidate ids pack relevance into the low bit (cid·2+rel), which
    * preserves the (cos DESC, cid ASC) tie order because ids are
    * unique. DCG terms quantize to nano-units before the ≤10-term sum;
    * discounts and ideal-DCG prefixes are shared literals. */
  def q247NdcgRetrieval(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = embeddings(s, d)
    val qs: Array[(Long, Array[Float], Int)] = emb
      .filter($"vec_id" < NdcgQueries)
      .select($"vec_id".cast("long"), $"embedding", $"label")
      .as[(Long, Array[Float], Int)].collect().sortBy(_._1)
    if (qs.isEmpty)
      return Seq.empty[(Long, Long, Double, Double)]
        .toDF("qid", "n_rel", "ndcg10", "mrr")
    val na = sqrt(graft.functions.DotProductF32.dot($"embedding", $"embedding"))
    val scored = array(qs.map { case (qid, qv, qlab) =>
      val nq = math.sqrt(qv.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
      struct(
        lit(qid).as("qid"),
        roundp(graft.functions.DotProductF32.dot($"embedding", typedlit(qv)) /
          ($"na" * lit(nq)), 6).as("cos"),
        (lit(qlab) === $"label").cast("long").as("rel"))
    }: _*)
    val perQuery = emb
      .select($"vec_id".cast("long").as("vec_id"), $"embedding", $"label",
        na.as("na"))
      .select($"vec_id", explode(scored).as("sc"))
      .filter($"vec_id" =!= $"sc.qid")
      .groupBy($"sc.qid".as("qid"))
      .agg(
        graft.functions.TopKScore($"vec_id" * 2 + $"sc.rel", $"sc.cos", NdcgK)
          .as("topk"),
        sum($"sc.rel").as("n_rel"))
    val dcgTerm = round((($"e.cid" % 2).cast("double") *
      element_at(lit(NdcgDisc), $"pos" + 1)) * lit(1000000000.0)).cast("long")
    perQuery
      .select($"qid", $"n_rel", posexplode_outer($"topk").as(Seq("pos", "e")))
      .groupBy($"qid", $"n_rel")
      .agg(
        coalesce(sum(dcgTerm), lit(0L)).as("dcgq"),
        min(when($"e.cid" % 2 === 1, $"pos" + 1)).as("fr"))
      .select($"qid", $"n_rel",
        roundp(when($"n_rel" === 0, lit(0.0)).otherwise(
          ($"dcgq".cast("double") / lit(1000000000.0)) /
            element_at(lit(NdcgCum),
              (least($"n_rel", lit(NdcgK.toLong)) + 1).cast("int"))), 6)
          .as("ndcg10"),
        roundp(coalesce(lit(1.0) / $"fr", lit(0.0)), 6).as("mrr"))
      .orderBy($"qid")
  }

  val q247Sql: String = {
    val disc = NdcgDisc.mkString("[", ", ", "]")
    val cum = NdcgCum.mkString("[", ", ", "]")
    val cos = DuckSql.cosineSql("e.embedding", "q.qv", 64)
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv, label AS qlab
       |  FROM embeddings WHERE vec_id < $NdcgQueries),
       |sc AS (SELECT q.qid, e.vec_id AS cand,
       |    ${DuckSql.roundpSql(cos, 6)} AS cos,
       |    CASE WHEN e.label = q.qlab THEN 1 ELSE 0 END AS rel
       |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid),
       |nr AS (SELECT qid, sum(rel)::BIGINT AS n_rel FROM sc GROUP BY qid),
       |rk AS (SELECT qid, rel, row_number() OVER (PARTITION BY qid
       |    ORDER BY cos DESC, cand * 2 + rel) AS rank FROM sc),
       |agg AS (SELECT qid,
       |    coalesce(sum(CAST(round((rel::DOUBLE * ($disc)[rank])
       |      * 1000000000.0) AS BIGINT)), 0)::BIGINT AS dcgq,
       |    min(CASE WHEN rel = 1 THEN rank END) AS fr
       |  FROM rk WHERE rank <= $NdcgK GROUP BY qid)
       |SELECT nr.qid, nr.n_rel,
       |  ${DuckSql.roundpSql(
            s"CASE WHEN nr.n_rel = 0 THEN 0.0 ELSE " +
            s"(agg.dcgq::DOUBLE / 1000000000.0) / " +
            s"($cum)[least(nr.n_rel, $NdcgK)::INT + 1] END", 6)} AS ndcg10,
       |  ${DuckSql.roundpSql("coalesce(1.0 / agg.fr, 0.0)", 6)} AS mrr
       |FROM nr JOIN agg ON nr.qid = agg.qid
       |ORDER BY nr.qid""".stripMargin
  }

  // ---------------------------------------------------------------- q248

  private val JlOut = 16
  private val JlIn = 64

  /** q248: JOHNSON-LINDENSTRAUSS projection audit — project every
    * embedding 64 → 16 dims through a deterministic ±1 sign matrix (an
    * Achlioptas 2003 database-friendly projection; signs from the
    * repo's LCG convention) and measure the norm distortion
    * (‖Px‖²/k)/‖x‖² per label. The go/no-go check before swapping full
    * vectors for sketches in the dedup/ANN family: mean distortion ≈ 1
    * with bounded spread means cosine decisions survive the projection.
    * One pass, no joins, no shuffle beyond the |labels|-group agg; the
    * sign matrix is 16×64 integers derived identically in both engines;
    * per-row distortion quantizes to nano-units before the mean. */
  def q248JlDistortion(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def signE(j: Int, dd: Column): Column =
      when(((lit(1103515245L) * (lit(j.toLong * JlIn) + dd) + lit(12345L))
        % lit(2147483648L)) >= lit(1073741824L), lit(1.0)).otherwise(lit(-1.0))
    val ys = (0 until JlOut).map { j =>
      aggregate(sequence(lit(0), lit(JlIn - 1)), lit(0.0), (acc, dd) =>
        acc + element_at($"embedding", (dd + 1).cast("int")).cast("double")
          * signE(j, dd)).as(s"_y$j")
    }
    val sumY2 = (0 until JlOut).foldLeft(lit(0.0)) { (a, j) =>
      a + col(s"_y$j") * col(s"_y$j")
    }
    val nrm2 = graft.functions.DotProductF32.dot($"embedding", $"embedding")
    val dist = ((sumY2 / lit(JlOut.toDouble)) / $"nrm2").as("dist")
    embeddings(s, d)
      .select($"label", $"embedding", nrm2.as("nrm2"))
      .filter($"nrm2" > 0.0)
      .select(($"label" +: ys :+ $"nrm2"): _*)
      .select($"label", dist)
      .groupBy($"label")
      .agg(count(lit(1)).as("n_vecs"),
        sum(round($"dist" * lit(1000000000.0)).cast("long")).as("dq"),
        min(roundp($"dist", 6)).as("min_d"),
        max(roundp($"dist", 6)).as("max_d"))
      .select($"label".cast("int").as("label"), $"n_vecs",
        roundp(($"dq".cast("double") / lit(1000000000.0)) / $"n_vecs", 6)
          .as("mean_distortion"),
        $"min_d".as("min_distortion"), $"max_d".as("max_distortion"))
      .orderBy($"label")
  }

  val q248Sql: String = {
    val sign = s"(CASE WHEN ((1103515245 * (j * $JlIn + d) + 12345) " +
      "% 2147483648) >= 1073741824 THEN 1.0 ELSE -1.0 END)"
    val proj = s"list_reduce(list_transform(range(0, $JlIn), " +
      s"d -> embedding[d + 1]::DOUBLE * $sign), (a, b) -> a + b)"
    val nrm2 = DuckSql.dotSeqSql("embedding", "embedding", JlIn)
    s"""WITH y AS (SELECT label,
       |    list_transform(range(0, $JlOut), j -> $proj) AS ys,
       |    $nrm2 AS nrm2
       |  FROM embeddings),
       |d AS (SELECT label,
       |    ((list_reduce(list_transform(range(1, ${JlOut + 1}),
       |        i -> ys[i] * ys[i]), (a, b) -> a + b) / ${JlOut.toDouble})
       |      / nrm2) AS dist
       |  FROM y WHERE nrm2 > 0.0)
       |SELECT label, count(*)::BIGINT AS n_vecs,
       |  ${DuckSql.roundpSql(
            "(sum(CAST(round(dist * 1000000000.0) AS BIGINT))::DOUBLE " +
            "/ 1000000000.0) / count(*)", 6)} AS mean_distortion,
       |  min(${DuckSql.roundpSql("dist", 6)}) AS min_distortion,
       |  max(${DuckSql.roundpSql("dist", 6)}) AS max_distortion
       |FROM d GROUP BY label ORDER BY label""".stripMargin
  }

  // ---------------------------------------------------------------- q249

  private val PqS = 4      // subspaces (16 dims each)
  private val PqDim = 16
  private val PqK = 4      // centroids per subspace
  private val PqRounds = 2
  private val PqScale = 100000000.0 // the q239 centroid-sum quantization

  /** q249: full-corpus PRODUCT-QUANTIZATION codebook training (Jégou et
    * al. 2011) — the training half of the q45/q49 PQ/IVFADC indexes,
    * which encode against a codebook trained on a driver-side sample;
    * this is the full-corpus form: independent k-means per 16-dim
    * subspace, ALL FOUR subspaces advanced by ONE job per Lloyd round.
    * The q239 contract throughout — assignments are per-row
    * least(struct(d2, j)) over literal centroids (distances materialize
    * as named columns first: struct over lambda-bearing HOF children
    * loses field names in analysis), updates are (subspace, cid, dim)
    * sums of 10⁸-quantized integers (4·4·16 = 256 bounded rows), empty
    * cells carry their previous centroid, inertia quantizes to
    * micro-units. Driver state: 4×4×16 doubles however large the
    * corpus. */
  def q249PqTrain(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = graft.ops.ScratchCache.register(
      embeddings(s, d).select($"vec_id", $"embedding").persist())
    val init: Array[Array[Float]] = emb.orderBy($"vec_id").limit(PqK)
      .collect().map(_.getSeq[Float](1).toArray)
    if (init.isEmpty) {
      graft.ops.ScratchCache.releaseAll()
      return Seq.empty[(Int, Int, Long, Long, Double)]
        .toDF("subspace", "cid", "n_members", "inertia_q", "centroid_norm")
    }
    val k = init.length
    def d2(a: Column, cv: Array[Double]): Column =
      aggregate(zip_with(a, lit(cv), (x, y) =>
          (x.cast("double") - y) * (x.cast("double") - y)),
        lit(0.0), (acc, v) => acc + v)
    // cents(ss)(j) = subvector ss of the j-th lowest vec_id
    val cents: Array[Array[Array[Double]]] = Array.tabulate(PqS, k) {
      (ss, j) => init(j).slice(ss * PqDim, (ss + 1) * PqDim).map(_.toDouble)
    }
    var last: Array[org.apache.spark.sql.Row] = Array.empty
    for (_ <- 1 to PqRounds) {
      val dcols = for { ss <- 0 until PqS; j <- 0 until k } yield
        d2(slice($"embedding", ss * PqDim + 1, PqDim), cents(ss)(j))
          .as(s"_d${ss}_$j")
      val scols = (0 until PqS).map(ss =>
        slice($"embedding", ss * PqDim + 1, PqDim).as(s"_sub$ss"))
      val p1 = emb.select(($"embedding" +: dcols) ++ scols: _*)
      val structs = (0 until PqS).map { ss =>
        val cands = (0 until k).map(j =>
          struct(col(s"_d${ss}_$j").as("d"), lit(j).as("j")))
        val m = if (cands.length == 1) cands.head else least(cands: _*)
        struct(lit(ss).as("ss"), m.getField("j").as("cid"),
          m.getField("d").as("d2"), col(s"_sub$ss").as("sub"))
      }
      last = p1.select(explode(array(structs: _*)).as("e"))
        .select($"e.ss".as("ss"), $"e.cid".as("cid"), $"e.d2".as("d2"),
          posexplode($"e.sub").as(Seq("p", "v")))
        .groupBy($"ss", $"cid", $"p")
        .agg(
          sum(round($"v".cast("double") * lit(PqScale)).cast("long")).as("sq"),
          count(lit(1)).as("cnt"),
          sum(when($"p" === 0, round($"d2" * lit(1000000.0)).cast("long"))
            .otherwise(lit(0L))).as("iq"))
        .collect()
      val byCell = last.groupBy(r => (r.getInt(0), r.getInt(1)))
      for (ss <- 0 until PqS; j <- 0 until k)
        byCell.get((ss, j)).foreach { rs =>
          cents(ss)(j) = rs.sortBy(_.getInt(2))
            .map(r => r.getLong(3).toDouble / (PqScale * r.getLong(4)))
        }
    }
    val out = last.groupBy(r => (r.getInt(0), r.getInt(1))).toSeq
      .map { case ((ss, cid), rs) =>
        val n = rs.head.getLong(4)
        val iq = rs.map(_.getLong(5)).sum // only the p=0 row is nonzero
        val norm = math.sqrt(
          cents(ss)(cid).foldLeft(0.0)((acc, x) => acc + x * x))
        (ss, cid, n, iq, norm)
      }
    graft.ops.ScratchCache.releaseAll()
    out.toDF("subspace", "cid", "n_members", "inertia_q", "normr")
      .select($"subspace", $"cid", $"n_members", $"inertia_q",
        roundp($"normr", 6).as("centroid_norm"))
      .orderBy($"subspace", $"cid")
  }

  /** Unrolled round-for-round replay with a subspace key on every q239
    * CTE: same init order, same sequential distance folds, same
    * quantization points, same per-(subspace, cid) empty-cell carry. */
  val q249Sql: String = {
    def dd2(v: String, cv: String): String =
      s"list_reduce(list_transform(range(1, ${PqDim + 1}), i -> " +
        s"(($v)[i]::DOUBLE - ($cv)[i]) * (($v)[i]::DOUBLE - ($cv)[i])), " +
        "(x, y) -> x + y)"
    def round_(r: Int): String =
      s"""a$r AS (SELECT vec_id, s, any_value(sub) AS sub,
         |    min(struct_pack(d := ${dd2("sub", "c.cv")}, j := c.cid)) AS m
         |  FROM es JOIN c${r - 1} c USING (s) GROUP BY vec_id, s),
         |u$r AS (SELECT s, m.j AS cid, g.p,
         |    sum(CAST(round(sub[g.p + 1]::DOUBLE * $PqScale) AS BIGINT))
         |      ::BIGINT AS sq,
         |    count(*)::BIGINT AS cnt,
         |    sum(CASE WHEN g.p = 0
         |      THEN CAST(round(m.d * 1000000.0) AS BIGINT)
         |      ELSE 0 END)::BIGINT AS iq
         |  FROM a$r CROSS JOIN generate_series(0, ${PqDim - 1}) g(p)
         |  GROUP BY 1, 2, 3),
         |c$r AS (SELECT s, cid, list(sq::DOUBLE / ($PqScale * cnt)
         |      ORDER BY p) AS cv
         |    FROM u$r GROUP BY s, cid
         |  UNION ALL SELECT s, cid, cv FROM c${r - 1} pc
         |    WHERE NOT EXISTS (SELECT 1 FROM u$r
         |      WHERE u$r.s = pc.s AND u$r.cid = pc.cid))""".stripMargin
    val normSql = s"sqrt(list_reduce(list_transform(range(1, ${PqDim + 1}), " +
      "i -> cv[i] * cv[i]), (x, y) -> x + y))"
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       |es AS (SELECT vec_id, s,
       |    embedding[s * $PqDim + 1 : s * $PqDim + $PqDim] AS sub
       |  FROM e CROSS JOIN range(0, $PqS) t(s)),
       |c0 AS (SELECT s,
       |    row_number() OVER (PARTITION BY s ORDER BY vec_id) - 1 AS cid,
       |    list_transform(sub, x -> x::DOUBLE) AS cv
       |  FROM es WHERE vec_id IN
       |    (SELECT vec_id FROM e ORDER BY vec_id LIMIT $PqK)),
       |${(1 to PqRounds).map(round_).mkString(",\n")},
       |f AS (SELECT s, cid, max(cnt) AS n_members,
       |    sum(iq)::BIGINT AS inertia_q
       |  FROM u$PqRounds GROUP BY s, cid)
       |SELECT f.s::INT AS subspace, f.cid::INT AS cid, f.n_members,
       |  f.inertia_q, ${DuckSql.roundpSql(normSql, 6)} AS centroid_norm
       |FROM f JOIN c$PqRounds c ON f.s = c.s AND f.cid = c.cid
       |ORDER BY f.s, f.cid""".stripMargin
  }

  // ---------------------------------------------------------------- q250

  private val IsoBins = 64

  /** q250: ISOTONIC CALIBRATION of a document score (the PAVA step every
    * quality-classifier pipeline runs before thresholding: map raw score
    * → monotone empirical P(label | score)). Scale shape: the corpus
    * collapses into 64 BOUNDED score bins by one aggregation (integer
    * (n, Σy) cells); the isotonic fit is driver math over ≤64 bins via
    * the minimax characterization iso(i) = max_{j≤i} min_{k≥i}
    * avg(y over bins j..k) — equivalent to pool-adjacent-violators but
    * expressible identically in SQL (a ≤64³ bounded triple join), so the
    * oracle replays the exact fit instead of trusting a driver loop.
    * Averages are doubles of exact integer prefix sums; min/max are
    * order-free, so parity is structural. */
  def q250IsotonicCalibration(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bins = documents(s, d)
      .select($"lang", tokens($"text").as("ws"))
      .filter(size($"ws") >= 1)
      .select(
        least(floor((size(array_distinct($"ws")).cast("double") /
          size($"ws")) * lit(IsoBins.toDouble)).cast("int"),
          lit(IsoBins - 1)).as("bin"),
        when($"lang" === "en", 1L).otherwise(0L).as("y"))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n"), sum($"y").as("sy"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    if (bins.isEmpty)
      return Seq.empty[(Int, Long, Double, Double)]
        .toDF("bin", "n", "raw_rate", "iso_rate")
    val cn = bins.map(_._2).scanLeft(0L)(_ + _)
    val cs = bins.map(_._3).scanLeft(0L)(_ + _)
    val m = bins.length
    def avg(j: Int, k: Int): Double = // over occupied bins j..k (0-based)
      (cs(k + 1) - cs(j)).toDouble / (cn(k + 1) - cn(j)).toDouble
    def r6(x: Double) = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1e6 + 0.0
    val iso = Array.tabulate(m) { i =>
      (0 to i).map(j => (i until m).map(k => avg(j, k)).min).max
    }
    bins.zipWithIndex.map { case ((b, n, sy), i) =>
      (b, n, r6(sy.toDouble / n.toDouble), r6(iso(i)))
    }.toSeq.toDF("bin", "n", "raw_rate", "iso_rate").orderBy($"bin")
  }

  val q250Sql: String = {
    val ws = DuckSql.tokensSql
    s"""WITH f AS (SELECT
       |    least(floor((len(list_distinct(ws))::DOUBLE / len(ws))
       |      * ${IsoBins.toDouble})::INT, ${IsoBins - 1}) AS bin,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
       |  FROM (SELECT lang, $ws AS ws FROM documents) WHERE len(ws) >= 1),
       |bins AS (SELECT bin, count(*)::BIGINT AS n, sum(y)::BIGINT AS sy
       |  FROM f GROUP BY bin),
       |pre AS (SELECT bin, n, sy,
       |    sum(n) OVER (ORDER BY bin) AS cn, sum(sy) OVER (ORDER BY bin) AS cs
       |  FROM bins),
       |segs AS (SELECT j.bin AS jb, k.bin AS kb,
       |    (k.cs - (j.cs - j.sy))::DOUBLE / (k.cn - (j.cn - j.n))::DOUBLE
       |      AS av
       |  FROM pre j JOIN pre k ON j.bin <= k.bin),
       |mm AS (SELECT i.bin, s.jb, min(s.av) AS mn
       |  FROM pre i JOIN segs s ON s.jb <= i.bin AND s.kb >= i.bin
       |  GROUP BY i.bin, s.jb),
       |iso AS (SELECT bin, max(mn) AS iso FROM mm GROUP BY bin)
       |SELECT b.bin, b.n,
       |  ${DuckSql.roundpSql("b.sy::DOUBLE / b.n::DOUBLE", 6)} AS raw_rate,
       |  ${DuckSql.roundpSql("i.iso", 6)} AS iso_rate
       |FROM bins b JOIN iso i USING (bin) ORDER BY b.bin""".stripMargin
  }

  // ---------------------------------------------------------------- q251

  private val CupedSplit = "2024-01-16 00:00:00"

  /** Winsorization cap for q251's per-user totals, in raw value units
    * (10,000 — far above any plausible honest user; sf0.1's max total
    * is ~3.3k). Capping BEFORE the moment pass is standard CUPED
    * practice for heavy-user robustness AND what keeps every quantized
    * moment per-ROW bounded (q241's discipline): without it a single
    * bot user's x² term can overflow the Long sum on its own — Spark
    * would wrap silently while the twin's HUGEINT→BIGINT cast errors,
    * the q239 divergence class. */
  private val CupedCap = 10000.0
  private val CupedCapQ = 10000000000L // the cap in micro units

  /** q251: CUPED variance-reduced A/B readout (Deng et al. 2013, "Improving
    * the Sensitivity of Online Controlled Experiments") over the events
    * table: per-user pre-period activity is the covariate, post-period
    * value the metric, θ = cov(x,y)/var(x) fitted POOLED over
    * winsorized user totals, each arm's mean adjusted by θ·(x̄_g − x̄).
    * The experiment-readout primitive a pipeline runs after
    * q137/q169-style mixture changes. Scale shape: one shuffle to
    * per-user integer sums (micro-quantized per ROW, so user totals are
    * exact integers; per-event ≤1e8 units → ~9e10-event headroom), then
    * winsorize at [[CupedCap]] so every user-level moment is row-bounded:
    * first moments quantize at 1e2 (≤1e6/row → ~9e12-user headroom),
    * second moments at 1 (≤1e8/row → ~9e10 users). One bounded 2-group
    * aggregation, driver math over 2×5 cells. */
  def q251Cuped(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = graft.Tables.events(s, d)
    val split = lit(java.sql.Timestamp.valueOf(CupedSplit))
    val vq = round($"value" * lit(1000000.0)).cast("long")
    val users = ev.groupBy($"user_id")
      .agg(
        coalesce(sum(when($"ts" < split, vq).otherwise(lit(0L))), lit(0L))
          .as("uxq"),
        coalesce(sum(when($"ts" >= split, vq).otherwise(lit(0L))), lit(0L))
          .as("uyq"))
    val x = least($"uxq", lit(CupedCapQ)).cast("double") / lit(1000000.0)
    val y = least($"uyq", lit(CupedCapQ)).cast("double") / lit(1000000.0)
    val g = users
      .select(($"user_id" % 2).as("grp"),
        round(x * lit(100.0)).cast("long").as("sxq"),
        round(y * lit(100.0)).cast("long").as("syq"),
        round(x * y).cast("long").as("pxy"),
        round(x * x).cast("long").as("pxx"))
      .groupBy($"grp")
      .agg(count(lit(1)).as("n"), sum($"sxq").as("sx"), sum($"syq").as("sy"),
        sum($"pxy").as("sxy"), sum($"pxx").as("sxx"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    if (g.isEmpty)
      return Seq.empty[(Long, Long, Double, Double, Double)]
        .toDF("grp", "n_users", "mean_post", "mean_adj", "theta")
    val nAll = g.map(_._2).sum
    val mxAll = (g.map(_._3).sum.toDouble / 100.0) / nAll
    val myAll = (g.map(_._4).sum.toDouble / 100.0) / nAll
    val theta = (g.map(_._5).sum.toDouble / nAll - mxAll * myAll) /
      (g.map(_._6).sum.toDouble / nAll - mxAll * mxAll)
    // rounding is PLAN-side roundp, not driver BigDecimal: a zero-
    // variance covariate makes θ NaN, and the q241 singular contract is
    // non-finite output in both engines, never a crash (BigDecimal(NaN)
    // throws). DuckDB's 0/0 is NULL, not NaN, so the twin's theta wraps
    // the divide in CASE WHEN var = 0 THEN 'NaN'::DOUBLE — the engines
    // agree on the singular corner byte-for-byte.
    g.map { case (grp, n, sx, sy, _, _) =>
      val mx = (sx.toDouble / 100.0) / n
      val my = (sy.toDouble / 100.0) / n
      (grp, n, my, my - theta * (mx - mxAll), theta)
    }.toSeq.toDF("grp", "n_users", "mpr", "mar", "thr")
      .select($"grp", $"n_users", roundp($"mpr", 6).as("mean_post"),
        roundp($"mar", 6).as("mean_adj"), roundp($"thr", 6).as("theta"))
      .orderBy($"grp")
  }

  val q251Sql: String =
    s"""WITH u AS (SELECT user_id,
       |    coalesce(sum(CASE WHEN ts < TIMESTAMP '$CupedSplit'
       |      THEN CAST(round(value * 1000000.0) AS BIGINT) ELSE 0 END), 0)
       |      ::BIGINT AS uxq,
       |    coalesce(sum(CASE WHEN ts >= TIMESTAMP '$CupedSplit'
       |      THEN CAST(round(value * 1000000.0) AS BIGINT) ELSE 0 END), 0)
       |      ::BIGINT AS uyq
       |  FROM events GROUP BY user_id),
       |w AS (SELECT user_id,
       |    least(uxq, $CupedCapQ)::DOUBLE / 1000000.0 AS x,
       |    least(uyq, $CupedCapQ)::DOUBLE / 1000000.0 AS y
       |  FROM u),
       |g AS (SELECT user_id % 2 AS grp, count(*)::BIGINT AS n,
       |    sum(CAST(round(x * 100.0) AS BIGINT))::BIGINT AS sx,
       |    sum(CAST(round(y * 100.0) AS BIGINT))::BIGINT AS sy,
       |    sum(CAST(round(x * y) AS BIGINT))::BIGINT AS sxy,
       |    sum(CAST(round(x * x) AS BIGINT))::BIGINT AS sxx
       |  FROM w GROUP BY 1),
       |t AS (SELECT sum(n) AS na,
       |    (sum(sx)::DOUBLE / 100.0) / sum(n) AS mxa,
       |    (sum(sy)::DOUBLE / 100.0) / sum(n) AS mya,
       |    CASE WHEN ((sum(sxx)::DOUBLE / sum(n))
       |        - ((sum(sx)::DOUBLE / 100.0) / sum(n))
       |          * ((sum(sx)::DOUBLE / 100.0) / sum(n))) = 0
       |      THEN 'NaN'::DOUBLE
       |      ELSE ((sum(sxy)::DOUBLE / sum(n))
       |        - ((sum(sx)::DOUBLE / 100.0) / sum(n))
       |          * ((sum(sy)::DOUBLE / 100.0) / sum(n))) /
       |      ((sum(sxx)::DOUBLE / sum(n))
       |        - ((sum(sx)::DOUBLE / 100.0) / sum(n))
       |          * ((sum(sx)::DOUBLE / 100.0) / sum(n))) END AS theta
       |  FROM g)
       |SELECT g.grp, g.n AS n_users,
       |  ${DuckSql.roundpSql("(g.sy::DOUBLE / 100.0) / g.n", 6)}
       |    AS mean_post,
       |  ${DuckSql.roundpSql(
            "((g.sy::DOUBLE / 100.0) / g.n) - t.theta * " +
            "(((g.sx::DOUBLE / 100.0) / g.n) - t.mxa)", 6)} AS mean_adj,
       |  ${DuckSql.roundpSql("t.theta", 6)} AS theta
       |FROM g, t ORDER BY g.grp""".stripMargin

  // ---------------------------------------------------------------- q252

  /** q252: SIMPSON'S-PARADOX audit — per-source regression slope of
    * lexical diversity on scaled token count vs the pooled slope, with a
    * sign-flip flag. The aggregation-bias check a corpus report runs
    * before quoting any pooled correlation (q217/q187's pitfall): a
    * pooled trend can invert inside every stratum. One pass of per-row
    * 10⁸-quantized moments grouped by source (q241's moment discipline);
    * pooled moments are the integer sums of the group cells, so both
    * slopes are driver math over the same exact integers. */
  def q252SimpsonAudit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val Q = 100000000.0
    def mq(c: Column) = sum(round(c * lit(Q)).cast("long"))
    val g = documents(s, d)
      .select($"source", tokens($"text").as("ws"))
      .filter(size($"ws") >= 1)
      .select($"source",
        (size($"ws").cast("double") * lit(0.01)).as("x"),
        (size(array_distinct($"ws")).cast("double") / size($"ws")).as("yv"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n"), mq($"x").as("sx"), mq($"yv").as("sy"),
        mq($"x" * $"yv").as("sxy"), mq($"x" * $"x").as("sxx"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    if (g.isEmpty)
      return Seq.empty[(String, Long, Double, Double, Long)]
        .toDF("source", "n", "slope", "pooled_slope", "sign_flip")
    def slope(n: Long, sx: Long, sy: Long, sxy: Long, sxx: Long): Double = {
      val (mx, my) = ((sx.toDouble / Q) / n, (sy.toDouble / Q) / n)
      ((sxy.toDouble / Q) / n - mx * my) / ((sxx.toDouble / Q) / n - mx * mx)
    }
    val pooled = slope(g.map(_._2).sum, g.map(_._3).sum, g.map(_._4).sum,
      g.map(_._5).sum, g.map(_._6).sum)
    // plan-side roundp (q241 singular contract): a zero-variance source
    // yields a NaN slope in both engines — driver BigDecimal would throw
    g.map { case (src, n, sx, sy, sxy, sxx) =>
      val sl = slope(n, sx, sy, sxy, sxx)
      (src, n, sl, pooled, if (sl * pooled < 0.0) 1L else 0L)
    }.toSeq.toDF("source", "n", "slr", "plr", "sign_flip")
      .select($"source", $"n", roundp($"slr", 6).as("slope"),
        roundp($"plr", 6).as("pooled_slope"), $"sign_flip")
      .orderBy($"source")
  }

  val q252Sql: String = {
    val ws = DuckSql.tokensSql
    def mq(t: String) =
      s"sum(CAST(round(($t) * 100000000.0) AS BIGINT))::BIGINT"
    // CASE guard: DuckDB's 0/0 is NULL, not NaN — the zero-variance
    // corner must produce NaN to match the Spark driver math (q251's fix)
    val varx = "(((sxx::DOUBLE / 100000000.0) / n) - " +
      "((sx::DOUBLE / 100000000.0) / n) * ((sx::DOUBLE / 100000000.0) / n))"
    val slope = s"(CASE WHEN $varx = 0 THEN 'NaN'::DOUBLE ELSE " +
      "(((sxy::DOUBLE / 100000000.0) / n) - " +
      "((sx::DOUBLE / 100000000.0) / n) * ((sy::DOUBLE / 100000000.0) / n))" +
      s" / $varx END)"
    s"""WITH f AS (SELECT source, len(ws)::DOUBLE * 0.01 AS x,
       |    len(list_distinct(ws))::DOUBLE / len(ws) AS yv
       |  FROM (SELECT source, $ws AS ws FROM documents) WHERE len(ws) >= 1),
       |g AS (SELECT source, count(*)::BIGINT AS n, ${mq("x")} AS sx,
       |    ${mq("yv")} AS sy, ${mq("x * yv")} AS sxy, ${mq("x * x")} AS sxx
       |  FROM f GROUP BY source),
       |p AS (SELECT sum(n)::BIGINT AS n, sum(sx)::BIGINT AS sx,
       |    sum(sy)::BIGINT AS sy, sum(sxy)::BIGINT AS sxy,
       |    sum(sxx)::BIGINT AS sxx FROM g),
       |ps AS (SELECT $slope AS pooled FROM p)
       |SELECT g.source, g.n, ${DuckSql.roundpSql(slope, 6)} AS slope,
       |  ${DuckSql.roundpSql("ps.pooled", 6)} AS pooled_slope,
       |  CASE WHEN ($slope) * ps.pooled < 0.0 THEN 1::BIGINT
       |    ELSE 0::BIGINT END AS sign_flip
       |FROM g, ps ORDER BY g.source""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q250_isotonic_calibration" -> (q250IsotonicCalibration _),
    "q251_cuped" -> (q251Cuped _),
    "q252_simpson_audit" -> (q252SimpsonAudit _),
    "q245_bootstrap_ci" -> (q245BootstrapCi _),
    "q246_hashed_lr" -> (q246HashedLr _),
    "q247_ndcg" -> (q247NdcgRetrieval _),
    "q248_jl_distortion" -> (q248JlDistortion _),
    "q249_pq_train" -> (q249PqTrain _))

  val oracles: Map[String, String] = Map(
    "q250_isotonic_calibration" -> q250Sql,
    "q251_cuped" -> q251Sql,
    "q252_simpson_audit" -> q252Sql,
    "q245_bootstrap_ci" -> q245Sql,
    "q246_hashed_lr" -> q246Sql,
    "q247_ndcg" -> q247Sql,
    "q248_jl_distortion" -> q248Sql,
    "q249_pq_train" -> q249Sql)
}
