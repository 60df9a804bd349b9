package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.embeddings
import graft.functions.VectorFunctions
import graft.functions.TextFunctions.roundp
import graft.ops.Similarity

/** Similarity-search coverage: exact brute-force cosine top-k (oracle
  * hash-matched bit-for-bit via the sequential-dot parity form) and the
  * LSH-bucketed ANN scale path (approximate ⇒ rows-only for the driver;
  * recall vs brute force is property-tested in SimilaritySpec).
  */
object SimilarityQueries {

  /** q30: embedding near-duplicate pairs, cosine ≥ 0.4 (data max ≈ 0.51). */
  def q30NearDup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Similarity.nearDupPairs(embeddings(s, d), "vec_id", "embedding", 0.4, nCells = 32)
      .orderBy($"id_a", $"id_b")
  }

  val q30Sql: String =
    s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |  ${DuckSql.roundpSql(DuckSql.cosineSql("a.embedding", "b.embedding", 64), 6)}
       |    AS cos
       |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |WHERE ${DuckSql.roundpSql(DuckSql.cosineSql("a.embedding", "b.embedding", 64), 6)}
       |  >= 0.4
       |ORDER BY id_a, id_b""".stripMargin

  /** q31: exact cosine top-5 for the first 20 vectors as queries —
    * broadcast query side, corpus streams, bounded per-query window. */
  def q31KnnBrute(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Similarity.knnBrute(embeddings(s, d), "vec_id", "embedding",
        $"vec_id" < 20, k = 5)
      .select($"qid", $"rank".cast("bigint").as("rank"), $"cid", $"cos")
      .orderBy($"qid", $"rank")
  }

  val q31Sql: String =
    s"""WITH scored AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS cid,
       |    ${DuckSql.roundpSql(DuckSql.cosineSql("q.embedding", "c.embedding", 64), 6)}
       |      AS cos
       |  FROM embeddings q JOIN embeddings c
       |    ON q.vec_id < 20 AND c.vec_id <> q.vec_id)
       |SELECT qid, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid)
       |    AS rank, cid, cos
       |FROM scored
       |QUALIFY rank <= 5
       |ORDER BY qid, rank""".stripMargin

  /** q32: LSH-bucketed ANN top-5 (4 hyperplane bits × 8 tables) — the scale
    * path. The LSH is fully deterministic (LCG hyperplanes), so the oracle
    * replays the ENTIRE ANN — signatures, bucket-join candidates, exact
    * cosine re-rank — in DuckDB and the driver hash-matches the real
    * pruned output bit-for-bit. Recall (<1 by construction) is additionally
    * property-tested vs brute force in DedupSpec. */
  def q32KnnLsh(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Similarity.knnLsh(embeddings(s, d), "vec_id", "embedding",
        $"vec_id" < 20, k = 5)
      .select($"qid", $"rank".cast("bigint").as("rank"), $"cid", $"cos")
      .orderBy($"qid", $"rank")
  }

  /** The DuckDB twin of the whole LSH path (knnLsh defaults: nPlanes=4,
    * nTables=8, nDims=64). */
  val q32Sql: String = {
    val bucket = DuckSql.lshBucketSql("e.embedding", "t.tbl", 4, 64)
    s"""WITH sig AS (
       |  SELECT e.vec_id, t.tbl, $bucket AS bucket
       |  FROM embeddings e, (SELECT unnest(range(0, 8)) AS tbl) t),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cid
       |  FROM sig q JOIN sig c ON q.tbl = c.tbl AND q.bucket = c.bucket
       |  WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id),
       |scored AS (
       |  SELECT cand.qid, cand.cid,
       |    ${DuckSql.roundpSql(DuckSql.cosineSql("qe.embedding", "ce.embedding", 64), 6)}
       |      AS cos
       |  FROM cand JOIN embeddings qe ON qe.vec_id = cand.qid
       |            JOIN embeddings ce ON ce.vec_id = cand.cid)
       |SELECT qid, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid)
       |    AS rank, cid, cos
       |FROM scored QUALIFY rank <= 5 ORDER BY qid, rank""".stripMargin
  }

  /** Recall-metric form for the k-means-seeded ANN paths (IVF/PQ): the
    * centroids are deterministic but NOT SQL-expressible (unlike q32's LCG
    * hyperplanes), so the oracle can't replay the candidate sets. Instead
    * the query itself measures its ANN output against in-engine brute
    * force and emits per query point (qid, n_results, mean_recall_ok);
    * the oracle derives the expected row set from the embeddings table
    * (every query point, exactly k results, mean recall over the floor).
    * A bucketing/routing/ADC regression collapses recall to ~0 and fails
    * the hash gate. `floor` is sized for the synthetic near-uniform
    * embeddings (the hardest case for ANN: measured means 0.45-0.75 at
    * sf0.01/sf0.1 vs floor 0.3); per-query floors would not be stable
    * across scale factors, means are. */
  private def recallMetric(ann: DataFrame, brute: DataFrame, k: Int,
                           floor: Double): DataFrame = {
    val a = graft.ops.ScratchCache.register(
      ann.select(col("qid"), col("cid")).persist())
    val perQ = a.groupBy(col("qid")).agg(count(lit(1)).as("n_results"))
    val hits = a.join(brute.select(col("qid"), col("cid")), Seq("qid", "cid"))
      .groupBy(col("qid")).agg(count(lit(1)).as("hits"))
    val withHits = perQ.join(hits, Seq("qid"), "left")
      .select(col("qid"), col("n_results"),
        coalesce(col("hits"), lit(0L)).as("hits"))
    val mean = withHits
      .agg((sum(col("hits")) / (count(lit(1)) * k)).as("mr"))
      .select((col("mr") >= floor).as("mean_recall_ok"))
    withHits.select(col("qid"), col("n_results"))
      .crossJoin(broadcast(mean))
      .orderBy(col("qid"))
  }

  private def recallOracleSql(k: Int): String =
    s"""SELECT vec_id AS qid, ${k}::BIGINT AS n_results, true AS mean_recall_ok
       |FROM embeddings WHERE vec_id < 20 ORDER BY qid""".stripMargin

  /** q40: IVF ANN top-5 (16 k-means cells, 4 probed) — the write-time-
    * partitioned scale path, gated through the recall-metric oracle. */
  def q40KnnIvf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    if (embeddings(s, d).isEmpty)
      return Seq.empty[(Long, Long, Boolean)]
        .toDF("qid", "n_results", "mean_recall_ok")
    val idx = graft.ops.IvfIndex.build(embeddings(s, d), "vec_id", "embedding", nCells = 16)
    recallMetric(
      graft.ops.IvfIndex.knn(idx, "vec_id", "embedding", $"vec_id" < 20,
        k = 5, nProbe = 4),
      Similarity.knnBrute(embeddings(s, d), "vec_id", "embedding",
        $"vec_id" < 20, k = 5),
      k = 5, floor = 0.3)
  }

  /** q45: product-quantization ANN top-5 (m=8 byte codes, ksub=64, exact
    * cosine re-rank of the top-20 ADC candidates) — the compressed-domain
    * scale path: queries scan 8-byte codes, not 256-byte vectors. Gated
    * through the recall-metric oracle (see recallMetric). */
  def q45KnnPq(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    if (embeddings(s, d).isEmpty)
      return Seq.empty[(Long, Long, Boolean)]
        .toDF("qid", "n_results", "mean_recall_ok")
    val idx = graft.ops.PqIndex.build(embeddings(s, d), "vec_id", "embedding",
      m = 8, ksub = 64)
    recallMetric(
      graft.ops.PqIndex.knn(idx, "vec_id", "embedding", $"vec_id" < 20, k = 5),
      Similarity.knnBrute(embeddings(s, d), "vec_id", "embedding",
        $"vec_id" < 20, k = 5),
      k = 5, floor = 0.3)
  }

  /** q49: IVF+PQ composite ANN in RESIDUAL mode (classic IVFADC): 16
    * coarse cells × m=8/ksub=64 codes quantizing per-cell residuals, 6
    * cells probed, exact re-rank. Both prunings at once — nProbe/nCells
    * of the corpus at m bytes/member — with the residual codebook's finer
    * quantization (spec-asserted ≤ flat ADC error). Gated through the
    * recall-metric oracle (see recallMetric). */
  def q49KnnIvfPq(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    if (embeddings(s, d).isEmpty)
      return Seq.empty[(Long, Long, Boolean)]
        .toDF("qid", "n_results", "mean_recall_ok")
    val idx = graft.ops.IvfPq.build(embeddings(s, d), "vec_id", "embedding",
      nCells = 16, m = 8, ksub = 64, residual = true)
    recallMetric(
      graft.ops.IvfPq.knn(idx, "vec_id", "embedding", $"vec_id" < 20, k = 5,
        nProbe = 6),
      Similarity.knnBrute(embeddings(s, d), "vec_id", "embedding",
        $"vec_id" < 20, k = 5),
      k = 5, floor = 0.3)
  }

  /** q81: per-label embedding centroids + cluster tightness — the
    * embedding-space quality profile a training pipeline runs after
    * labeling/clustering. Centroid = per-dimension mean via posexplode →
    * (label, dim) hash aggregation (map-side combinable; the intermediate
    * is |labels|·dims rows, NEVER |vectors|·dims after the partial
    * combine), reassembled into an array with a deterministic
    * (pos-ordered) fold. Tightness = mean cosine of each member to its
    * centroid — the centroid table is |labels| rows, so the join back is
    * a broadcast; cosines use the sequential-fold dotSeq (oracle-parity).
    * Dimension count is read from the DATA (first row), not hardcoded. */
  def q81Centroids(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = embeddings(s, d)
    val cent = emb.select($"label", posexplode($"embedding").as(Seq("p", "v")))
      .groupBy($"label", $"p").agg(avg($"v").as("c"))
      .groupBy($"label").agg(
        transform(array_sort(collect_list(struct($"p", $"c"))),
          e => e.getField("c")).as("cv"))
    val scored = emb.join(broadcast(cent), "label")
      .select($"label",
        VectorFunctions.cosine($"embedding", $"cv").as("cos"))
    val byLabel = scored.groupBy($"label")
      .agg(count(lit(1)).as("n"), roundp(avg($"cos"), 6).as("avg_cos"))
    byLabel.join(cent.select($"label",
        roundp(VectorFunctions.norm($"cv"), 6).as("centroid_norm")), "label")
      .select($"label".cast("int").as("label"), $"n", $"avg_cos", $"centroid_norm")
      .orderBy($"label")
  }

  val q81Sql: String =
    s"""WITH dims AS (
       |  SELECT label, d, avg(embedding[d + 1]::DOUBLE) AS c
       |  FROM embeddings CROSS JOIN generate_series(0, 63) g(d)
       |  GROUP BY 1, 2),
       |cent AS (SELECT label, list(c ORDER BY d) AS cv FROM dims GROUP BY 1),
       |scored AS (
       |  SELECT e.label, ${DuckSql.cosineSql("e.embedding", "c.cv", 64)} AS cos
       |  FROM embeddings e JOIN cent c ON e.label = c.label)
       |SELECT s.label, count(*) AS n,
       |  ${DuckSql.roundpSql("avg(s.cos)", 6)} AS avg_cos,
       |  any_value(${DuckSql.roundpSql(
              s"sqrt(${DuckSql.dotSeqSql("c.cv", "c.cv", 64)})", 6)})
       |    AS centroid_norm
       |FROM scored s JOIN cent c ON s.label = c.label
       |GROUP BY s.label ORDER BY s.label""".stripMargin

  /** q108: deterministic negative sampling for contrastive training —
    * every anchor (vec_id < 50) draws 4 pseudo-random corpus negatives
    * via a keyed hash (`polyHash32(anchor ⊕ draw) mod N`): no RNG state,
    * rerun-stable, and the "random" pick is a pure column expression, so
    * sampling JOINS the corpus by id instead of shuffling it — the
    * broadcast side is |anchors|·k rows, the corpus streams. Self-hits
    * are dropped (deterministically), matching standard in-batch-negative
    * hygiene. Scores are the parity-form cosine, so the whole sample is
    * hash-checked against the DuckDB replay. */
  def q108NegativeSampling(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = embeddings(s, d).select($"vec_id".cast("long").as("vec_id"),
      $"embedding")
    val nn = emb.agg(count(lit(1)).as("nn"))
    val draws = emb.filter($"vec_id" < 50)
      .select($"vec_id".as("qid"), $"embedding".as("qe"),
        explode(sequence(lit(0), lit(3))).as("j"))
      .crossJoin(broadcast(nn))
      .select($"qid", $"qe", $"j",
        (graft.functions.TextFunctions.polyHash(
          concat($"qid".cast("string"), lit("_"), $"j".cast("string")))
          % $"nn").as("neg"))
      .filter($"neg" =!= $"qid")
    draws.join(emb.withColumnRenamed("vec_id", "neg"), Seq("neg"))
      .select($"qid", $"j".cast("bigint").as("j"), $"neg".as("neg_id"),
        roundp(VectorFunctions.cosine($"qe", $"embedding"), 6).as("cos"))
      .orderBy($"qid", $"j")
  }

  val q108Sql: String =
    s"""WITH nn AS (SELECT count(*) AS n FROM embeddings),
       |draws AS (
       |  SELECT a.vec_id AS qid, j.j, a.embedding AS qe,
       |    ${DuckSql.polyHashSql("a.vec_id::VARCHAR || '_' || j.j::VARCHAR")}
       |      % (SELECT n FROM nn) AS neg
       |  FROM embeddings a CROSS JOIN
       |    (SELECT unnest(range(0, 4)) AS j) j
       |  WHERE a.vec_id < 50)
       |SELECT d.qid, d.j::BIGINT AS j, d.neg AS neg_id,
       |  ${DuckSql.roundpSql(DuckSql.cosineSql("d.qe", "c.embedding", 64), 6)}
       |    AS cos
       |FROM draws d JOIN embeddings c ON c.vec_id = d.neg
       |WHERE d.neg <> d.qid
       |ORDER BY qid, j""".stripMargin

  /** q123: bitext mining — margin-based parallel-pair extraction between
    * two embedding spaces (Artetxe & Schwenk 2019, the LASER/CCMatrix
    * recipe for mining translation pairs for MT training data): for each
    * source vector (label 0) take its best cosine match among targets
    * (label 1) and score it by the RATIO margin — cos(x,y) divided by
    * the mean of both sides' top-8 neighbor cosines — which suppresses
    * hubs (vectors close to everything score margins ≈ 1 and sink).
    * Output: top-20 mined pairs by margin.
    *
    * Both engines compute identical doubles (sequential-fold dot, shared
    * norm factorization, top-8 mean as a left fold over the desc-sorted
    * list), so argmax/rank decisions can't diverge. Scale shape: the
    * |A|×|B| scoring is the brute form (B broadcast); at corpus scale the
    * pair generation swaps for the IVF-celled join (q40) with the margin
    * arithmetic unchanged — the aggregations are per-source/per-target
    * hash aggs either way. */
  def q123BitextMining(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val k = 8
    val emb = embeddings(s, d)
    def side(label: Int, id: String, v: String) =
      emb.filter($"label" === label)
        .select($"vec_id".cast("long").as(id), $"embedding".as(v))
        .withColumn(s"n_$id", sqrt(VectorFunctions.dotSeq(col(v), col(v))))
    val a = side(0, "src", "va")
    val b = side(1, "dst", "vb")
    val p = graft.ops.ScratchCache.register(
      a.crossJoin(broadcast(b))
        .select($"src", $"dst",
          (VectorFunctions.dotSeq($"va", $"vb") / ($"n_src" * $"n_dst"))
            .as("cs"))
        .persist())
    // mean of the top-k cosines per side: left fold over the desc-sorted
    // list (0.0 + c1 == c1, so the fold equals DuckDB's list_reduce)
    def topkMean(key: String) = p.groupBy(col(key))
      .agg((aggregate(
        slice(sort_array(collect_list($"cs"), asc = false), 1, k),
        lit(0.0), (acc, x) => acc + x) / k).as(s"knn_$key"))
    val nx = topkMean("src")
    val ny = topkMean("dst")
    val best = p.groupBy($"src")
      .agg(max(struct($"cs", (-$"dst").as("nd"))).as("bst"))
      .select($"src", (-$"bst.nd").cast("long").as("dst"), $"bst.cs".as("cs"))
    best.join(nx, "src").join(ny, "dst")
      .select($"src".as("src_id"), $"dst".as("dst_id"),
        roundp($"cs", 6).as("cos"),
        roundp($"cs" / (lit(0.5) * ($"knn_src" + $"knn_dst")), 6).as("margin"))
      .orderBy($"margin".desc, $"src_id")
      .limit(20)
  }

  val q123Sql: String = {
    val dot = (x: String, y: String) => DuckSql.dotSeqSql(x, y, 64)
    s"""WITH a AS (SELECT vec_id AS src, embedding AS va,
       |    sqrt(${dot("embedding", "embedding")}) AS na
       |  FROM embeddings WHERE label = 0),
       |b AS (SELECT vec_id AS dst, embedding AS vb,
       |    sqrt(${dot("embedding", "embedding")}) AS nb
       |  FROM embeddings WHERE label = 1),
       |p AS (SELECT src, dst, ${dot("va", "vb")} / (na * nb) AS cs
       |  FROM a CROSS JOIN b),
       |nx AS (SELECT src,
       |    list_reduce(list_sort(list(cs), 'DESC')[1:8], (x, y) -> x + y) / 8
       |      AS knn_src
       |  FROM p GROUP BY src),
       |ny AS (SELECT dst,
       |    list_reduce(list_sort(list(cs), 'DESC')[1:8], (x, y) -> x + y) / 8
       |      AS knn_dst
       |  FROM p GROUP BY dst),
       |best AS (SELECT src, dst, cs FROM p
       |  QUALIFY row_number() OVER (PARTITION BY src ORDER BY cs DESC, dst) = 1)
       |SELECT b.src AS src_id, b.dst AS dst_id,
       |  ${DuckSql.roundpSql("b.cs", 6)} AS cos,
       |  ${DuckSql.roundpSql("b.cs / (0.5 * (nx.knn_src + ny.knn_dst))", 6)}
       |    AS margin
       |FROM best b JOIN nx ON nx.src = b.src JOIN ny ON ny.dst = b.dst
       |ORDER BY margin DESC, src_id LIMIT 20""".stripMargin
  }

  /** q149: HARD-NEGATIVE mining — for each anchor (vec_id < 20), the 3
    * most-similar vectors carrying a DIFFERENT label: the contrastive-
    * training sampler that replaces random negatives (q108) with the
    * near-misses that actually move the loss. Same scale shape as
    * knnBrute — broadcast anchors stream the corpus once, norms
    * precomputed per row, native fused dot + the bounded TopKScore tail
    * (k rows/anchor of shuffle state at any corpus size). */
  def q149HardNegatives(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = embeddings(s, d)
    val q = emb.filter($"vec_id" < 20)
      .select($"vec_id".as("qid"), $"embedding".as("qv"),
        $"label".as("qlabel"), VectorFunctions.norm($"embedding").as("qn"))
    val c = emb.select($"vec_id".as("cid"), $"embedding".as("cv"),
      $"label".as("clabel"), VectorFunctions.norm($"embedding").as("cn"))
    val scored = c.join(broadcast(q),
        $"qid" =!= $"cid" && $"qlabel" =!= $"clabel")
      .select($"qid", $"cid",
        roundp(graft.functions.DotProductF32.dot($"qv", $"cv") /
          ($"qn" * $"cn"), 6).as("cos"))
    graft.ops.Similarity.topKRank(scored, 3)
      .select($"qid", $"rank".cast("bigint").as("rank"), $"cid", $"cos")
      .orderBy($"qid", $"rank")
  }

  val q149Sql: String =
    s"""WITH scored AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS cid,
       |    ${DuckSql.roundpSql(
            DuckSql.cosineSql("q.embedding", "c.embedding", 64), 6)}
       |      AS cos
       |  FROM embeddings q JOIN embeddings c
       |    ON q.vec_id < 20 AND c.vec_id <> q.vec_id
       |   AND c.label <> q.label)
       |SELECT qid, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid)
       |    AS rank, cid, cos
       |FROM scored
       |QUALIFY rank <= 3
       |ORDER BY qid, rank""".stripMargin

  /** q145: embedding DRIFT between two corpus snapshots — per label, the
    * L2 distance between the centroid of the even-vec_id half and the
    * odd-vec_id half (the halves play "last week's" and "this week's"
    * embedding snapshots): the monitoring signal that detects encoder or
    * upstream-data shift before it poisons an ANN index or a dedup
    * threshold. The per-dim averages assemble into ORDERED vectors and
    * the distance folds sequentially (the q81 parity machinery), so the
    * only reduction-order-sensitive step is the per-(label, dim) mean —
    * grouped exactly like q81's green centroid oracle.
    *
    * Scale shape: one posexplode + (label, parity, dim) hash aggregation
    * — |labels|·2·|dims| output rows — then driver-bounded vector math
    * per label. No pairwise joins, no window. */
  def q145EmbeddingDrift(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = embeddings(s, d)
    val cent = emb
      .select($"label", ($"vec_id" % 2 === 0).as("even"),
        posexplode($"embedding").as(Seq("p", "v")))
      .groupBy($"label", $"even", $"p").agg(avg($"v").as("c"))
      .groupBy($"label", $"even").agg(
        transform(array_sort(collect_list(struct($"p", $"c"))),
          e => e.getField("c")).as("cv"))
    val a = cent.filter($"even").select($"label", $"cv".as("ca"))
    val b = cent.filter(!$"even").select($"label", $"cv".as("cb"))
    val counts = emb.groupBy($"label")
      .agg(sum(when($"vec_id" % 2 === 0, 1L).otherwise(0L)).as("n_even"),
        sum(when($"vec_id" % 2 =!= 0, 1L).otherwise(0L)).as("n_odd"))
    a.join(b, Seq("label")).join(counts, Seq("label"))
      .select($"label".cast("int").as("label"), $"n_even", $"n_odd",
        roundp(sqrt(aggregate(
          zip_with($"ca", $"cb", (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, v) => acc + v)), 6).as("drift"))
      .orderBy($"label")
  }

  val q145Sql: String =
    s"""WITH dims AS (
       |  SELECT label, vec_id % 2 = 0 AS even, d,
       |    avg(embedding[d + 1]::DOUBLE) AS c
       |  FROM embeddings CROSS JOIN generate_series(0, 63) g(d)
       |  GROUP BY 1, 2, 3),
       |cent AS (SELECT label, even, list(c ORDER BY d) AS cv
       |  FROM dims GROUP BY 1, 2),
       |cnt AS (SELECT label,
       |    sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_even,
       |    sum(CASE WHEN vec_id % 2 <> 0 THEN 1 ELSE 0 END)::BIGINT AS n_odd
       |  FROM embeddings GROUP BY label)
       |SELECT a.label::INT AS label, cnt.n_even, cnt.n_odd,
       |  ${DuckSql.roundpSql(
            "sqrt(list_reduce(list_transform(range(1, 65), " +
              "i -> (a.cv[i] - b.cv[i]) * (a.cv[i] - b.cv[i])), " +
              "(x, y) -> x + y))", 6)} AS drift
       |FROM cent a JOIN cent b ON a.label = b.label AND a.even AND NOT b.even
       |JOIN cnt ON cnt.label = a.label
       |ORDER BY a.label""".stripMargin

  /** q155: DIVERSITY sampling — cap each region of embedding space at 2
    * representatives (SemDeDup's prune step generalized: instead of
    * dropping near-dups above a threshold, keep a bounded sample PER
    * CELL so the training mix can't be dominated by a dense mode).
    * Cells are deterministic 6-bit hyperplane-LSH signs (64 cells, the
    * q32 LCG kernel at table 0), survivors are the 2 lowest vec_ids per
    * cell — a deterministic priority an incremental re-run preserves.
    *
    * Scale shape: the cap runs as the NATIVE bounded TopKScore aggregate,
    * so each map task ships ≤ 2 candidates per cell — shuffle volume is
    * O(cells · k), INDEPENDENT of corpus size, where the row_number()
    * window form would shuffle every row to |cells| partitions (a skew
    * hazard at 100 TB; production raises nPlanes so cells ≈ millions).
    * cell_size rides the same aggregate. */
  def q155DiversitySample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cells = embeddings(s, d).select($"vec_id",
      element_at(graft.functions.HashExpressions.hyperplaneSigs(
        $"embedding", 6, 64, 1), 1).as("cell"))
    cells.groupBy($"cell")
      .agg(graft.functions.TopKScore($"vec_id".cast("long"),
          -$"vec_id".cast("double"), 2)
          .as("top"),
        count(lit(1)).as("cell_size"))
      .select($"cell", posexplode($"top"), $"cell_size")
      .select($"cell", ($"pos" + 1).cast("long").as("rank"),
        $"col.cid".as("vec_id"), $"cell_size")
      .orderBy($"cell", $"rank")
  }

  val q155Sql: String = {
    val cell = DuckSql.lshBucketSql("embedding", "0", 6, 64)
    s"""WITH sig AS (SELECT vec_id, $cell AS cell FROM embeddings),
       |ranked AS (SELECT cell, vec_id,
       |    row_number() OVER (PARTITION BY cell ORDER BY vec_id) AS rk,
       |    count(*) OVER (PARTITION BY cell) AS sz
       |  FROM sig)
       |SELECT cell, CAST(rk AS BIGINT) AS rank, vec_id,
       |  CAST(sz AS BIGINT) AS cell_size
       |FROM ranked WHERE rk <= 2 ORDER BY cell, rank""".stripMargin
  }

  // ---------------------------------------------------------------- q166

  /** Top-5 exact-cosine neighbor PAIRS (qid, cid) for the first 20 query
    * vectors over an arbitrary vector column — the shared harness behind
    * the q166/q167 recall audits. */
  private def top5Pairs(base: DataFrame): DataFrame = {
    import base.sparkSession.implicits._
    Similarity.knnBrute(base, "vec_id", "embedding", $"vec_id" < 20, k = 5)
      .select($"qid", $"cid")
  }

  /** Recall-overlap report: |top5(exact) ∩ top5(approx)| per query, with
    * zero-overlap queries kept (left join from the exact side). */
  private def overlapReport(exact: DataFrame, approx: DataFrame): DataFrame = {
    import exact.sparkSession.implicits._
    val hit = exact.join(approx, Seq("qid", "cid"))
      .groupBy($"qid").agg(count(lit(1)).as("n_common"))
    exact.select($"qid").distinct()
      .join(hit, Seq("qid"), "left")
      .select($"qid", coalesce($"n_common", lit(0L)).as("n_common"))
      .select($"qid", $"n_common",
        roundp($"n_common" / lit(5.0), 6).as("recall_at_5"))
      .orderBy($"qid")
  }

  /** Shared oracle twin of [[overlapReport]] over two `(qid, cid)` CTEs
    * named `ef` (exact/full) and `ap` (approx). */
  private def overlapSql(withClauses: String): String =
    s"""$withClauses,
       |hit AS (SELECT ef.qid, count(*)::BIGINT AS n_common
       |  FROM ef JOIN ap ON ef.qid = ap.qid AND ef.cid = ap.cid
       |  GROUP BY 1),
       |qs AS (SELECT DISTINCT qid FROM ef)
       |SELECT qs.qid, coalesce(hit.n_common, 0)::BIGINT AS n_common,
       |  ${DuckSql.roundpSql("coalesce(hit.n_common, 0) / 5.0", 6)}
       |    AS recall_at_5
       |FROM qs LEFT JOIN hit ON qs.qid = hit.qid ORDER BY qs.qid""".stripMargin

  /** Oracle CTE producing top-5 `(qid, cid)` by rounded cosine over a
    * vector expression of `nDims` leading dims, aliased `alias`. */
  private def top5Sql(alias: String, vecExpr: String, nDims: Int): String = {
    val cos = DuckSql.roundpSql(
      DuckSql.cosineSql(s"q.$vecExpr", s"c.$vecExpr", nDims), 6)
    s"""$alias AS (SELECT qid, cid FROM (
       |  SELECT q.vec_id AS qid, c.vec_id AS cid,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY $cos DESC, c.vec_id) AS rk
       |  FROM embeddings q JOIN embeddings c
       |    ON q.vec_id < 20 AND c.vec_id <> q.vec_id)
       |  WHERE rk <= 5)""".stripMargin
  }

  /** q166: MATRYOSHKA truncation audit (Kusupati et al. 2022, MRL) — how
    * much top-5 retrieval survives when 64-dim embeddings are truncated
    * to their first 16 dims (the memory/latency lever MRL training buys).
    * Both sides are exact brute-force cosine with the shared rounded
    * (cos, cid) total order, so the driver hash-matches the WHOLE audit,
    * not a summary. Scale shape: two broadcast-query scans + a
    * 20·5-row join — corpus never shuffles on pair keys. */
  def q166Matryoshka(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val full = top5Pairs(embeddings(s, d))
    val trunc = top5Pairs(embeddings(s, d)
      .select($"vec_id", slice($"embedding", 1, 16).as("embedding")))
    overlapReport(full, trunc)
  }

  val q166Sql: String = overlapSql(
    s"""WITH ${top5Sql("ef", "embedding", 64)},
       |${top5Sql("ap", "embedding", 16)}""".stripMargin)

  // ---------------------------------------------------------------- q167

  /** q167: SCALAR-QUANTIZATION (SQ8) recall audit — per-vector min/max
    * affine quantization of each dim to an 8-bit code, top-5 retrieval
    * over the RECONSTRUCTED vectors vs exact top-5. The third standard
    * ANN compression family next to the existing PQ (q45) and IVFPQ
    * (q49); SQ8's 4× shrink is what real vector stores default to.
    * Everything is deterministic double math shared with the oracle:
    * per-vector extremes, positive-range round (HALF_UP in both
    * engines), the sequential-fold cosine, and the rounded ordering —
    * the driver hash-matches the full per-query table. Degenerate
    * constant vectors keep their raw values on BOTH sides. */
  def q167Sq8Recall(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = embeddings(s, d)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .select($"vec_id", $"v",
        array_min($"v").as("mn"), array_max($"v").as("mx"))
    val recon = base.select($"vec_id",
      when($"mx" === $"mn", $"v").otherwise(
        transform($"v", x =>
          $"mn" + round((x - $"mn") / ($"mx" - $"mn") * lit(255.0)) *
            ($"mx" - $"mn") / lit(255.0))).as("r"))
    val rq = recon.filter($"vec_id" < 20)
      .select($"vec_id".as("qid"), $"r".as("qv"),
        VectorFunctions.norm($"r").as("qn"))
    val rc = recon.select($"vec_id".as("cid"), $"r".as("cv"),
      VectorFunctions.norm($"r").as("cn"))
    val approx = rc.join(broadcast(rq), $"qid" =!= $"cid")
      .select($"qid", $"cid",
        roundp(VectorFunctions.dotSeq($"qv", $"cv") / ($"qn" * $"cn"), 6)
          .as("cos"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"qid")
          .orderBy($"cos".desc, $"cid")))
      .filter($"rk" <= 5).select($"qid", $"cid")
    overlapReport(top5Pairs(embeddings(s, d)), approx)
  }

  val q167Sql: String = {
    val reconElem = "CASE WHEN mx = mn THEN v ELSE " +
      "list_transform(v, x -> mn + round((x - mn) / (mx - mn) * 255.0) * " +
      "(mx - mn) / 255.0) END"
    val cos = DuckSql.roundpSql(DuckSql.cosineSql("q.r", "c.r", 64), 6)
    overlapSql(
      s"""WITH rec AS (
         |  SELECT vec_id, $reconElem AS r FROM (
         |    SELECT vec_id, embedding::DOUBLE[] AS v,
         |      list_min(embedding::DOUBLE[]) AS mn,
         |      list_max(embedding::DOUBLE[]) AS mx FROM embeddings)),
         |ap AS (SELECT qid, cid FROM (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY $cos DESC, c.vec_id) AS rk
         |  FROM rec q JOIN rec c
         |    ON q.vec_id < 20 AND c.vec_id <> q.vec_id)
         |  WHERE rk <= 5),
         |${top5Sql("ef", "embedding", 64)}""".stripMargin)
  }

  // ---------------------------------------------------------------- q176

  /** q176: nearest-centroid label CONFUSION — the standard linear-probe
    * sanity check of an embedding table: assign every vector to its
    * nearest per-label centroid (q81's construction) by rounded cosine
    * and cross-tabulate true vs predicted label. The diagonal says the
    * labels are linearly separable in embedding space; off-diagonal mass
    * localizes which labels the encoder confuses. Argmax is window-free
    * and tie-deterministic: max rounded cosine per vector via one
    * aggregation, then min label among exact ties. Scale shape: the
    * centroid table is |labels| rows (broadcast); scoring is a
    * |vectors|×|labels| broadcast fan-out — linear in the corpus. */
  def q176LabelConfusion(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = embeddings(s, d)
    // the centroid table is |labels| rows — a bounded CATEGORY, so it
    // collects in its own (only) job and folds back as literal vectors
    // (q163/q227 precedent): no broadcast-build job, and the former
    // |vectors|×|labels| crossJoin fan-out + max-struct re-aggregation
    // collapses into ONE per-row projection — all label cosines compute
    // inline and greatest(struct(cos, -label)) keeps the same
    // lexicographic tie-determinism (highest rounded cosine, smallest
    // label on ties). Same exact doubles: the centroid avg is the same
    // aggregation as before, just collected instead of broadcast
    val centRows = emb
      .select($"label", posexplode($"embedding").as(Seq("p", "v")))
      .groupBy($"label", $"p").agg(avg($"v").as("c"))
      .groupBy($"label").agg(
        transform(array_sort(collect_list(struct($"p", $"c"))),
          e => e.getField("c")).as("cv"))
      .collect()
    // empty corpus → zero centroids → greatest() would be built with no
    // candidates and fail analysis; the pre-fold-back crossJoin shape
    // returned an empty frame here, so mirror that (q239/q240 guards)
    if (centRows.isEmpty)
      return Seq.empty[(Int, Int, Long)].toDF("label", "pred_label", "n")
    require(centRows.length <= 1024,
      s"q176: ${centRows.length} labels exceed the bounded-category guard")
    val cands: Array[Column] = centRows.map { r =>
      val lab = r.getInt(0)
      val cv = r.getSeq[Double](1).toArray
      struct(
        roundp(VectorFunctions.cosine($"embedding", lit(cv)), 6).as("cos"),
        lit(-lab).as("nl"))
    }
    val m = if (cands.length == 1) cands.head else greatest(cands.toSeq: _*)
    emb.select($"label", (-m.getField("nl")).as("pred_label"))
      .groupBy($"label", $"pred_label").agg(count(lit(1)).as("n"))
      .select($"label".cast("int").as("label"),
        $"pred_label".cast("int").as("pred_label"), $"n")
      .orderBy($"label", $"pred_label")
  }

  val q176Sql: String =
    s"""WITH dims AS (
       |  SELECT label, d, avg(embedding[d + 1]::DOUBLE) AS c
       |  FROM embeddings CROSS JOIN generate_series(0, 63) g(d)
       |  GROUP BY 1, 2),
       |cent AS (SELECT label AS clabel, list(c ORDER BY d) AS cv
       |  FROM dims GROUP BY 1),
       |scored AS (SELECT e.vec_id, e.label, c.clabel,
       |    ${DuckSql.roundpSql(DuckSql.cosineSql("e.embedding", "c.cv", 64), 6)}
       |      AS cos
       |  FROM embeddings e CROSS JOIN cent c),
       |pred AS (SELECT vec_id, label,
       |    -(max(struct_pack(cos := cos, nl := -clabel)).nl) AS pred_label
       |  FROM scored GROUP BY 1, 2)
       |SELECT label, pred_label, count(*)::BIGINT AS n
       |FROM pred GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q187

  // ---------------------------------------------------------------- q239

  private val KmK = 4
  private val KmRounds = 3
  /** 10⁸ — the centroid-update quantization scale. `round(v·10⁸)::long`
    * is the same integer in both engines (identical double product of a
    * float-exact value, identical half-away-from-zero round), so the
    * per-(cluster, dim) SUM is order-free; 10⁸ leaves ~2⁶³/10⁸ ≈ 9·10¹⁰
    * rows of Long headroom per cluster at |v|≈1 — a 2⁴⁰ scale would
    * silently wrap Spark's Long sum once a cluster held ~8M rows while
    * the DuckDB twin's HUGEINT-promoted sum errored on the ::BIGINT
    * cast, diverging the engines exactly at scale. */
  private val KmScale = 100000000.0

  /** q239: distributed K-MEANS training — Lloyd's algorithm over the
    * embedding table, the clustering primitive under SemDeDup corpus
    * curation, IVF index builds (q40/q49 train on a driver-side sample;
    * this is the full-corpus form), and diversity-aware sampling.
    * Deterministic init (the k lowest vec_ids' vectors); each round is
    * ONE job over the persisted corpus: the assignment is a per-row
    * least(struct(dist², cid)) over LITERAL centroid vectors (the q176
    * fold-back shape — no join, no fan-out), and the update is a
    * posexplode → (cid, dim) aggregation whose result is k·d rows —
    * bounded whatever the corpus, so the weights live on the driver
    * exactly like q236/q238. Linear per round at any scale.
    *
    * EXACT oracle parity: distances fold sequentially (dotSeq
    * discipline), centroid sums quantize per-value to `round(v·10⁸)`
    * integers (identical in both engines) so reduction order cannot
    * matter, the new centroid is one double division of exact integers,
    * and inertia quantizes to micro-units before summing. Empty clusters
    * keep their previous centroid (mirrored in the SQL carry). Output:
    * final-round cluster sizes, exact quantized inertia, centroid norms. */
  def q239KmeansTrain(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = graft.ops.ScratchCache.register(
      embeddings(s, d).select($"vec_id", $"embedding").persist())
    val init: Array[Array[Double]] = emb.orderBy($"vec_id").limit(KmK)
      .collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
    if (init.isEmpty) {
      graft.ops.ScratchCache.releaseAll()
      return Seq.empty[(Int, Long, Long, Double)]
        .toDF("cid", "n_members", "inertia_q", "centroid_norm")
    }
    def dist2(a: Column, cv: Array[Double]): Column =
      aggregate(zip_with(a, lit(cv), (x, y) =>
          (x.cast("double") - y) * (x.cast("double") - y)),
        lit(0.0), (acc, v) => acc + v)
    val cents = init.clone()
    var last: Array[org.apache.spark.sql.Row] = Array.empty
    for (_ <- 1 to KmRounds) {
      // distances materialize as named columns FIRST (struct() over
      // lambda-bearing HOF children loses its field names in analysis),
      // then the argmin is least(struct(d, j)) over plain references —
      // Catalyst collapses the two projections into one
      val withD = emb.select($"embedding" +:
        cents.zipWithIndex.map { case (cv, j) =>
          dist2($"embedding", cv).as(s"_d$j") }.toSeq: _*)
      val cands = cents.indices.map(j =>
        struct(col(s"_d$j").as("d"), lit(j).as("j")))
      val m = if (cands.length == 1) cands.head else least(cands: _*)
      last = withD
        .select(m.getField("j").as("cid"), m.getField("d").as("d2"),
          posexplode($"embedding").as(Seq("p", "v")))
        .groupBy($"cid", $"p")
        .agg(
          sum(round($"v".cast("double") * lit(KmScale)).cast("long")).as("sq"),
          count(lit(1)).as("cnt"),
          sum(when($"p" === 0, round($"d2" * lit(1000000.0)).cast("long"))
            .otherwise(lit(0L))).as("iq"))
        .collect()
      val byCid = last.groupBy(_.getInt(0))
      for (j <- 0 until KmK) byCid.get(j).foreach { rs =>
        cents(j) = rs.sortBy(_.getInt(1))
          .map(r => r.getLong(2).toDouble / (KmScale * r.getLong(3)))
      }
    }
    val out = last.groupBy(_.getInt(0)).toSeq.map { case (cid, rs) =>
      val n = rs.head.getLong(3)
      val iq = rs.map(_.getLong(4)).sum // only the p=0 row is nonzero
      val norm = math.sqrt(cents(cid).foldLeft(0.0)((acc, x) => acc + x * x))
      (cid, n, iq, norm)
    }
    graft.ops.ScratchCache.releaseAll()
    out.toDF("cid", "n_members", "inertia_q", "normr")
      .select($"cid", $"n_members", $"inertia_q",
        roundp($"normr", 6).as("centroid_norm"))
      .orderBy($"cid")
  }

  /** Unrolled round-for-round SQL replay: same init order, same
    * sequential distance folds, same quantization points, same
    * empty-cluster carry. */
  val q239Sql: String = {
    def d2(v: String, cv: String): String =
      s"list_reduce(list_transform(range(1, 65), i -> " +
        s"(($v)[i]::DOUBLE - ($cv)[i]) * (($v)[i]::DOUBLE - ($cv)[i])), " +
        "(x, y) -> x + y)"
    def round_(r: Int): String =
      s"""a$r AS (SELECT vec_id, any_value(embedding) AS embedding,
         |    min(struct_pack(d := ${d2("embedding", "c.cv")}, j := c.cid)) AS m
         |  FROM e CROSS JOIN c${r - 1} c GROUP BY vec_id),
         |u$r AS (SELECT m.j AS cid, g.d AS p,
         |    sum(CAST(round(embedding[g.d + 1]::DOUBLE * $KmScale) AS BIGINT))
         |      ::BIGINT AS sq,
         |    count(*)::BIGINT AS cnt,
         |    sum(CASE WHEN g.d = 0
         |      THEN CAST(round(m.d * 1000000.0) AS BIGINT)
         |      ELSE 0 END)::BIGINT AS iq
         |  FROM a$r CROSS JOIN generate_series(0, 63) g(d)
         |  GROUP BY 1, 2),
         |c$r AS (SELECT cid, list(sq::DOUBLE / ($KmScale * cnt) ORDER BY p)
         |      AS cv
         |    FROM u$r GROUP BY cid
         |  UNION ALL SELECT cid, cv FROM c${r - 1}
         |    WHERE cid NOT IN (SELECT cid FROM u$r))""".stripMargin
    val normSql = "sqrt(list_reduce(list_transform(range(1, 65), " +
      "i -> cv[i] * cv[i]), (x, y) -> x + y))"
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
       |    list_transform(embedding, x -> x::DOUBLE) AS cv
       |  FROM e ORDER BY vec_id LIMIT $KmK),
       |${(1 to KmRounds).map(round_).mkString(",\n")},
       |f AS (SELECT cid, max(cnt) AS n_members, sum(iq)::BIGINT AS inertia_q
       |  FROM u$KmRounds GROUP BY cid)
       |SELECT f.cid::INT AS cid, f.n_members, f.inertia_q,
       |  ${DuckSql.roundpSql(normSql, 6)} AS centroid_norm
       |FROM f JOIN c$KmRounds c ON f.cid = c.cid
       |ORDER BY f.cid""".stripMargin
  }

  // ---------------------------------------------------------------- q240

  private val PcaRounds = 3

  /** q240: distributed PCA (top principal component via POWER ITERATION)
    * and the corpus's spectrum along it — the whitening/drift primitive
    * one level above q187's raw covariance: which direction carries the
    * most embedding variance, and how each label's mass projects onto
    * it (a one-dimensional encoder-collapse / modality-mix diagnostic).
    * Distribution shape: the covariance comes from q187's ONE-scan
    * [[graft.ops.Gram.MomentsAgg]] (exact Long moments of 10⁴-quantized
    * inputs, map-side combined flat state); the 64×64 matrix and the
    * power iteration live on the DRIVER (d² doubles — bounded whatever
    * the corpus); the projection pass is one more scan with the
    * eigenvector folded back as a LITERAL (q176/q239 discipline — no
    * join), aggregating micro-quantized projection sums per label.
    *
    * Exact oracle parity: the covariance cells are per-cell double math
    * over exact integer moments (the q187 contract); every power-
    * iteration step is the same sequential fold shape in both engines
    * (list_reduce first-element init == the 0.0-init foldLeft), so the
    * eigenvector — and therefore every projection — is the same double;
    * cross-row projection sums quantize to micro-units before summing. */
  def q240PcaSpectrum(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = graft.ops.ScratchCache.register(
      embeddings(s, d).select($"label", $"embedding").persist())
    val dimRow = emb.select(size($"embedding")).limit(1).collect()
    if (dimRow.isEmpty) {
      graft.ops.ScratchCache.releaseAll()
      return Seq.empty[(Int, Long, Double, Double)]
        .toDF("label", "n_vecs", "mean_proj", "eig1")
    }
    val dims = dimRow(0).getInt(0)
    val agg = new graft.ops.Gram.MomentsAgg(dims)
    val (n, sx, sxy) =
      emb.select($"embedding").as[Seq[Float]].select(agg.toColumn).head()
    // symmetric covariance from the exact moments — the q187 cell
    // expression verbatim (same association, same 1e8 de-quantization)
    def tri(i: Int, j: Int): Int = i * dims - i * (i - 1) / 2 + (j - i)
    val cov = Array.tabulate(dims, dims) { (i0, j0) =>
      val (i, j) = if (i0 <= j0) (i0, j0) else (j0, i0)
      (sxy(tri(i, j)).toDouble / n -
        (sx(i).toDouble / n) * (sx(j).toDouble / n)) / 100000000.0
    }
    var v = Array.fill(dims)(1.0)
    var lambda = 0.0
    for (_ <- 1 to PcaRounds) {
      val w = Array.tabulate(dims) { i =>
        (0 until dims).foldLeft(0.0)((acc, j) => acc + cov(i)(j) * v(j))
      }
      lambda = math.sqrt(w.foldLeft(0.0)((acc, x) => acc + x * x))
      // an identically-zero covariance (1-vector / constant corpus) has
      // no spectral direction: keep the start vector (the power-
      // iteration stall convention) so the projection pass stays finite
      // instead of dividing into a NaN vector the ANSI long-cast rejects
      if (lambda > 0.0) v = w.map(_ / lambda)
    }
    val proj = VectorFunctions.dotSeq($"embedding", lit(v))
    emb
      .select($"label",
        round(proj * lit(1000000.0)).cast("long").as("pq"))
      .groupBy($"label")
      .agg(count(lit(1)).as("n_vecs"), sum($"pq").as("sq"))
      .select($"label".cast("int").as("label"), $"n_vecs",
        roundp(($"sq".cast("double") / lit(1000000.0)) / $"n_vecs", 6)
          .as("mean_proj"),
        roundp(lit(lambda), 6).as("eig1"))
      .orderBy($"label")
  }

  /** SQL replay: exact quantized moments (the q187Sql CTEs), the
    * symmetric matrix as an ordered list-of-lists, three unrolled
    * mat-vec/normalize rounds with identical fold shapes, then the
    * projection aggregation over the literal final vector. */
  val q240Sql: String = {
    val cell = "(sxy.s::DOUBLE / n.n - (sa.s::DOUBLE / n.n) * " +
      "(sb.s::DOUBLE / n.n)) / 100000000.0"
    def iter(r: Int): String =
      s"""p$r AS (SELECT list_transform(range(1, 65), i ->
         |    list_reduce(list_transform(range(1, 65), j -> m[i][j] * v[j]),
         |      (x, y) -> x + y)) AS w
         |  FROM cmat, v${r - 1}),
         |v$r AS (SELECT list_transform(range(1, 65), i -> w[i] / nw) AS v, nw
         |  FROM (SELECT w, sqrt(list_reduce(list_transform(range(1, 65),
         |      i -> w[i] * w[i]), (x, y) -> x + y)) AS nw FROM p$r))"""
        .stripMargin
    s"""WITH x AS (SELECT vec_id, d,
       |    CAST(round(embedding[d + 1]::DOUBLE * 10000) AS BIGINT) AS xi
       |  FROM embeddings CROSS JOIN generate_series(0, 63) g(d)),
       |n AS (SELECT count(*)::BIGINT AS n FROM embeddings),
       |sx AS (SELECT d, sum(xi)::BIGINT AS s FROM x GROUP BY d),
       |sxy AS (SELECT a.d AS i, b.d AS j, sum(a.xi * b.xi)::BIGINT AS s
       |  FROM x a JOIN x b USING (vec_id) WHERE a.d <= b.d GROUP BY 1, 2),
       |cu AS (SELECT sxy.i AS i, sxy.j AS j, $cell AS cell
       |  FROM sxy JOIN sx sa ON sa.d = sxy.i JOIN sx sb ON sb.d = sxy.j, n),
       |cm AS (SELECT i, j, cell FROM cu
       |  UNION ALL SELECT j AS i, i AS j, cell FROM cu WHERE i <> j),
       |cl AS (SELECT i, list(cell ORDER BY j) AS row FROM cm GROUP BY i),
       |cmat AS (SELECT list(row ORDER BY i) AS m FROM cl),
       |v0 AS (SELECT list_transform(range(1, 65), i -> 1.0::DOUBLE) AS v),
       |${(1 to PcaRounds).map(iter).mkString(",\n")},
       |proj AS (SELECT e.label,
       |    CAST(round(${DuckSql.dotSeqSql("e.embedding", "v", 64)}
       |      * 1000000.0) AS BIGINT) AS pq
       |  FROM embeddings e, v$PcaRounds)
       |SELECT label::INT AS label, count(*)::BIGINT AS n_vecs,
       |  ${DuckSql.roundpSql(
              "(sum(pq)::DOUBLE / 1000000.0) / count(*)", 6)} AS mean_proj,
       |  ${DuckSql.roundpSql(s"(SELECT nw FROM v$PcaRounds)", 6)} AS eig1
       |FROM proj GROUP BY label ORDER BY label""".stripMargin
  }

  /** q187: embedding COVARIANCE matrix — the d×d second-moment primitive
    * under PCA, whitening, Mahalanobis outlier scoring and drift tests
    * (the matrix q145's drift distances implicitly live in). One scan
    * through [[graft.ops.Gram.MomentsAgg]]: a mergeable typed Aggregator
    * folds every vector into one flat exact-Long state (map-side
    * combine ⇒ one state per partition crosses the wire), and the 2080
    * upper-triangle cells assemble from the single aggregated row by
    * exploding the (i ≤ j) index grid — the oracle's (vec, dim) self-join
    * shape would shuffle 2080 rows per vector. Values are the exact
    * covariance of the 10⁴-quantized inputs (see Gram's parity note);
    * all reduction is integer, so the oracle matches bit-for-bit. */
  def q187Covariance(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val agg = new graft.ops.Gram.MomentsAgg(64)
    val one = embeddings(s, d).select($"embedding").as[Seq[Float]]
      .select(agg.toColumn)
      .toDF("n", "sx", "sxy")
      // empty corpus → the zero state (n = 0): covariance of nothing is
      // an empty frame, and the /n would ANSI-throw — mirror the twin's
      // empty join result
      .where($"n" > 0)
    val tri = ($"i" * 64 - $"i" * ($"i" - 1) / 2 + ($"j" - $"i") + 1)
    one
      .select($"n", $"sx", $"sxy",
        explode(sequence(lit(0), lit(63))).as("i"))
      .select($"n", $"sx", $"sxy", $"i",
        explode(sequence($"i", lit(63))).as("j"))
      .select($"i".cast("long").as("i"), $"j".cast("long").as("j"),
        roundp((element_at($"sxy", tri.cast("int")).cast("double") / $"n"
            - (element_at($"sx", ($"i" + 1).cast("int")).cast("double") / $"n")
            * (element_at($"sx", ($"j" + 1).cast("int")).cast("double") / $"n"))
          / lit(1e8), 6).as("cov"))
      .orderBy($"i", $"j")
  }

  val q187Sql: String =
    s"""WITH x AS (SELECT vec_id, d,
       |    CAST(round(embedding[d + 1]::DOUBLE * 10000) AS BIGINT) AS xi
       |  FROM embeddings CROSS JOIN generate_series(0, 63) g(d)),
       |n AS (SELECT count(*)::BIGINT AS n FROM embeddings),
       |sx AS (SELECT d, sum(xi)::BIGINT AS s FROM x GROUP BY d),
       |sxy AS (SELECT a.d AS i, b.d AS j, sum(a.xi * b.xi)::BIGINT AS s
       |  FROM x a JOIN x b USING (vec_id) WHERE a.d <= b.d GROUP BY 1, 2)
       |SELECT sxy.i::BIGINT AS i, sxy.j::BIGINT AS j,
       |  ${DuckSql.roundpSql(
            "(sxy.s::DOUBLE / n.n - (sa.s::DOUBLE / n.n) * (sb.s::DOUBLE / n.n)) / 100000000.0",
            6)} AS cov
       |FROM sxy JOIN sx sa ON sa.d = sxy.i JOIN sx sb ON sb.d = sxy.j, n
       |ORDER BY i, j""".stripMargin

  // ---------------------------------------------------------------- q188

  /** q188: MAHALANOBIS (diagonal) embedding outliers — the curation gate
    * that drops vectors far from the corpus distribution in
    * per-dimension z-score terms: encoder glitches, wrong-modality rows
    * and truncated inputs all surface here before they poison an ANN
    * index or a centroid. Two passes: a 64-group stats aggregate
    * (posexplode → per-dim Σx, Σx² of 10⁴-quantized values — exact
    * Longs), assembled into ONE ordered array row that broadcast-joins
    * back; then a per-row zip_with fold computes Σ_d (x_d−μ_d)²/σ²_d
    * with each term DECIMAL-cast so the 64-term reduction is
    * order-free in both engines. Top-20 by TakeOrdered — k rows of
    * state at any corpus size. */
  def q188Mahalanobis(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = embeddings(s, d)
    val stats = emb
      .select(posexplode($"embedding").as(Seq("d", "v")))
      .select($"d", round($"v".cast("double") * 1e4).cast("long").as("xi"))
      .groupBy($"d")
      .agg(sum($"xi").as("sx"), sum($"xi" * $"xi").as("sxx"),
        count(lit(1)).as("n"))
      .agg(sort_array(collect_list(struct($"d", $"sx", $"sxx", $"n")))
        .as("st"))
    val term = (x: Column, st: Column) => {
      val xi = round(x.cast("double") * lit(1e4))
      val mu = st.getField("sx").cast("double") / st.getField("n")
      val vr = st.getField("sxx").cast("double") / st.getField("n") - mu * mu
      // a zero-variance dimension (constant across the corpus — e.g. a
      // 1-vector corpus) carries no outlier signal: its z-term is 0,
      // the standard pruned-dimension Mahalanobis convention (ANSI
      // would throw on the /0 otherwise)
      when(vr > 0.0, ((xi - mu) * (xi - mu) / vr).cast("decimal(28,6)"))
        .otherwise(lit(0).cast("decimal(28,6)"))
    }
    emb.crossJoin(broadcast(stats))
      .select($"vec_id",
        aggregate(zip_with($"embedding", $"st", term),
          lit(0).cast("decimal(28,6)"),
          (acc, t) => (acc + t).cast("decimal(28,6)"))
          .cast("double").as("score0"))
      .select($"vec_id", roundp($"score0", 4).as("score"))
      .orderBy($"score".desc, $"vec_id").limit(20)
  }

  val q188Sql: String =
    s"""WITH x AS (SELECT vec_id, d,
       |    CAST(round(embedding[d + 1]::DOUBLE * 10000) AS BIGINT) AS xi
       |  FROM embeddings CROSS JOIN generate_series(0, 63) g(d)),
       |st AS (SELECT d, sum(xi)::BIGINT AS sx, sum(xi * xi)::BIGINT AS sxx,
       |    count(*)::BIGINT AS n
       |  FROM x GROUP BY d),
       |sc AS (SELECT vec_id, CAST(sum(CAST(
       |    CASE WHEN (st.sxx::DOUBLE / st.n
       |        - (st.sx::DOUBLE / st.n) * (st.sx::DOUBLE / st.n)) > 0
       |      THEN (x.xi::DOUBLE - st.sx::DOUBLE / st.n)
       |        * (x.xi::DOUBLE - st.sx::DOUBLE / st.n)
       |        / (st.sxx::DOUBLE / st.n
       |          - (st.sx::DOUBLE / st.n) * (st.sx::DOUBLE / st.n))
       |      ELSE 0 END
       |    AS DECIMAL(28,6))) AS DOUBLE) AS score0
       |  FROM x JOIN st USING (d) GROUP BY vec_id)
       |SELECT vec_id, ${DuckSql.roundpSql("score0", 4)} AS score
       |FROM sc ORDER BY score DESC, vec_id LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q218

  private[graft] val RboD = 100
  private[graft] val RboP = 0.9

  /** Quantized RBO tail weights: Sq(m) = round(1e12 · Σ_{d=m..D} pᵈ⁻¹/d),
    * the total weight an item entering the intersection at depth m earns
    * through depth D. Computed ONCE in Scala and inlined as the SAME
    * integer literals into the Spark plan and the oracle SQL — summation
    * over items then happens in exact BIGINT in both engines (float
    * reduction order can't perturb the 6dp output). */
  private[graft] val rboSuffixQ: Array[Long] = {
    val out = new Array[Long](RboD)
    var acc = 0.0
    var d = RboD
    while (d >= 1) {
      acc += math.pow(RboP, d - 1) / d
      out(d - 1) = math.round(acc * 1e12)
      d -= 1
    }
    out
  }

  /** q218: rank-biased overlap (RBO, Webber et al. 2010) at depth 100
    * between two quality scorers' rankings (raw length vs token count)
    * — the metric for "can I swap scorer A for scorer B without
    * reshuffling the data I keep?". Top-weighted, unlike Spearman over
    * the full list. Both rankings come from [[graft.ops.GlobalIndex]]'s
    * two-pass rank (never a global window); an item entering the
    * intersection at depth m = max(rank_a, rank_b) contributes the
    * PRECOMPUTED quantized tail weight Sq(m), so the whole statistic is
    * one 100-row join + one exact-BIGINT sum. */
  def q218Rbo(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.functions.TextFunctions.tokens
    val docs = graft.Tables.documents(s, d)
    val parts = s.sessionState.conf.numShufflePartitions
    def topRanks(score: Column, as: String): DataFrame =
      graft.ops.GlobalIndex.byScoreDesc(
        docs.select(score.cast("long"), $"doc_id").as[(Long, Long)], parts)
        .filter($"idx" < RboD)
        .select($"id", ($"idx" + 1L).as(as))
    val ra = topRanks($"n_chars", "ra")
    val rb = topRanks(size(tokens($"text")).cast("long"), "rb")
    val sq = array(rboSuffixQ.map(lit(_)): _*)
    ra.join(rb, Seq("id"))
      .select(element_at(sq, greatest($"ra", $"rb").cast("int")).as("w"))
      .agg(count(lit(1)).as("n_overlap"), sum($"w").as("sumq"))
      .select(lit(RboD).cast("bigint").as("depth"),
        lit(RboP).as("p"), $"n_overlap",
        roundp((lit(1.0) - RboP) * $"sumq" / lit(1e12), 6).as("rbo"))
  }

  val q218Sql: String = {
    val lst = rboSuffixQ.mkString("[", ", ", "]")
    s"""WITH ta AS (SELECT doc_id,
       |    row_number() OVER (ORDER BY n_chars DESC, doc_id) AS ra
       |  FROM documents),
       |tb AS (SELECT doc_id, row_number() OVER
       |    (ORDER BY len(${DuckSql.tokensSql}) DESC, doc_id) AS rb
       |  FROM documents),
       |j AS (SELECT greatest(ra, rb) AS m
       |  FROM ta JOIN tb USING (doc_id)
       |  WHERE ra <= $RboD AND rb <= $RboD),
       |a AS (SELECT count(*)::BIGINT AS n_overlap,
       |    sum(($lst)[m])::BIGINT AS sumq FROM j)
       |SELECT $RboD::BIGINT AS depth, CAST($RboP AS DOUBLE) AS p, n_overlap,
       |  ${DuckSql.roundpSql(s"(1.0 - $RboP) * sumq / 1e12", 6)} AS rbo
       |FROM a""".stripMargin
  }

  // ---------------------------------------------------------------- q219

  /** q219: reciprocal-rank fusion (RRF, k=60) of the same two scorers —
    * the standard hybrid-retrieval combiner (`Σ 1/(k + rankᵢ)`), here
    * fusing a cheap byte-length ranking with a token-count ranking into
    * one keep-list. Full-corpus ranks from the two-pass GlobalIndex
    * (window-free); the fused score is one double expression on two
    * exact BIGINT ranks — identical IEEE both engines — and the top-10
    * is a TakeOrdered on (score, id), never a global sort. */
  def q219RrfFusion(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.functions.TextFunctions.tokens
    val docs = graft.Tables.documents(s, d)
    val parts = s.sessionState.conf.numShufflePartitions
    def ranks(score: Column, as: String): DataFrame =
      graft.ops.GlobalIndex.byScoreDesc(
        docs.select(score.cast("long"), $"doc_id").as[(Long, Long)], parts)
        .select($"id", ($"idx" + 1L).as(as))
    val rrf = lit(1.0) / (lit(60L) + $"ra") + lit(1.0) / (lit(60L) + $"rb")
    ranks($"n_chars", "ra")
      .join(ranks(size(tokens($"text")).cast("long"), "rb"), Seq("id"))
      .select($"id".as("doc_id"), $"ra", $"rb", rrf.as("rrf"))
      .orderBy($"rrf".desc, $"doc_id")
      .limit(10)
      .select($"doc_id", $"ra", $"rb", roundp($"rrf", 6).as("rrf_score"))
  }

  val q219Sql: String =
    s"""WITH ta AS (SELECT doc_id,
       |    row_number() OVER (ORDER BY n_chars DESC, doc_id) AS ra
       |  FROM documents),
       |tb AS (SELECT doc_id, row_number() OVER
       |    (ORDER BY len(${DuckSql.tokensSql}) DESC, doc_id) AS rb
       |  FROM documents),
       |j AS (SELECT doc_id, ra, rb,
       |    1.0 / (60 + ra) + 1.0 / (60 + rb) AS rrf
       |  FROM ta JOIN tb USING (doc_id))
       |SELECT doc_id, ra, rb,
       |  ${DuckSql.roundpSql("rrf", 6)} AS rrf_score
       |FROM j ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q218_rbo" -> (q218Rbo _),
    "q219_rrf_fusion" -> (q219RrfFusion _),
    "q188_mahalanobis" -> (q188Mahalanobis _),
    "q187_covariance" -> (q187Covariance _),
    "q176_label_confusion"  -> (q176LabelConfusion _),
    "q239_kmeans_train"     -> (q239KmeansTrain _),
    "q240_pca_spectrum"     -> (q240PcaSpectrum _),
    "q166_matryoshka"       -> (q166Matryoshka _),
    "q167_sq8_recall"       -> (q167Sq8Recall _),
    "q155_diversity_sample" -> (q155DiversitySample _),
    "q123_bitext_mining" -> (q123BitextMining _),
    "q108_negative_sampling" -> (q108NegativeSampling _),
    "q30_embedding_neardup" -> (q30NearDup _),
    "q31_knn_brute"         -> (q31KnnBrute _),
    "q32_knn_lsh"           -> (q32KnnLsh _),
    "q40_knn_ivf"           -> (q40KnnIvf _),
    "q45_knn_pq"            -> (q45KnnPq _),
    "q49_knn_ivfpq"         -> (q49KnnIvfPq _),
    "q81_centroids"         -> (q81Centroids _),
    "q145_embedding_drift"  -> (q145EmbeddingDrift _),
    "q149_hard_negatives"   -> (q149HardNegatives _),
  )

  val oracles: Map[String, String] = Map(
    "q218_rbo" -> q218Sql,
    "q219_rrf_fusion" -> q219Sql,
    "q188_mahalanobis" -> q188Sql,
    "q187_covariance" -> q187Sql,
    "q176_label_confusion"  -> q176Sql,
    "q239_kmeans_train"     -> q239Sql,
    "q240_pca_spectrum"     -> q240Sql,
    "q166_matryoshka"       -> q166Sql,
    "q167_sq8_recall"       -> q167Sql,
    "q155_diversity_sample" -> q155Sql,
    "q123_bitext_mining" -> q123Sql,
    "q108_negative_sampling" -> q108Sql,
    "q30_embedding_neardup" -> q30Sql,
    "q31_knn_brute"         -> q31Sql,
    "q32_knn_lsh"           -> q32Sql,
    "q40_knn_ivf"           -> recallOracleSql(5),
    "q45_knn_pq"            -> recallOracleSql(5),
    "q49_knn_ivfpq"         -> recallOracleSql(5),
    "q81_centroids"         -> q81Sql,
    "q145_embedding_drift"  -> q145Sql,
    "q149_hard_negatives"   -> q149Sql,
  )
}
