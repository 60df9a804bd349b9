package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-cost split for q32 kNN-LSH. */
object ProfQ32 {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("PROF_SF", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    def time3(name: String)(f: => Any): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f
        graft.ops.ScratchCache.releaseAll(); spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"STAGE $name%-24s ${ts.map(t => f"$t%6.3f").mkString(" ")}")
    }
    val emb = graft.Tables.embeddings(spark, sf)
    emb.count()
    def buckets(side: org.apache.spark.sql.DataFrame, idAs: String) = side
      .select(col("vec_id").as(idAs),
        posexplode(graft.functions.HashExpressions.hyperplaneSigs(
          col("embedding"), 4, 64, 8)))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bucket")

    time3("corpus-buckets") { buckets(emb, "cid").count() }
    time3("cands-distinct") {
      val qb = broadcast(buckets(emb.filter($"vec_id" < 20), "qid"))
      buckets(emb, "cid").join(qb, Seq("tbl", "bucket"))
        .filter(col("qid") =!= col("cid"))
        .select(graft.ops.PackedPair.pack(col("qid"), col("cid")).as("pair"))
        .distinct().count()
    }
    time3("scored-norank") {
      val qb = broadcast(buckets(emb.filter($"vec_id" < 20), "qid"))
      val cands = buckets(emb, "cid").join(qb, Seq("tbl", "bucket"))
        .filter(col("qid") =!= col("cid"))
        .select(graft.ops.PackedPair.pack(col("qid"), col("cid")).as("pair"))
        .distinct()
        .select(graft.ops.PackedPair.idA(col("pair")).as("qid"),
          graft.ops.PackedPair.idB(col("pair")).as("cid"))
      val qv = broadcast(emb.filter($"vec_id" < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qv")))
      cands.join(qv, Seq("qid"))
        .join(emb.select(col("vec_id").as("cid"), col("embedding").as("cv")), Seq("cid"))
        .select(col("qid"), col("cid"),
          graft.functions.TextFunctions.roundp(
            graft.functions.VectorFunctions.cosine(col("qv"), col("cv")), 6).as("cos"))
        .count()
    }
    time3("full") {
      graft.queries.SimilarityQueries.q32KnnLsh(spark, sf).count()
    }
    spark.stop()
  }
}
