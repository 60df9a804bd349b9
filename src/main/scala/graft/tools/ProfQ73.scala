package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-cost split for q73 fuzzy join / q99 entity resolution. */
object ProfQ73 {
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
    val docs = graft.Tables.documents(spark, sf)
    docs.count()
    val doc = docs.select($"doc_id", substring($"text", 1, 12).as("blk"),
      substring($"text", 1, 80).as("w80"))

    // candidate volume
    val nPairs = doc.as("a").join(doc.as("b"),
      $"a.blk" === $"b.blk" && $"a.doc_id" < $"b.doc_id").count()
    println(s"CANDPAIRS $nPairs")

    time3("join-only") {
      doc.as("a").join(doc.as("b"),
        $"a.blk" === $"b.blk" && $"a.doc_id" < $"b.doc_id").count()
    }
    time3("join-lev") {
      doc.as("a").join(doc.as("b"),
          $"a.blk" === $"b.blk" && $"a.doc_id" < $"b.doc_id")
        .select(levenshtein($"a.w80", $"b.w80", 30).as("d"))
        .filter($"d" =!= -1).count()
    }
    time3("q73-full") { graft.queries.DedupQueries.q73FuzzyJoin(spark, sf).count() }
    time3("q99-full") { graft.queries.DedupQueries.q99EntityResolution(spark, sf).count() }
    println("EXPLAIN:")
    doc.as("a").join(doc.as("b"),
      $"a.blk" === $"b.blk" && $"a.doc_id" < $"b.doc_id").explain()
    spark.stop()
  }
}
