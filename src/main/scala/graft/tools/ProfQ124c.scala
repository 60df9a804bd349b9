package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolate the q124 tagged-pass cost. */
object ProfQ124c {
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
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"STAGE $name%-24s ${ts.map(t => f"$t%6.3f").mkString(" ")}")
    }
    val docs = graft.Tables.documents(spark, sf)
    docs.count()
    val sources = docs.select($"source").distinct().orderBy($"source")
      .limit(64).as[String].collect()
    println(s"NSOURCES ${sources.length}")
    val bitOf = element_at(
      map(sources.zipWithIndex.flatMap { case (src, i) =>
        Seq(lit(src), lit(1L << i)) }: _*), $"source")
    def hist = graft.ops.FanOut.cpu(docs).select($"source", explode(
        graft.functions.ShingleExpressions.wordShingleHashes64($"text", 3))
        .as("sh64"))
      .select($"sh64", bitOf.as("bit"))
      .groupBy($"sh64").agg(bit_or($"bit").as("m"))
      .groupBy($"m").agg(count(lit(1)).as("c"))
    time3("hist-collect") { println("NMASKS " + hist.collect().length) }
    val bits = "filter(sequence(0, 62), bi -> ((m >> bi) & 1) = 1)"
    time3("tagged-collect") {
      hist.select(explode(expr(
        s"""concat(
           |  flatten(transform($bits, (a, ai) ->
           |    transform(slice($bits, ai + 2, size($bits)),
           |      b -> named_struct('i', a, 'j', b)))),
           |  transform($bits, a -> named_struct('i', a, 'j', -1)))"""
          .stripMargin)).as("p"), $"c")
      .groupBy($"p.i".as("i"), $"p.j".as("j")).agg(sum($"c").as("n"))
      .collect().length
    }
    spark.stop()
  }
}
