// scratch: stage-wise q58 timing — run with
//   sbt -batch "runMain graft.ProfQ58"
package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

object ProfQ58 {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("PROF_SF", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    val docs = Tables.documents(spark, sf)
    time("warmup") { docs.select(sum(length(col("text")))).collect() }

    time("current-plan") {
      ops.Dedup.substringPairs(docs, "doc_id", "text", 30, Some(1000)).count()
    }

    // variant A: persist the exploded windows so the scan+explode+hash
    // runs once instead of twice
    time("persisted-windows") {
      val wins0 = docs.select(col("doc_id").cast("long").as("doc_id"),
          explode(graft.functions.ShingleExpressions.charWindows(
            col("text"), 30)).as("sub"))
        .withColumn("h", xxhash64(col("sub")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val keep = wins0.groupBy("h").count()
        .filter(col("count") >= 2 && col("count") <= 1000).select("h")
      val sets = wins0.join(keep, Seq("h"), "left_semi")
        .groupBy("sub").agg(sort_array(collect_set(col("doc_id"))).as("ds"))
        .filter(size(col("ds")) >= 2)
      val n = sets.select(col("sub"), explode(expr(
          "flatten(transform(ds, (a, i) -> " +
          "transform(slice(ds, i + 2, size(ds)), b -> struct(a, b))))")).as("pr"))
        .groupBy(col("pr.a").as("id_a"), col("pr.b").as("id_b"))
        .agg(count(lit(1)).as("shared"), min(col("sub")).as("example"))
        .count()
      wins0.unpersist()
      n
    }

    // variant B: one scan, two shuffles — group all windows by hash once
    // (typed flatMapGroups), segregate by sub inside the group, emit
    // (id_a, id_b, sub) triples, final pair agg
    time("single-scan-typed") {
      import spark.implicits._
      val wins0 = docs.select(col("doc_id").cast("long").as("doc_id"),
          explode(graft.functions.ShingleExpressions.charWindows(
            col("text"), 30)).as("sub"))
        .withColumn("h", xxhash64(col("sub")))
        .as[(Long, String, Long)]
      val triples = wins0.groupByKey(_._3).flatMapGroups { (_, it) =>
        val bySub = new scala.collection.mutable.HashMap[String, java.util.TreeSet[Long]]
        var n = 0
        it.foreach { case (id, sub, _) =>
          n += 1
          if (n <= 1001)
            bySub.getOrElseUpdate(sub, new java.util.TreeSet[Long]).add(id)
        }
        if (n < 2 || n > 1000) Iterator.empty
        else bySub.iterator.flatMap { case (sub, ids) =>
          val arr = new Array[Long](ids.size)
          val ii = ids.iterator; var k = 0
          while (ii.hasNext) { arr(k) = ii.next(); k += 1 }
          for (i <- (0 until arr.length).iterator; j <- (i + 1 until arr.length).iterator)
            yield (arr(i), arr(j), sub)
        }
      }.toDF("id_a", "id_b", "sub")
      triples.groupBy("id_a", "id_b")
        .agg(count(lit(1)).as("shared"), min(col("sub")).as("example"))
        .count()
    }
    // second round, warm JVM — order-bias check
    time("current-plan-2") {
      ops.Dedup.substringPairs(docs, "doc_id", "text", 30, Some(1000)).count()
    }
    // stage breakdown of the hash-pos plan
    val hp = graft.functions.ShingleExpressions.charWindowHashPos(col("text"), 30)
    time("hashpos-scan-only") {
      docs.select(explode(hp).as("w")).select(sum(col("w.pos"))).collect()
    }
    time("pass1-dfcount") {
      docs.select(explode(hp).as("w"))
        .groupBy(col("w.h").as("h")).count()
        .filter(col("count") >= 2 && col("count") <= 1000).count()
    }
    time("current-plan-3") {
      ops.Dedup.substringPairs(docs, "doc_id", "text", 30, Some(1000)).count()
    }
    time("pass1-noCoalesce") {
      val key = "spark.sql.adaptive.coalescePartitions.enabled"
      val prior = spark.conf.get(key)
      spark.conf.set(key, "false")
      try docs.select(explode(hp).as("w"))
        .groupBy(col("w.h").as("h")).count()
        .filter(col("count") >= 2 && col("count") <= 1000).count()
      finally spark.conf.set(key, prior)
    }
    time("pass1-repart32") {
      docs.select(explode(hp).as("w"))
        .select(col("w.h").as("h"))
        .repartition(32, col("h"))
        .groupBy(col("h")).count()
        .filter(col("count") >= 2 && col("count") <= 1000).count()
    }
    time("pass1-sortRuns") {
      // no hash table: exchange on h, sort each partition's longs, count
      // runs — keep h iff run length in [2, maxDf]
      import spark.implicits._
      docs.select(explode(hp).as("w"))
        .select(col("w.h").as("h"))
        .repartition(32, col("h"))
        .as[Long]
        .mapPartitions { it =>
          val a = it.toArray
          java.util.Arrays.sort(a)
          val out = Array.newBuilder[Long]
          var i = 0
          while (i < a.length) {
            var j = i + 1
            while (j < a.length && a(j) == a(i)) j += 1
            val c = j - i
            if (c >= 2 && c <= 1000) out += a(i)
            i = j
          }
          out.result().iterator
        }.count()
    }
    time("full-sortRuns") {
      import spark.implicits._
      val keep = docs.select(explode(hp).as("w"))
        .select(col("w.h").as("h"))
        .repartition(32, col("h"))
        .as[Long]
        .mapPartitions { it =>
          val a = it.toArray
          java.util.Arrays.sort(a)
          val out = Array.newBuilder[Long]
          var i = 0
          while (i < a.length) {
            var j = i + 1
            while (j < a.length && a(j) == a(i)) j += 1
            val c = j - i
            if (c >= 2 && c <= 1000) out += a(i)
            i = j
          }
          out.result().iterator
        }.toDF("h")
      val sets = docs.select(col("doc_id").cast("long").as("doc_id"),
          col("text").as("t"), explode(hp).as("w"))
        .withColumn("h", col("w.h"))
        .join(keep, Seq("h"), "left_semi")
        .select(col("doc_id"), col("t").substr(col("w.pos"), lit(30)).as("sub"))
        .groupBy("sub").agg(sort_array(collect_set(col("doc_id"))).as("ds"))
        .filter(size(col("ds")) >= 2)
      sets.select(col("sub"), explode(expr(
          "flatten(transform(ds, (a, i) -> " +
          "transform(slice(ds, i + 2, size(ds)), b -> struct(a, b))))")).as("pr"))
        .groupBy(col("pr.a").as("id_a"), col("pr.b").as("id_b"))
        .agg(count(lit(1)).as("shared"), min(col("sub")).as("example"))
        .count()
    }
    time("pass1-noPartialAgg") {
      // partial agg on ~all-distinct keys builds a 9M-entry map per task
      // just to emit the same rows — measure skipping it via typed agg
      import spark.implicits._
      docs.select(explode(hp).as("w")).select(col("w.h")).as[Long]
        .rdd.map(h => (h, 1L)).reduceByKey(_ + _, 32)
        .filter(kv => kv._2 >= 2 && kv._2 <= 1000).count()
    }
    spark.stop()
  }
}
