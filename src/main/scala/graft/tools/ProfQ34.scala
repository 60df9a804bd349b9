// scratch: q34 phase timing — sbt -batch "runMain graft.tools.ProfQ34"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

object ProfQ34 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("PROF_SF", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    time("warm-batch") {
      locally { val ev = graft.Tables.load(spark, d, "events")
        ev.withColumn("ts_conv",
          if (ev.schema("ts").dataType == org.apache.spark.sql.types.LongType)
            timestamp_micros(expr("ts div 1000")) else col("ts")) }
        .groupBy(window(col("ts_conv"), "5 minutes"), col("event_type"))
        .agg(count(lit(1))).count()
    }
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "8")
    val schema = graft.Tables.load(s, d, "events").schema
    val base = new java.io.File(sys.props("java.io.tmpdir"), "graft_q34_dbg")
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete(): Unit
    }
    rmrf(base)
    val outDir = new java.io.File(base, "out").getAbsolutePath
    val ckDir = new java.io.File(base, "ck").getAbsolutePath
    val q = time("stream-total") {
      val stream = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
        .withColumn("ts_conv",
          if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
            timestamp_micros(expr("ts div 1000")) else col("ts"))
        .withWatermark("ts_conv", "0 seconds")
        .groupBy(window(col("ts_conv"), "5 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
        .select(col("w.start").as("win_start"), col("event_type"), col("n"), col("sum_v"))
      val q = stream.writeStream.outputMode("update")
        .option("checkpointLocation", ckDir)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          time(s"  foreachBatch $id") {
            b.withColumn("batch_id", lit(id)).write.mode("append").parquet(outDir)
          }: Unit
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(); q
    }
    q.recentProgress.foreach { p =>
      println(s"PROGRESS batch=${p.batchId} rows=${p.numInputRows} " +
        s"durations=${p.durationMs}")
    }
    time("readback") {
      val latest = org.apache.spark.sql.expressions.Window
        .partitionBy("win_start", "event_type").orderBy(col("batch_id").desc)
      s.read.parquet(outDir)
        .withColumn("rn", row_number().over(latest)).filter(col("rn") === 1)
        .count()
    }
    spark.stop()
  }
}
