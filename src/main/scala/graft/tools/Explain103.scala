// temp debug
package graft
import org.apache.spark.sql.SparkSession
object Explain103 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = queries.GraphQueries.q103Triangles(spark, "/root/testdata/sf0.001")
    println(df.queryExecution.executedPlan.toString.take(60000))
    spark.stop()
  }
}
