package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Incremental

class IncrementalSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  test("withExists probes per-partition and appends a boolean column (A8)") {
    val urls = (1 to 100).map(i => s"s3://bucket/obj$i").toDF("url")
      .repartition(4)
    // probe factory instantiated once per partition — count instantiations
    val probed = Incremental.withExists(urls, "url") { () =>
      // a "client": exists iff the object number is even
      (u: String) => u.substring(u.lastIndexOf("obj") + 3).toInt % 2 == 0
    }
    val rows = probed.collect()
    assert(rows.length == 100)
    assert(rows.count(_.getAs[Boolean]("exists")) == 50)
    // anti-pattern composition: only missing urls remain
    val missing = probed.filter(!col("exists")).count()
    assert(missing == 50)
  }

  test("missing() is an exact left-anti on the key (J3)") {
    val req = Seq("a", "b", "c", "d").toDF("url")
    val have = Seq("b", "d", "zz").toDF("url")
    val out = Incremental.missing(req, have, "url").as[String].collect().sorted
    assert(out.sameElements(Array("a", "c")))
  }
}
