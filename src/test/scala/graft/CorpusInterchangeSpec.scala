package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.CorpusInterchange

/** JSONL interchange: write → read round-trips the documents table
  * exactly; malformed lines quarantine instead of aborting or silently
  * disappearing. */
class CorpusInterchangeSpec extends AnyFunSuite with SparkSpecBase {
  import spark.implicits._

  test("writeJsonl -> readJsonl round-trips the documents table exactly") {
    val docs = Tables.documents(spark, sfSmoke)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-jsonl").toString + "/docs"
    CorpusInterchange.writeJsonl(docs, dir)
    val (clean, rejects) = CorpusInterchange.readJsonl(spark, dir)
    assert(rejects.count() == 0)
    val a = docs.orderBy($"doc_id").collect().map(_.toSeq).toSeq
    val b = clean.orderBy($"doc_id").collect().map(_.toSeq).toSeq
    assert(a == b, "JSONL round-trip must be lossless")
    // the files really are line-delimited JSON text
    val part = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && !f.getName.endsWith(".crc"))
      .head
    val first = scala.io.Source.fromFile(part).getLines().next()
    assert(first.startsWith("{") && first.contains("\"doc_id\""))
  }

  test("malformed lines quarantine; partial docs parse with nulls") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-jsonl-bad").toString
    val f = new java.io.File(dir, "mixed.jsonl")
    java.nio.file.Files.writeString(f.toPath,
      """{"doc_id": 1, "text": "good row", "lang": "en", "source": "s", "n_chars": 8}
        |this is not json at all
        |{"doc_id": 2, "text": "missing fields"}
        |{"doc_id": "notanumber", "text": "type clash"}
        |""".stripMargin)
    val (clean, rejects) = CorpusInterchange.readJsonl(spark, dir)
    val rows = clean.orderBy($"doc_id").collect()
    // row 1 full; row 2 parses with null lang/source/n_chars; the type
    // clash and the non-JSON line are quarantined with their raw text
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(rows(1).isNullAt(2) && rows(1).isNullAt(3) && rows(1).isNullAt(4))
    val bad = rejects.as[String].collect()
    assert(bad.length == 2, bad.toSeq)
    assert(bad.exists(_.contains("not json")) &&
      bad.exists(_.contains("notanumber")))
  }
}
