package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.sources.JsonlCorpus

/** The JSONL ingestion face: lossless round-trip (incl. the characters JSON
  * must escape), declared corrupt-record policy, and shard control — the
  * properties an ingest of a 100 TB corpus actually leans on.
  */
class JsonlCorpusSpec extends SparkSpec {
  private val schema = StructType.fromDDL("doc_id BIGINT, text STRING, lang STRING")

  private def tmp() = java.nio.file.Files.createTempDirectory("graft-jsonl").toString

  test("round-trip is lossless for escapes, unicode, and nulls") {
    import spark.implicits._
    val rows = Seq(
      (1L, "plain text", "en"),
      (2L, "line\nbreak \"quoted\" back\\slash\ttab", "en"),
      (3L, "unicode: 大象 café ﬁ ", "zh"),
      (4L, null: String, null: String))
    val df = rows.toDF("doc_id", "text", "lang")
    val dir = tmp()
    JsonlCorpus.write(df, dir, shards = 2)
    val back = JsonlCorpus.readStrict(spark, dir, schema)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(back === rows.toSet)
  }

  test("shards controls the output file count") {
    import spark.implicits._
    val dir = tmp()
    JsonlCorpus.write((1 to 100).map(i => (i.toLong, s"d$i", "en"))
      .toDF("doc_id", "text", "lang"), dir, shards = 4)
    val parts = new java.io.File(dir).listFiles.count(_.getName.startsWith("part-"))
    assert(parts === 4)
  }

  test("permissive read quarantines a corrupt line; good rows survive intact") {
    val dir = tmp()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/shard0.jsonl"),
      ("""{"doc_id": 1, "text": "ok", "lang": "en"}""" + "\n" +
        """{"doc_id": "NOT A NUMBER}""" + "\n" +
        """{"doc_id": 3, "text": "also ok", "lang": "de"}""" + "\n").getBytes("UTF-8"))
    val df = JsonlCorpus.read(spark, dir, schema)
    assert(df.count() === 3)
    val bad = df.filter(col("_corrupt_record").isNotNull).collect()
    assert(bad.length === 1)
    assert(bad(0).getAs[String]("_corrupt_record").contains("NOT A NUMBER"))
    assert(bad(0).isNullAt(bad(0).fieldIndex("doc_id")),
      "a corrupt row's data columns must be null, never half-parsed")
    val good = df.filter(col("_corrupt_record").isNull)
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(good === Set((1L, "ok"), (3L, "also ok")))
  }

  test("strict read fails fast on the same corpus") {
    val dir = tmp()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/shard0.jsonl"),
      ("""{"doc_id": 1, "text": "ok", "lang": "en"}""" + "\n" +
        """not json at all""" + "\n").getBytes("UTF-8"))
    val e = intercept[org.apache.spark.SparkException] {
      JsonlCorpus.readStrict(spark, dir, schema).collect()
    }
    assert(e.getMessage.toLowerCase.contains("malformed") ||
      Option(e.getCause).exists(_.getMessage.toLowerCase.contains("malformed")))
  }
}
