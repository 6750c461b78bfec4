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

  test("codec splittability: gzip shard = one task forever, bzip2 still fans out") {
    // THE compressed-JSONL scale consequence (round-13 verdict item #3):
    // a gzip stream can only be decoded from byte 0, so a gzip shard is
    // exactly one read partition no matter how small the split size — the
    // shard count chosen at WRITE time is the read parallelism forever.
    // bzip2 is block-splittable (Hadoop can resync at any 900k block), so
    // one big bzip2 shard still fans out. Pinned with a split size far
    // below the file size so the only variable is the codec.
    import spark.implicits._
    // md5-hex text: effectively incompressible, so the gzip file stays far
    // above the split size and the bzip2 file spans multiple 900k blocks
    // (a genuinely multi-block stream, not just a schedulable one)
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String): String = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val rows = (1 to 20000).map { i =>
      (i.toLong, (0 until 8).map(j => hex(s"$i-$j")).mkString(" "), "en")
    }.toDF("doc_id", "text", "lang")

    def partsWithSmallSplits(dir: String): Int = {
      val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
      try {
        spark.conf.set("spark.sql.files.maxPartitionBytes", "64k")
        JsonlCorpus.readStrict(spark, dir, schema).rdd.getNumPartitions
      } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    }

    val gzDir = tmp()
    JsonlCorpus.write(rows, gzDir, shards = 1, codec = Some("gzip"))
    val gzBytes = new java.io.File(gzDir).listFiles
      .filter(_.getName.startsWith("part-")).map(_.length).sum
    assert(gzBytes > 512 * 1024, s"fixture too small to prove anything: $gzBytes B")
    assert(partsWithSmallSplits(gzDir) === 1,
      "a gzip shard must stay one partition even at 64k splits")

    val bzDir = tmp()
    JsonlCorpus.write(rows, bzDir, shards = 1, codec = Some("bzip2"))
    val bzParts = partsWithSmallSplits(bzDir)
    assert(bzParts > 1, s"a bzip2 shard must split ($bzParts partitions)")

    // and both round-trip losslessly (the js2 registry face hash-proves
    // gzip against the real corpus; this pins bzip2 too)
    val back = JsonlCorpus.readStrict(spark, bzDir, schema)
    assert(back.count() === 20000)
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
