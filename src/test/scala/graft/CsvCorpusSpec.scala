package graft

import org.apache.spark.sql.functions._

import graft.sources.CsvCorpus

/** The CSV edge's contracts ([[CsvCorpus]]): hostile-content round-trip,
  * the multiLine one-task-per-file scale trap (and the splittable
  * newline-free alternative), and FAILFAST on malformed rows.
  */
class CsvCorpusSpec extends SparkSpec {

  private def tmp() = graft.sources.JsonlCorpus.tempCorpusDir("graft-csv-spec")
  import org.apache.spark.sql.types._
  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  test("quotes, commas, newlines and empty fields survive the round trip") {
    import spark.implicits._
    val rows = Seq(
      (1L, "plain"),
      (2L, "comma, inside"),
      (3L, "a \"quoted\" word"),
      (4L, "two\nlines"),
      (5L, ""),
      (6L, "\",\n\"")) // all three hazards adjacent
    val dir = tmp()
    CsvCorpus.write(rows.toDF("id", "v"), dir, shards = 2)
    val back = CsvCorpus.readStrict(spark, dir, schema)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // Spark's CSV writer emits nothing for an empty string and the reader
    // hands it back as null — the one lossy corner, asserted so it can
    // never drift silently into "lossless"
    val expect = rows.map { case (i, v) => (i, if (v.isEmpty) null else v) }.toSet
    assert(back === expect)
  }

  test("multiLine read is one task per file; newline-free CSV splits") {
    import spark.implicits._
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String): String = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def rows(nl: Boolean) = (1 to 20000).map { i =>
      val body = (0 until 8).map(j => hex(s"$i-$j")).mkString(" ")
      (i.toLong, if (nl && i % 2 == 0) body + "\nsecond line" else body)
    }.toDF("id", "v")
    def withSmallSplits[A](f: => A): A = {
      val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
      try { spark.conf.set("spark.sql.files.maxPartitionBytes", "64k"); f }
      finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    }
    val mlDir = tmp()
    CsvCorpus.write(rows(nl = true), mlDir, shards = 2)
    val mlParts = withSmallSplits(
      CsvCorpus.readStrict(spark, mlDir, schema).rdd.getNumPartitions)
    assert(mlParts === 2,
      s"a multiLine csv file must stay one partition even at 64k splits: $mlParts")

    val flatDir = tmp()
    CsvCorpus.write(rows(nl = false), flatDir, shards = 1)
    val flatParts = withSmallSplits(
      CsvCorpus.readSplittable(spark, flatDir, schema).rdd.getNumPartitions)
    assert(flatParts > 1, s"newline-free csv must split ($flatParts partitions)")
  }

  test("FAILFAST read dies on a malformed row instead of silently nulling") {
    import spark.implicits._
    val dir = tmp()
    CsvCorpus.write(Seq((1L, "ok")).toDF("id", "v"), dir, shards = 1)
    // corrupt: a row whose id column can't be a long
    val f = new java.io.File(dir).listFiles
      .filter(_.getName.startsWith("part-")).head
    java.nio.file.Files.write(f.toPath,
      "not_a_long,boom\n".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.APPEND)
    val ex = intercept[org.apache.spark.SparkException] {
      CsvCorpus.readStrict(spark, dir, schema).collect()
    }
    assert(ex.getMessage != null)
  }

  test("ORC keeps columnar virtues the text formats lose: pushdown + pruning") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // orc1's scale point: unlike CSV/JSONL transport, an ORC re-read is a
    // real columnar scan — a filter reaches the reader as PushedFilters
    // and a projection narrows ReadSchema (a text re-read always parses
    // every byte of every line before any predicate runs)
    val rows = (1L to 1000L).map(i => (i, s"v$i", i % 7)).toDF("id", "v", "m")
    val dir = tmp()
    rows.repartition(2).write.mode("overwrite").orc(dir)
    val q = spark.read.orc(dir).filter(col("id") > 900L).select("id", "v")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,900)"),
      s"filter did not reach the ORC scan:\n$scan")
    assert(scan.contains("ReadSchema: struct<id:bigint,v:string>"),
      s"projection did not prune the ORC read:\n$scan")
    assert(q.count() === 100L)
  }
}
