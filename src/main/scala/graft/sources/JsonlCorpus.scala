package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL corpus source/sink — the interchange format training corpora
  * actually ship in (one JSON object per line; shardable; append-friendly).
  * The reference's surface is SQL-table-to-SQL-table (SURVEY §2.1/§2.11);
  * this is the ingestion/export face a training-data pipeline bolts onto
  * that surface.
  *
  * 100 TB posture:
  *   - uncompressed (or splittable-codec) JSONL is LINE-splittable, so the
  *     read parallelizes per HDFS/S3 split exactly like parquet minus
  *     column pruning — fine for ingest-once, wrong for repeated analytics
  *     (convert to parquet after ingest; that conversion is [[write]]'s
  *     inverse and the js1 registry face proves it lossless);
  *   - schema is EXPLICIT, never inferred: inference is a full extra pass
  *     over the corpus and can drift per shard batch;
  *   - corrupt records follow a DECLARED policy instead of killing a
  *     1000-executor job mid-ingest: [[read]] surfaces them in a corrupt
  *     column for quarantine ([[readStrict]] fail-fast is the ingest-gate
  *     variant).
  */
object JsonlCorpus {

  /** Sharded JSONL export. `shards > 0` fixes the output file count (one
    * round-robin exchange); 0 keeps the upstream partitioning (no shuffle).
    *
    * `codec` compresses the shards (gzip/bzip2/zstd/...). The parallelism
    * consequence is the part that matters at 100 TB and is pinned in
    * JsonlCorpusSpec: gzip (and zstd/deflate as Spark writes them —
    * single-member streams) is NOT line-splittable, so each shard is
    * exactly one read task no matter its size — shard count chosen at
    * WRITE time is the read parallelism forever. bzip2 IS block-splittable
    * (Hadoop's BZip2Codec reads from any 900k block boundary), so a big
    * shard still fans out. Rule: compressed JSONL shards must be sized
    * like tasks (~100-500 MB), or use a splittable codec.
    */
  def write(df: DataFrame, dir: String, shards: Int = 0,
      codec: Option[String] = None): Unit = {
    val out = if (shards > 0) df.repartition(shards) else df
    val w = out.write.mode("overwrite")
    codec.fold(w)(c => w.option("compression", c)).json(dir)
  }

  /** Permissive read: rows whose line fails to parse (or whose fields
    * violate the schema) land with `corruptCol` = the raw line and data
    * columns null — quarantine by `col(corruptCol).isNotNull`.
    */
  def read(spark: SparkSession, dir: String, schema: StructType,
      corruptCol: String = "_corrupt_record"): DataFrame =
    spark.read
      .schema(schema.add(corruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(dir)

  /** Fail-fast read for ingest gates: any malformed line aborts the job. */
  def readStrict(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(dir)

  /** Temp directory deleted on JVM exit — for session-scoped corpus
    * exports (the js1/js2 registry faces write a full corpus copy per
    * session; without cleanup, repeated bench/verify sessions accumulate
    * orphaned copies under /tmp).
    */
  def tempCorpusDir(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(dir.toFile)
    }))
    dir.toString
  }
}
