package graft.ops

import java.text.Normalizer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** E1 — tag normalization (SURVEY.md §2.9).
  *
  * The reference shells out to a Rust binary over a stdin/stdout pipe
  * (reference: src/normalize_tags.mjs:3-20, invoked src/index.mjs:35-39); the
  * algorithm lives in an un-checked-out submodule, so the observable contract
  * is only "deterministic line -> line string function". We define a
  * documented normalization and pin it with property tests
  * (SURVEY.md §7.5 risk 2):
  *
  *   1. Unicode NFKC fold (compatibility normalize, e.g. ﬁ -> fi)
  *   2. lowercase
  *   3. trim
  *   4. collapse runs of whitespace to a single space
  *
  * Implemented as a plain Scala function (injectable `String => String`) and
  * exposed as a registered UDF so it is usable from SQL. A UDF (not a Catalyst
  * Expression) is deliberate: the function is called once per *distinct* tag
  * via the dictionary build (A4), not once per row, so codegen would buy
  * nothing (SURVEY.md §7.4).
  */
object TagNormalize {

  /** The injectable normalization function. Total: never returns null. */
  val normalize: String => String = { s =>
    if (s == null) ""
    else {
      val folded = Normalizer.normalize(s, Normalizer.Form.NFKC)
      folded.toLowerCase.trim.replaceAll("\\s+", " ")
    }
  }

  private val normalizeUdf = udf(normalize)

  /** Column form. */
  def normalizeTag(c: Column): Column = normalizeUdf(c)

  /** SQL registration: `SELECT normalize_tag(name) FROM ...`. */
  def register(spark: SparkSession): Unit =
    spark.udf.register("normalize_tag", normalize)

  /** E1 route (2) — the reference's actual mechanism: pipe the tag stream
    * through an EXTERNAL command, one tag per stdin line, one normalized tag
    * per stdout line, results zipped back POSITIONALLY
    * (reference src/normalize_tags.mjs:8: `tags[i] -> lines[i]`).
    *
    * `RDD.pipe` is the distributed form of that contract: each partition
    * forks the command once, streams its rows as lines, and reads back lines
    * in order — so `zip` (same partitioning, same per-partition counts,
    * REQUIRES the command to emit exactly one line per input line) restores
    * the pairing without any join key, exactly like the reference's
    * index-zip. One process per partition, not per row: at 1000 executors
    * that is 1000 long-lived subprocesses, each saturated by its partition.
    *
    * Tags must be newline-free (the reference has the same constraint — a
    * newline inside a tag would desync its zip too).
    *
    * Single-pass: round 2 implemented this as `in.zip(in.pipe(cmd))`, whose
    * ZippedPartitions evaluates BOTH lineages — the tag scan ran twice per
    * task (VERDICT r2 #3). This form forks the process inside one
    * mapPartitions: a writer thread streams the partition to stdin while
    * parking each input line on a bounded queue, and the task thread pairs
    * stdout lines against the queue — the positional zip, held in O(queue)
    * memory, over exactly one scan.
    *
    * @return (tag, normalized) pairs, one per input row.
    */
  def normalizeViaPipe(
      spark: SparkSession, tags: org.apache.spark.sql.DataFrame,
      command: Seq[String]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val cmd = command.toList
    tags.select("tag").as[String].rdd.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val proc = new ProcessBuilder(cmd: _*).start()
        // Bounded: the writer can run at most `capacity` lines ahead of the
        // reader, so retained input is O(1) regardless of partition size.
        val pending = new java.util.concurrent.LinkedBlockingQueue[String](1024)
        // stderr drainer: a chatty child must never block on a full stderr
        // pipe; keep a bounded tail for the failure message.
        val errTail = new StringBuilder
        val errDrainer = new Thread(() => {
          val er = new java.io.BufferedReader(new java.io.InputStreamReader(
            proc.getErrorStream, java.nio.charset.StandardCharsets.UTF_8))
          try {
            var l = er.readLine()
            while (l != null) {
              errTail.synchronized {
                if (errTail.length < 8192) errTail.append(l).append('\n')
              }
              l = er.readLine()
            }
          } catch { case _: java.io.IOException => () }
        }, "graft-pipe-stderr")
        errDrainer.setDaemon(true)
        errDrainer.start()
        // writerOk only flips after the WHOLE partition was consumed and
        // written: a child that stops reading early (broken pipe) or an
        // interrupt leaves it false, which end-of-stream validation turns
        // into an error instead of a silently short result.
        @volatile var writerOk = false
        val writer = new Thread(() => {
          val w = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
            proc.getOutputStream, java.nio.charset.StandardCharsets.UTF_8))
          try {
            try it.foreach { t =>
              // NEVER park on a full queue with unflushed bytes: the child
              // may not have received the lines the reader is waiting on —
              // writer (queue full) / reader (no output) / child (no input)
              // would starve three ways. Flush first, then block.
              if (!pending.offer(t)) { w.flush(); pending.put(t) }
              w.write(t); w.newLine()
            }
            finally w.close()
            writerOk = true
          } catch { case _: java.io.IOException => () }
        }, "graft-pipe-writer")
        writer.setDaemon(true)
        writer.start()
        val r = new java.io.BufferedReader(new java.io.InputStreamReader(
          proc.getInputStream, java.nio.charset.StandardCharsets.UTF_8))
        new Iterator[(String, String)] {
          private var nextLine: String = null
          private var primed = false
          private var validated = false

          // End-of-stream validation lives on the hasNext path so a command
          // that fails BEFORE emitting any output still errors instead of
          // yielding an empty partition. By stdout-EOF the writer is either
          // already finished (normal path: it closed stdin first) or doomed
          // (child gone; it is parked in pending.put or a dead pipe write) —
          // a short join then interrupt, never an unbounded join that would
          // deadlock the task on an under-producing child.
          private def validate(): Unit = if (!validated) {
            validated = true
            writer.join(2000)
            if (writer.isAlive) { writer.interrupt(); writer.join(10000) }
            val code = proc.waitFor()
            val err = errTail.synchronized(errTail.toString)
            require(code == 0, s"pipe command $cmd exited with $code" +
              (if (err.nonEmpty) s"; stderr: $err" else ""))
            require(writerOk && pending.isEmpty,
              s"pipe command $cmd emitted fewer lines than inputs (zip desync)")
          }

          private def prime(): Unit = if (!primed) {
            nextLine = r.readLine()
            if (nextLine == null) validate()
            primed = true
          }

          // An extra stdout line with nothing left to pair against means the
          // command broke the line-per-line contract — fail, don't hang: the
          // short poll rechecks whether the writer can still produce a tag.
          private def takeTag(): String = {
            var tag: String = null
            while (tag == null) {
              tag = pending.poll(100, java.util.concurrent.TimeUnit.MILLISECONDS)
              if (tag == null && !writer.isAlive && pending.isEmpty)
                throw new IllegalArgumentException(
                  s"pipe command $cmd emitted more lines than inputs (zip desync)")
            }
            tag
          }

          def hasNext: Boolean = { prime(); nextLine != null }
          def next(): (String, String) = {
            prime()
            if (nextLine == null) throw new NoSuchElementException("end of pipe output")
            val out = nextLine
            val tag = takeTag()
            primed = false
            (tag, out)
          }
        }
      }
    }.toDF("tag", "normalized")
  }
}
