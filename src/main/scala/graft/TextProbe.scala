package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Interleaved A/B probe for the text/dedup rungs (not part of the driver
  * contract). Synthesizes the EXACT sweep text corpus (planted near-dups +
  * boilerplate lines, Sweep.scala text ladder) at a given size and times
  * minhashLsh + dupNgramSpans, printing one JSON line with every repeat
  * and the window's scheduling floor. Run alternately from two builds'
  * class dirs in one quiet window to measure a code delta with the box
  * drift cancelled (the r13 A/B pattern):
  *
  *   java \$OPTS -cp "OLD/classes:\$SPARK_JARS" graft.TextProbe 200000 2 old
  *   java \$OPTS -cp "NEW/classes:\$SPARK_JARS" graft.TextProbe 200000 2 new
  *   ... repeated A/B/A/B ...
  *
  * Args: [nDocs] [timedReps] [tag]. Each invocation pays its own JIT
  * warm-up (one untimed rep per op) so both sides publish steady state.
  */
object TextProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val tag = args.lift(2).getOrElse("?")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(master = s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val parts = math.min(cpus.toInt, math.max(1, (n / 25000L).toInt))
    val vocab = array((0 until 64).map(i => lit(s"w${i}x")): _*)
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat(
        when(pmod(col("id"), lit(3)) === 0,
          lit("please accept our cookie notice to continue\n")).otherwise(lit("")),
        concat_ws(" ", transform(sequence(lit(0), lit(39)), j =>
          element_at(vocab, pmod(xxhash64(
            when(pmod(col("id"), lit(10)) === 9, col("id") - 1).otherwise(col("id"))
              * 1009L + j), lit(64)).cast("int") + 1))),
        when(pmod(col("id"), lit(10)) === 9, lit(" zzdup")).otherwise(lit(""))
      ).as("text"))
      .repartition(parts).persist()
    docs.count()

    val floorT0 = System.nanoTime()
    spark.sparkContext.runJob(docs.rdd, (_: Iterator[org.apache.spark.sql.Row]) => 0)
    val floorMs = (System.nanoTime() - floorT0) / 1e6

    def timed(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = body
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    // total shuffle-write bytes during `body` (the Sweep listener probe)
    def shuffleBytes(body: => Unit): Long = {
      val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        body
        var last = -1L
        val deadline = System.nanoTime() + 10_000_000_000L
        while (bytes.get != last && System.nanoTime() < deadline) {
          last = bytes.get; Thread.sleep(500)
        }
        bytes.get
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    // one untimed JIT warm-up rep per op, then `reps` published repeats
    val mh = (0 to reps).map(_ => timed {
      Dedup.minhashLsh(docs, "doc_id", "text", threshold = 0.5).count()
    }).drop(1)
    val sp = (0 to reps).map(_ => timed {
      Dedup.dupNgramSpans(docs, "doc_id", "text", n = 8).count()
    }).drop(1)
    val mhBytes = shuffleBytes {
      Dedup.minhashLsh(docs, "doc_id", "text", threshold = 0.5).count()
    }
    val spBytes = shuffleBytes {
      Dedup.dupNgramSpans(docs, "doc_id", "text", n = 8).count()
    }
    def arr(xs: Seq[(Double, Long)]) = xs.map(x => f"${x._1}%.3f").mkString("[", ",", "]")
    println(s"""{"probe":"text","tag":"$tag","n":$n,"parts":$parts,""" +
      s""""floor_ms":${f"$floorMs%.2f"},""" +
      s""""minhash_s":${arr(mh)},"minhash_rows":${mh.last._2},""" +
      s""""minhash_shuffle_mb":${f"${mhBytes / 1e6}%.1f"},""" +
      s""""spans_s":${arr(sp)},"spans_rows":${sp.last._2},""" +
      s""""spans_shuffle_mb":${f"${spBytes / 1e6}%.1f"}}""")
    spark.stop()
  }
}
