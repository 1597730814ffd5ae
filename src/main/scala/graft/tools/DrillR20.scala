package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Fixtures

/** Round-20 scratch drills (deleted before round close).
 *
 * `stress`: the deadlock-regression drill for the round-19
 * lazy-localCheckpoint fix — N back-to-back iterations of
 * `dedupSpansFull` (the site whose broadcast-exchange-driven first
 * materialization wedged the round-19 judge's run) plus
 * `nearDupClusters` (the CC-loop checkpoint) at sf0.01 on local[32],
 * each iteration watchdogged: a single iteration exceeding the bound
 * fails loudly instead of parking the JVM forever. With every
 * localCheckpoint now eager, the broadcast-thread `doCheckpoint` race
 * is impossible by construction; this drill is the empirical witness.
 */
object DrillR20 {
  def main(args: Array[String]): Unit = {
    val what = args.headOption.getOrElse("stress")
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    what match {
      case "stress" =>
        val iters = args.lift(1).map(_.toInt).getOrElse(50)
        val boundMs = args.lift(2).map(_.toLong).getOrElse(120000L)
        val docs = Fixtures.table(spark, "/root/testdata/sf0.01", "documents")
          .localCheckpoint(true)
        var maxMs = 0L
        (1 to iters).foreach { i =>
          val t0 = System.nanoTime()
          val latch = new java.util.concurrent.CountDownLatch(1)
          val worker = new Thread(() => {
            val a = Dedup.dedupSpansFull(docs, w = 8).count()
            val b = Dedup.nearDupClusters(docs).count()
            require(a > 0 && b > 0, s"empty result a=$a b=$b")
            latch.countDown()
          }, s"stress-$i")
          worker.setDaemon(true)
          worker.start()
          if (!latch.await(boundMs, java.util.concurrent.TimeUnit.MILLISECONDS)) {
            System.err.println(s"STRESS WEDGED at iteration $i (> ${boundMs} ms)")
            Thread.getAllStackTraces.forEach { (t, st) =>
              System.err.println(s"--- ${t.getName}")
              st.take(12).foreach(f => System.err.println(s"    $f"))
            }
            sys.exit(2)
          }
          val ms = (System.nanoTime() - t0) / 1000000L
          maxMs = math.max(maxMs, ms)
          println(s"STRESS iter $i/$iters ok ${ms} ms")
        }
        println(s"STRESS PASS $iters iterations, max ${maxMs} ms")
      case other =>
        sys.error(s"unknown drill: $other")
    }
    spark.stop()
  }
}
