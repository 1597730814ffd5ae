package graft.tools

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

import graft.{GraftSession, SparkEntry}

/**
 * Operator-level profile of a bench query: runs it through the noop sink
 * (after a warmup pass) and prints every physical operator with its
 * populated SQL metrics (rows, codegen/exchange/aggregate times, shuffle
 * bytes) from the FINAL adaptive plan — the guide-§1 "where is the time
 * going" loop without the Spark UI.
 *
 * Usage: runMain graft.tools.Profile <sfDir> <q1,q2,...> [passes]
 */
object Profile {
  private def walk(p: SparkPlan, depth: Int,
                   out: StringBuilder): Unit = {
    val resolved = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case s: QueryStageExec => s.plan
      case r: ReusedExchangeExec =>
        out.append("  " * depth).append("ReusedExchange -> ")
          .append(r.child.nodeName).append('\n')
        return
      case other => other
    }
    if (!(resolved eq p)) { walk(resolved, depth, out); return }
    val m = p.metrics.toSeq
      .filter(_._2.value > 0)
      .sortBy(_._1)
      .map { case (k, v) => s"$k=${v.value}" }
      .mkString(", ")
    out.append("  " * depth).append(p.nodeName)
    if (m.nonEmpty) out.append("  [").append(m).append(']')
    out.append('\n')
    p.children.foreach(walk(_, depth + 1, out))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val passes = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    // ad-hoc A/B conf, e.g. SPARK_GRAFT_PROFILE_CONF="spark.sql.adaptive.coalescePartitions.enabled=false"
    sys.env.get("SPARK_GRAFT_PROFILE_CONF").foreach { s =>
      s.split(";").map(_.trim).filter(_.nonEmpty).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      }
    }
    for (name <- names) {
      // warmup (codegen + parquet footers), then timed passes
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      // profile pass: metrics of the final adaptive plan of one run —
      // captured via a QueryExecutionListener because the noop WRITE
      // owns the executed QueryExecution, not the source DataFrame
      @volatile var captured: Option[org.apache.spark.sql.execution.QueryExecution] = None
      val listener = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               durationNs: Long): Unit = captured = Some(qe)
        override def onFailure(funcName: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               exception: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      Thread.sleep(500) // let the listener bus drain
      spark.listenerManager.unregister(listener)
      val out = new StringBuilder
      out.append(f"== $name  times=${times.map(t => f"$t%.2f").mkString(",")}s\n")
      captured.foreach(qe => walk(qe.executedPlan, 0, out))
      println(out.result())
    }
    spark.stop()
  }
}
