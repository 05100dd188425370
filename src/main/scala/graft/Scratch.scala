package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway dev profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    // Suite-floor decomposition: for each query, split the timed window
    // into (a) DataFrame CONSTRUCTION (includes driver-phase jobs for
    // iterative queries), (b) analysis+optimization+physical PLANNING
    // (force executedPlan), (c) EXECUTION (count). Warm each at
    // sf0.001 first, then min-of-3 at sf0.1, mirroring Bench.
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q_wilson", "q_window_funcs", "q_rfm", "q_rfm_migration",
        "q_quantile_normalize", "q_kruskal_wallis", "q_spearman",
        "q_decile_matrix", "q_woe_iv", "q_year_overlap", "q_ship_sla",
        "q_abc_xyz", "q_borda", "q_lof", "q_set_cover", "q_hits",
        "q_topk_stability", "q_qcd", "q_winsorize", "q_window_lag")
    // count Spark jobs + their scheduled time during each phase, to
    // split construction into driver-phase JOBS vs pure Catalyst work
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    println(f"[scratch] ${"query"}%-24s construct(jobs)  plan   exec(jobs)   total")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      try { fn(spark, "/root/testdata/sf0.001").count() } catch { case _: Throwable => () }
      val reps = (1 to 3).map { _ =>
        val j0 = jobs.get
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        val t1 = System.nanoTime()
        val j1 = jobs.get
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        val j2 = jobs.get
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9, (t3 - t0) / 1e9,
          j1 - j0, j2 - j1)
      }
      val best = reps.minBy(_._4)
      println(f"[scratch] $n%-24s ${best._1}%7.3f(${best._5}%3d) ${best._2}%7.3f ${best._3}%7.3f(${best._6}%3d) ${best._4}%7.3f")
    }
    spark.stop()
  }
}
