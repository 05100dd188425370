package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for selected queries so plan
  * quality (pushdown, pruning, broadcast, codegen spans) is reviewable.
  * Usage: runMain graft.Explain [queryName ...]  (default: a survey set) */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.headOption.contains("--audit")) {
      // one-line plan-quality audit per query: the scale signals a
      // reviewer greps for, tabulated across the whole contract.
      // AQE off for the audit: adaptive plans only materialize codegen
      // stages (the *(n) markers) at execution, so the static audit
      // would read zero spans everywhere
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      println(f"${"query"}%-26s ${"hashEx"}%6s ${"sorts"}%5s ${"bcast"}%5s ${"pushdown"}%8s ${"wscg"}%4s  notes")
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
          val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
          // "Sort [" matches Sort nodes anywhere, INCLUDING the root
          // operator (every query's final ORDER BY) — SortMergeJoin /
          // SortAggregate print differently and don't false-match
          val sorts = "Sort \\[".r.findAllIn(plan).length
          val bcast = if (plan.contains("BroadcastHashJoin") ||
            plan.contains("BroadcastNestedLoop")) "yes" else "-"
          val push = if (plan.contains("PushedFilters: [")
            && !plan.contains("PushedFilters: []")) "yes" else "-"
          // executed plans print codegen stages as "*(n)" markers
          val wscg = "\\*\\(\\d+\\)".r.findAllIn(plan).toSet.size
          val notes = Seq(
            if (plan.contains("WindowGroupLimit")) Some("wgl") else None,
            if (plan.contains("TakeOrderedAndProject")) Some("topk") else None,
            if (plan.contains("Generate")) Some("gen") else None,
            if (plan.contains("SortMergeJoin")) Some("smj") else None).flatten.mkString(",")
          println(f"$n%-26s $hashEx%6d $sorts%5d $bcast%5s $push%8s $wscg%4d  $notes")
        } catch { case e: Throwable => println(f"$n%-26s ERROR ${e.toString.take(80)}") }
      }
    } else {
      val names = if (args.nonEmpty) args.toSeq
        else Seq("q1_pricing_summary", "q_join_revenue_nation", "q_semi_join",
          "q_topk", "q_cosine_topk", "q_jaccard_pairs", "q_running_avg")
      names.foreach { n =>
        println(s"\n================ $n ================")
        SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
