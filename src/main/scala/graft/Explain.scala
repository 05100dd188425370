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
      // per-query bench seconds from the last Bench run (if present):
      // the audit then pins the BENCH-TAIL budget too — any query over
      // ~2 s at sf0.1 is flagged SLOW right in the table, so a new
      // query blowing the budget fails the builder's local review
      // loudly, the same way both-SF oracle gating already works.
      val benchSecs: Map[String, Double] = {
        val p = java.nio.file.Paths.get("target/bench_full.json")
        if (!java.nio.file.Files.exists(p)) Map.empty
        else {
          val txt = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
          "\"(q[\\w]+)\":(-?[\\d.]+)".r.findAllMatchIn(txt)
            .map(m => m.group(1) -> m.group(2).toDouble).toMap
        }
      }
      if (benchSecs.nonEmpty)
        println(s"bench column: target/bench_full.json (${benchSecs.size} queries); budget 2.0 s/query")
      var slow = 0
      println(f"${"query"}%-26s ${"hashEx"}%6s ${"sorts"}%5s ${"bcast"}%5s ${"pushdown"}%8s ${"wscg"}%4s ${"secs"}%6s  notes")
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
          val secs = benchSecs.get(n)
          val isSlow = secs.exists(t => math.abs(t) > 2.0)
          if (isSlow) slow += 1
          val notes = Seq(
            if (plan.contains("WindowGroupLimit")) Some("wgl") else None,
            if (plan.contains("TakeOrderedAndProject")) Some("topk") else None,
            if (plan.contains("Generate")) Some("gen") else None,
            if (plan.contains("SortMergeJoin")) Some("smj") else None,
            if (isSlow) Some("SLOW") else None).flatten.mkString(",")
          val secsStr = secs.map(t => f"$t%6.2f").getOrElse("     -")
          println(f"$n%-26s $hashEx%6d $sorts%5d $bcast%5s $push%8s $wscg%4d $secsStr  $notes")
        } catch { case e: Throwable => println(f"$n%-26s ERROR ${e.toString.take(80)}") }
      }
      if (benchSecs.nonEmpty)
        println(s"bench-tail: $slow queries over the 2.0 s budget" +
          (if (slow > 0) " — SLOW rows above need a plan or algorithm fix" else ""))
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
