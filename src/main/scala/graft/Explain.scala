package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: prints the formatted physical plan of one or more
  * SparkEntry queries (default: a pushdown/broadcast-sensitive sample),
  * or — with `--audit` — sweeps the WHOLE registry and prints summary
  * plan-invariant counts (cartesian products, nested-loop joins, pushed
  * filters, rank-limit pushdowns) plus the offending query names.
  * Usage: runMain graft.Explain [--audit] [sfDir] [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val audit = args.contains("--audit")
    val rest = args.filterNot(_ == "--audit")
    val sfDir = rest.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (audit) {
      var cartesian = List.empty[String]
      var bnlj = List.empty[String]
      var globalWin = List.empty[String]
      var failed = List.empty[String]
      var pushed = 0
      var wgl = 0
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
        try {
          val qe = fn(spark, sfDir).queryExecution
          val p = qe.executedPlan.toString
          if (p.contains("CartesianProduct")) cartesian ::= n
          if (p.contains("BroadcastNestedLoopJoin")) bnlj ::= n
          // Structural check for THE scale killer this suite eliminated:
          // a full-rank window with no partition key moves every row to
          // one task (sparkPlan = pre-AQE tree, so WindowExec nodes are
          // visible un-wrapped). WindowGroupLimit-able rank-filters are
          // fine — they partial-limit before the exchange.
          val hasGlobalWindow = qe.sparkPlan.collect {
            case w: org.apache.spark.sql.execution.window.WindowExec
                if w.partitionSpec.isEmpty => w
          }.nonEmpty
          if (hasGlobalWindow) globalWin ::= n
          pushed += "PushedFilters: \\[[^\\]]".r.findAllIn(p).length
          wgl += "WindowGroupLimit".r.findAllIn(p).length
        } catch { case e: Throwable => failed ::= s"$n (${e.getMessage})" }
      }
      println(s"[audit] queries=${SparkEntry.queries.size} " +
        s"cartesian=${cartesian.size} bnlj=${bnlj.size} " +
        s"global_windows=${globalWin.size} " +
        s"pushed_filters=$pushed window_group_limit=$wgl " +
        s"plan_failures=${failed.size}")
      if (cartesian.nonEmpty) println(s"[audit] CARTESIAN: ${cartesian.sorted.mkString(", ")}")
      if (bnlj.nonEmpty) println(s"[audit] BNLJ (verify each is an intended one-row scalar cross): ${bnlj.sorted.mkString(", ")}")
      if (globalWin.nonEmpty) println(s"[audit] GLOBAL WINDOWS (single-partition rank — should be none): ${globalWin.sorted.mkString(", ")}")
      if (failed.nonEmpty) println(s"[audit] FAILED: ${failed.sorted.mkString(", ")}")
    } else {
      val names = if (rest.length > 1) rest.drop(1).toSeq
        else Seq("p_scan_filter_project", "j2_multiway_join", "r3_vec_topk",
          "w3_topk_per_group", "a6_multiwindow_agg")
      names.foreach { n =>
        println(s"\n========== $n ==========")
        SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
