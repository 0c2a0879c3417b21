package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every SparkEntry query at the target scale
  * factor and prints ONE JSON line for the driver.
  *
  * Timing methodology: each query's result is written to the `noop` sink,
  * which materializes every row and column through the full plan (a bare
  * `count()` would let Catalyst prune projections and short-circuit scans
  * via parquet metadata — see round-1 VERDICT "What's wrong" #2). Failures
  * are reported per-query in the `ok` map rather than silently folded into
  * the timings (#3).
  *
  * Output plumbing (learned from BENCH_r01..r05 all showing `parsed: null`):
  * the driver keeps only the last ~2000 chars of output and sbt's logger
  * prefixes every stdout line with "[info] ", so a plain println of a long
  * JSON line is unparseable — its head is truncated out of the tail window
  * and the prefix breaks `json.loads` even when short. Two fixes here:
  * (1) the summary line is written straight to the process's file
  * descriptor 1, bypassing sbt's log wrapper (no "[info] " prefix);
  * (2) the line is budgeted to fit the tail window — if the full per-query
  * map is too long, only the slowest queries are kept (the total, failure
  * count and failed names always survive). The complete per-query map is
  * additionally written to target/bench_full.json and printed via the
  * normal logger for humans reading the whole log.
  */
object Bench {
  /** Tail-window budget for the driver-facing JSON line: the driver
    * captures 2000 chars and sbt appends a ~70-char "[success]" line. */
  private val LineBudget = 1800

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Generous pre-coalesce width so AQE sizes each shuffle by BYTES,
      // not by the core count: at 10-100x data, 32 shuffle partitions put
      // millions of rows per task and spill; with a wide initial width
      // AQE coalesces small exchanges back to a handful of tasks and
      // leaves big ones wide. This is the knob that makes the same
      // session config survive a scale-up (BENCH_SF10.md).
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTS", "512"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: initializes codegen, parquet readers and the shuffle
    // machinery so the first timed query isn't charged for JVM spin-up.
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count()
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    // Optional args beyond the sf dir: a query-name subset for targeted
    // perf iteration (the driver passes only the dir → full suite).
    val subset = args.drop(1).toSet
    // Untimed fixture seeding (VERDICT r18 #2): c5/c5b read a per-JVM
    // 1 M-row catalog fixture; on a fresh JVM its build otherwise lands
    // inside run 1's timed region and the rows measure catalog
    // CONSTRUCTION, not the "read-catalog → retrieve" workload they
    // claim. Seed before any timed leg (skipped when a subset excludes
    // both rows, so targeted iteration on other queries stays fast).
    if (subset.isEmpty || subset.exists(_.startsWith("c5"))) {
      try QueriesEval.seedServingFixtures(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] fixture seeding failed: $e")
      }
    }
    val selected =
      if (subset.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(subset).toMap
    // Contention robustness (BENCH_r04/r06 ran ~2× hot vs a quiet-box
    // re-run of the same build): each query is timed `runs` times and the
    // MIN is reported — cache-warm steady state is the number being
    // graded, and the min is the standard estimator least sensitive to
    // other processes stealing the box. The second pass is much cheaper
    // than the first (codegen, parquet footers and page cache are warm).
    val runs = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt)
    // Leg-context observability (VERDICT r13 "What's wrong" #1 / "Next
    // round" #2): with SPARK_GRAFT_BENCH_DIAG=1, dump the JVM/executor
    // state BETWEEN queries — persisted-RDD block storage (localCheckpoint
    // blocks from MLlib fits and iterative ops are NOT touched by
    // clearCache), block-manager on-disk file counts (ContextCleaner lag),
    // heap, and load average — so a leg-vs-iso inflation can be bisected
    // to a named cause instead of re-guessed every round.
    val diag = sys.env.get("SPARK_GRAFT_BENCH_DIAG").contains("1")
    def diagLine(tag: String): Unit = if (diag) {
      try {
        val rdds = spark.sparkContext.getRDDStorageInfo
        val mem = rdds.map(_.memSize).sum / (1 << 20)
        val dsk = rdds.map(_.diskSize).sum / (1 << 20)
        var files = 0L
        var bytes = 0L
        def walk(f: java.io.File): Unit = {
          val ls = f.listFiles()
          if (ls != null) ls.foreach { c =>
            if (c.isDirectory) walk(c)
            else { files += 1; bytes += c.length() }
          }
        }
        Option(new java.io.File(
            java.lang.System.getProperty("java.io.tmpdir")).listFiles())
          .getOrElse(Array.empty)
          .filter(f => f.getName.startsWith("blockmgr-") && f.isDirectory)
          .foreach(walk)
        val rt = Runtime.getRuntime
        val heap = (rt.totalMemory() - rt.freeMemory()) / (1 << 20)
        val load = java.lang.management.ManagementFactory
          .getOperatingSystemMXBean.getSystemLoadAverage
        java.lang.System.err.println(
          f"[bench-diag] $tag: rdds=${rdds.length} rddMem=${mem}MB " +
            f"rddDisk=${dsk}MB bmFiles=$files bmMB=${bytes / (1 << 20)} " +
            f"heapMB=$heap load=$load%.1f")
      } catch { case e: Throwable =>
        java.lang.System.err.println(s"[bench-diag] $tag failed: $e")
      }
    }
    // --- PER-LEG load gate (VERDICT r17 "What's wrong" #1: BENCH_r17
    // shipped at load_avg 17.1 with c5b/c8/c7 inflated ~2× and UNTAGGED —
    // the r16 gate only guarded iso re-measures, which ran inside the
    // same contention window). Every leg now samples external CPU (system
    // minus own, while this JVM idles between queries) BEFORE its timed
    // runs, waits briefly for the box to settle (bounded per query AND by
    // a whole-run budget, so a persistently hot box can't stall the
    // sweep), and records the final sample per row. Rows whose leg
    // STARTED contended are re-queued through the iso machinery below
    // (which re-waits for quiet and overrides on >30% divergence) and
    // tagged `load_suspect` if even the re-queue ran hot — so a
    // contaminated number can no longer ship looking clean. ---
    val legLoadMax = sys.env.getOrElse(
      "SPARK_GRAFT_ISO_LOAD_MAX", "0.20").toDouble
    val legLoadSample = !sys.env.get("SPARK_GRAFT_LEG_LOAD").contains("0")
    def externalCpu(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case b: com.sun.management.OperatingSystemMXBean =>
          b.getCpuLoad; b.getProcessCpuLoad // prime the tick counters
          Thread.sleep(1000)
          val sysL = b.getCpuLoad
          val ownL = b.getProcessCpuLoad
          if (sysL.isNaN || ownL.isNaN) -1.0
          else math.max(0.0, sysL - ownL)
        case _ => -1.0
      }
    // whole-run settle budget: waits beyond this ship the sample as-is
    var legWaitBudgetMs = sys.env.getOrElse(
      "SPARK_GRAFT_LEG_WAIT_BUDGET_MS", "120000").toLong
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      // Inter-query hygiene (untimed): a long single-JVM sweep otherwise
      // AGES — cached plans/broadcasts pile up and the ContextCleaner's
      // shuffle-file cleanup lags behind, so a query running after a
      // multi-hundred-second neighbor measures several times slower than
      // isolated (BENCH_SF10.md round-10 methodology note: a12_funnel
      // 41.3 s in-leg vs 5.8 s isolated on the same build). Clearing the
      // cache and forcing a reference-processing GC between queries
      // reclaims that state so each timing starts from a comparable JVM.
      //
      // r19: ALSO unpersist every persistent RDD. clearCache only drops
      // the SQL cache; localCheckpoint blocks from the previous query's
      // barriers/loops stay in the block manager until their RDD is GC'd
      // AND the async ContextCleaner catches up — the bench-diag counters
      // this hygiene block feeds were built precisely because rddMem/
      // rddDisk grow across a sweep. The blocks belong to COMPLETED
      // queries (each timed fn builds its frames from scratch), so a
      // blocking unpersist is safe and removes the same-JVM late-sweep
      // aging that the external-load gate is structurally blind to
      // (VERDICT r18 #1 mechanism; this run's own evidence: c5b 25.8 s
      // in-sweep with leg_load 0.002 vs 5.8-13 s fresh-JVM).
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      System.gc()
      diagLine(s"before $name")
      var legExt = -1.0
      if (legLoadSample) {
        legExt = externalCpu()
        while (legExt > legLoadMax && legWaitBudgetMs > 0) {
          System.err.println(f"[bench] leg $name: external cpu " +
            f"$legExt%.2f > $legLoadMax%.2f — waiting 10s " +
            f"(budget ${legWaitBudgetMs / 1000}s)")
          Thread.sleep(10000)
          legWaitBudgetMs -= 11000 // the sample itself costs ~1s
          legExt = externalCpu()
        }
      }
      var best = Double.MaxValue
      var succeeded = false
      var failed = false
      var i = 0
      while (i < runs && !failed) {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
          succeeded = true
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            // A failed rerun must not clobber an earlier successful
            // timing — only record the failed elapsed time when no run
            // succeeded at all (so the total still reflects time spent).
            if (!succeeded) best = (System.nanoTime() - t0) / 1e9
            failed = true
        }
        i += 1
      }
      (name, best, succeeded, legExt)
    }
    // --- Isolated re-measure of cross-round movers (VERDICT r12 "Next
    // round" #1): the full-leg per-query numbers have now produced four
    // phantom regressions across two rounds (g1_pagerank 8.24 leg vs 5.80
    // isolated, r9b 6.51/3.70, r11b 5.32/2.62, c5 26.53/14.02) — leg
    // context (JVM aging, neighbor spill, box contention) inflates
    // individual rows by up to ~2x on untouched code. Every query whose
    // leg time moved >30% vs the PRIOR ROUND's bench JSON is re-measured
    // here after the leg, min-of-3 warm with the same clearCache+GC
    // hygiene, and both numbers ship in the round artifact — a future
    // cross-round diff reads `iso` and needs no manual A/B. Sub-second
    // rows are exempt (all box noise at that magnitude). ---
    val isoThreshold = sys.env.getOrElse(
      "SPARK_GRAFT_ISO_THRESHOLD", "0.30").toDouble
    val isoRuns = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_ISO_RUNS", "3").toInt)
    val priorQueries: Map[String, Double] =
      sys.env.get("SPARK_GRAFT_PRIOR_BENCH")
        .map(p => new java.io.File(p))
        .orElse {
          val rx = "BENCH_r(\\d+)\\.json".r
          Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
            .flatMap(f => f.getName match {
              case rx(n) => Some((n.toInt, f)); case _ => None
            }).sortBy(-_._1).headOption.map(_._2)
        }
        .flatMap { f =>
          try {
            val root = new com.fasterxml.jackson.databind.ObjectMapper()
              .readTree(f)
            // driver files nest the parsed line under "parsed"; accept a
            // bare bench line (e.g. target/bench_full.json) too
            val parsed = Option(root.get("parsed")).filter(!_.isNull)
            val q = Seq(parsed.map(_.get("queries")).orNull,
                root.get("queries"))
              .find(n => n != null && !n.isNull)
            // cross-SF comparisons are meaningless (a dev subset run at
            // sf0.001 must not iso-flag against the sf0.1 round prior)
            val priorSf = Seq(parsed.map(_.get("sf")).orNull, root.get("sf"))
              .find(n => n != null && !n.isNull).map(_.asText())
            if (priorSf.exists(_ != sfDir)) None
            else q.map { node =>
              val it = node.properties().iterator()
              val b = Map.newBuilder[String, Double]
              while (it.hasNext) {
                val e = it.next(); b += (e.getKey -> e.getValue.asDouble())
              }
              b.result()
            }
          } catch { case _: Throwable => None }
        }
        .getOrElse(Map.empty)
    // Flagged for iso re-measure: cross-round movers (the r12 phantom-
    // regression machinery) PLUS any row whose leg STARTED under external
    // load (r17 #1 — the re-queue path for contended legs; sub-second
    // rows exempt, all box noise at that magnitude).
    val flagged = results.collect {
      case (name, t, true, _) if priorQueries.get(name).exists { p =>
        math.max(t, p) >= 0.5 && p > 0 &&
          math.abs(t / p - 1.0) > isoThreshold
      } => name
      case (name, t, true, ext) if ext > legLoadMax && t >= 0.5 => name
    }.distinct
    // --- iso LOAD GATE (VERDICT r15 next #4): the iso re-run fires right
    // after the leg — inside the same external-contention window — so leg
    // and iso can AGREE on an inflated number and the >30% override never
    // fires (r15: c5b leg 14.03, iso 12.18, settled solo truth 10.2 s;
    // 29.3 s minutes earlier under the box's phantom load). The 1-min
    // loadavg is useless here: it still carries our OWN leg burn. Instead,
    // sample instantaneous SYSTEM cpu while this JVM idles — during our
    // own idle, system cpu IS the external load — and wait (bounded) for
    // it to settle before each iso re-measure. Rows still measured under
    // residual load ship tagged `load_suspect` with the sampled value, so
    // a cross-round diff discounts them instead of minting a phantom
    // regression. ---
    val isoLoadMax = legLoadMax
    val isoLoadRetries = sys.env.getOrElse(
      "SPARK_GRAFT_ISO_LOAD_RETRIES", "3").toInt
    val iso: Seq[(String, Double, Double)] = flagged.map { name =>
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      System.gc()
      var ext = externalCpu()
      var waits = 0
      while (ext > isoLoadMax && waits < isoLoadRetries) {
        System.err.println(f"[bench] iso $name: external cpu $ext%.2f > " +
          f"$isoLoadMax%.2f — waiting 10s for the box to settle")
        Thread.sleep(10000)
        ext = externalCpu()
        waits += 1
      }
      var best = Double.MaxValue
      var i = 0
      while (i < isoRuns) {
        val t0 = System.nanoTime()
        try {
          selected(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        } catch { case _: Throwable => () }
        i += 1
      }
      System.err.println(f"[bench] iso $name: leg " +
        f"${results.find(_._1 == name).map(_._2).getOrElse(-1.0)}%.2f " +
        f"prior ${priorQueries(name)}%.2f iso $best%.2f extload $ext%.2f")
      (name, best, ext)
    }.filter(_._2 < Double.MaxValue)

    // --- iso overrides are DIRECTION-AWARE (VERDICT r18 "What's wrong"
    // #1; supersedes the r13 unconditional rule). The r13 machinery was
    // built for legs INFLATED by context (c2 120.1 s leg vs 8.61 iso);
    // unconditional adoption then shipped the OPPOSITE artifact in r18:
    // iso re-measures run at the END of the 181-query sweep in the same
    // JVM, and the external-load sampler (system minus own process) is
    // structurally blind to the bench JVM's own late-run state — so a
    // clean, fast leg was replaced by a slower same-JVM re-measure on 3
    // rows (c5 25.23 over a clean 6.66 leg; interleaved fresh-JVM A/B vs
    // the prior build showed parity). Rule now: min-of-valid-measurements
    // — a leg that started load-clean is NEVER overridden upward; iso
    // replaces the leg only when it is FASTER (steady-state beats aged
    // context in that direction regardless of leg load) or when the leg
    // itself started contended (the r13/r17 failure mode). A clean leg
    // with a >threshold SLOWER iso ships the leg and is tagged
    // `iso_slower` for adjudication instead of silently adopting. ---
    val isoMap = iso.map(t => (t._1, t._2)).toMap
    // Rows whose iso re-measure STILL ran under external load (gate
    // exhausted its waits): their iso number is itself suspect. A leg
    // that started contended and was NOT cleared by an iso re-run (iso
    // errored / stayed at MaxValue) is suspect too — no contaminated
    // number ships untagged (r17 #1). Both sets gate on ok=true: a
    // failed row ships no number at all (it is already listed in
    // failed_queries), so it can neither count as contended nor trip
    // the REQUIRE_QUIET refusal (ADVICE r18).
    val isoRan = iso.map(_._1).toSet
    val okNames = results.collect { case (n, _, true, _) => n }.toSet
    val loadSuspect = (iso.collect {
      case (name, _, ext) if ext > isoLoadMax && okNames(name) =>
        (name, ext)
    } ++ results.collect {
      case (name, t, true, ext)
          if ext > legLoadMax && t >= 0.5 && !isoRan(name) => (name, ext)
    }).distinctBy(_._1)
    val legExtMap = results.map(r => (r._1, r._4)).toMap
    // A leg is "clean" when its pre-leg external-cpu sample was taken and
    // came back under the gate; an unsampled leg (-1.0) is NOT clean — it
    // keeps the old always-override behavior rather than minting trust.
    def legClean(name: String): Boolean = {
      val e = legExtMap.getOrElse(name, -1.0)
      e >= 0.0 && e <= legLoadMax
    }
    def overridden(name: String, legT: Double): Option[Double] =
      isoMap.get(name)
        .filter(v => math.abs(legT / v - 1.0) > isoThreshold)
        .filter(v => v < legT || !legClean(name))
    // Clean legs whose iso re-measure came back >threshold SLOWER: the
    // leg ships, but the disagreement is recorded for adjudication.
    val isoSlower = results.collect {
      case (name, t, true, _)
          if legClean(name) && isoMap.get(name).exists(v =>
            v > t && math.abs(t / v - 1.0) > isoThreshold) => name
    }.sorted
    val adjusted = results.map { case (name, t, ok, _) =>
      (name, overridden(name, t).getOrElse(t), ok)
    }
    val legKept = results.collect {
      case (name, t, _, _) if overridden(name, t).isDefined => (name, t)
    }
    // System load alongside the timings so a grader can normalize a
    // contended run (1-min load average / available processors).
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val loadAvg = osBean.getSystemLoadAverage
    val nCpu = osBean.getAvailableProcessors
    val total = adjusted.map(_._2).sum
    val legTotal = results.map(_._2).sum
    val nFailed = results.count(!_._3)
    // Self-describing estimator so cross-round totals compare like-for-like
    // (r1-r6 were single cold runs; r7+ are min-of-N warm).
    val estimator = if (runs == 1) "single-cold" else s"min-of-$runs-warm"
    // Self-describing inter-query hygiene tag (VERDICT r10 "What's wrong"
    // #5): the r10 clearCache+GC step makes every query pay a cold start
    // (~40% higher sf0.1 common-query subtotal than r8's no-hygiene sweep
    // on the same box), so totals across the hygiene change are NOT
    // like-for-like. Graders should compare only runs with equal
    // estimator+hygiene tags; isolated per-query re-measures are available
    // via `tools/runjava.sh graft.Bench <sfDir> <query>`.
    // r19: "+unpersist" — localCheckpoint blocks of completed queries are
    // now freed eagerly between legs (see the hygiene block above). The
    // tag changes so graders know r19+ totals are not like-for-like with
    // the r10-r18 "clearcache+gc" sweeps (per-query work is identical;
    // only leftover prior-query state differs).
    val hygiene = "unpersist+clearcache+gc"
    val failedNames = results.collect { case (k, _, false, _) => s""""$k"""" }

    // Locale-pinned: the f-interpolator uses the JVM default locale, and a
    // comma-decimal locale would render invalid JSON for the driver.
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    // Iso map always ships in full (it exists precisely so the round
    // artifact is self-sufficient); the budget trims `queries` instead.
    val isoJson =
      if (iso.isEmpty) ""
      else iso.sortBy(_._1).map { case (k, v, _) => s""""$k":${fmt(v)}""" }
        .mkString(""","iso":{""", ",", "}")
    // load_suspect rows (+ the sampled external cpu) always ship in full:
    // they exist precisely so a cross-round diff can discount them.
    val suspectJson =
      if (loadSuspect.isEmpty) ""
      else loadSuspect.sortBy(_._1)
        .map { case (k, v) => s""""$k":${fmt(v)}""" }
        .mkString(""","load_suspect":{""", ",", "}")
    // Raw leg numbers of iso-overridden rows (+ the raw leg total when any
    // row was overridden) — always shipped in full, like iso.
    val legJson =
      if (legKept.isEmpty) ""
      else legKept.sortBy(_._1).map { case (k, v) => s""""$k":${fmt(v)}""" }
        .mkString(""","leg":{""", ",",
          s"""},"leg_total":${fmt(legTotal)}""")
    // Per-row estimator honesty (ADVICE r14): the top-level `estimator`
    // tag describes the LEG numbers; rows listed here instead carry their
    // iso re-measure (min of isoRuns same-JVM isolated runs), so a
    // cross-round differ knows exactly which rows are not like-for-like
    // with the leg estimator.
    val ovNames = legKept.map(_._1).sorted
    val ovJson =
      if (ovNames.isEmpty) ""
      else ovNames.map(n => s""""$n"""")
        .mkString(""","iso_overridden":[""", ",",
          s"""],"iso_estimator":"min-of-$isoRuns-iso"""")
    // Clean-leg-kept-over-slower-iso rows (VERDICT r18 #1): shipped so a
    // grader can see exactly where the direction-aware rule refused an
    // upward override; the iso values themselves are in `iso`.
    val isoSlowerJson =
      if (isoSlower.isEmpty) ""
      else isoSlower.map(n => s""""$n"""")
        .mkString(""","iso_slower":[""", ",", "]")
    // Per-leg load summary for the driver line (the full per-row map
    // ships in bench_full.json): every row carried a pre-leg external-cpu
    // sample, so a grader can see at a glance whether ANY leg started
    // contended — the r17 artifact had no such field and shipped 2×
    // numbers looking clean.
    val sampledLoads = results.map(_._4).filter(_ >= 0.0)
    val contendedLegs =
      results.count(r => r._4 > legLoadMax && r._2 >= 0.5 && r._3)
    val legLoadSummary =
      if (sampledLoads.isEmpty) ""
      else s""","ext_leg_max":${fmt(sampledLoads.max)}""" +
        s""","contended_legs":$contendedLegs"""
    def line(entries: Seq[(String, Double)], omitted: Int): String = {
      val qs = entries.map { case (k, v) => s""""$k":${fmt(v)}""" }
        .mkString("{", ",", "}")
      val omit = if (omitted > 0) s""","omitted_fast":$omitted""" else ""
      val fails =
        if (nFailed > 0) s""","failed_queries":[${failedNames.mkString(",")}]"""
        else ""
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs""" +
        s""","n_queries":${results.size},"failed":$nFailed$fails$omit$isoJson$suspectJson$legJson$ovJson$isoSlowerJson$legLoadSummary""" +
        s""","runs":$runs,"estimator":"$estimator","hygiene":"$hygiene","load_avg":${fmt(loadAvg)},"n_cpu":$nCpu,"sf":"$sfDir"}"""
    }

    // Full detail: log line (may be sbt-prefixed/truncated — that's fine)
    // and a file for offline reading.
    val fullQs = adjusted.map { case (k, v, _) => s""""$k":$v""" }
      .mkString("{", ",", "}")
    val oks = results.map { case (k, _, ok, _) => s""""$k":$ok""" }
      .mkString("{", ",", "}")
    val fullIso = iso.sortBy(_._1)
      .map { case (k, v, _) => s""""$k":$v""" }.mkString("{", ",", "}")
    val fullIsoLoad = iso.sortBy(_._1)
      .map { case (k, _, e) => s""""$k":$e""" }.mkString("{", ",", "}")
    val fullLeg = legKept.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    // the complete per-row pre-leg external-cpu samples (r17 #1)
    val fullLegLoad = results.sortBy(_._1)
      .map { case (k, _, _, e) => s""""$k":$e""" }.mkString("{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$fullQs,"ok":$oks,"iso":$fullIso,"iso_load":$fullIsoLoad,"leg":$fullLeg,"leg_total":$legTotal,"leg_load":$fullLegLoad$ovJson$isoSlowerJson$suspectJson$legLoadSummary,"failed":$nFailed,"runs":$runs,"estimator":"$estimator","hygiene":"$hygiene","load_avg":$loadAvg,"n_cpu":$nCpu,"sf":"$sfDir"}"""
    println(fullLine)
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("target/bench_full.json"),
        fullLine.getBytes("UTF-8"))
    } catch { case _: Throwable => () }

    // Driver-facing line: all queries if they fit the tail budget, else
    // drop the fastest until they do (slowest-first content, keys sorted
    // by name within the kept set for stable diffs).
    val byTime = adjusted.sortBy(-_._2).map { case (k, v, _) => (k, v) }
    var keep = byTime.length
    while (keep > 0 && line(byTime.take(keep).sortBy(_._1), byTime.length - keep).length > LineBudget)
      keep -= 1
    val compact = line(byTime.take(keep).sortBy(_._1), byTime.length - keep)

    spark.stop()
    // --- EMIT REFUSAL (r17 #1, opt-in): with SPARK_GRAFT_REQUIRE_QUIET=1
    // a run that still carries load-suspect rows after the per-leg gate
    // AND the iso re-queue exits non-zero WITHOUT printing the driver
    // line — the artifact is not written rather than written dirty. Off
    // by default: an unattended driver round must still produce an
    // artifact, and the per-row tags already let a grader discount
    // contaminated rows instead of trusting them. ---
    if (sys.env.get("SPARK_GRAFT_REQUIRE_QUIET").contains("1") &&
        loadSuspect.nonEmpty) {
      System.err.println(s"[bench] REFUSING to emit: " +
        s"${loadSuspect.size} load-suspect rows after leg gate + iso " +
        s"re-queue (${loadSuspect.map(_._1).sorted.mkString(", ")}); " +
        "full detail in target/bench_full.json")
      sys.exit(3)
    }
    // Raw fd-1 write: bypasses sbt's System.out wrapper so the driver sees
    // an unprefixed, parseable JSON line at the very end of the output.
    val raw = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true, "UTF-8")
    raw.println(compact)
    raw.flush()
  }
}
