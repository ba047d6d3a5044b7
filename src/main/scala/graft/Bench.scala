package graft

object Bench {
  private def fmt(v: Double): String = BigDecimal(v)
    .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString

  /** Re-time candidates: first-pass outliers. A transient host stall
    * (round-11 gate: a 0.47 s query charged 24.2 s) lands entirely in
    * one query's single-shot number; warming cannot fix contention —
    * only min-of-k can. Outliers get a second timed run (budgeted),
    * and the reported number is the per-query MIN of the passes.
    *
    * The floor is ADAPTIVE (r12 advice: the flat 1.5 s floor retimed
    * 24 legitimately-expensive queries, ~34 s of second-pass wall):
    * with history from the previous round's committed builder line, a
    * query is an outlier only when its first pass exceeds 1.3× its own
    * historical number (and an absolute noise floor); queries without
    * history fall back to the flat floor.
    */
  private val retimeFloorSec = 1.5
  /** Below this, a 1.3×-over-history first pass is sub-second noise,
    * not a stall worth a retry.
    */
  private val retimeMinFloorSec = 0.75
  /** Wall budget SHARED by the second and third passes, so re-timing
    * can never double the suite cost: outliers are retried in
    * first-pass-start order ([[retryOrder]] — earliest first, for
    * maximal separation from the stall window that flagged them) until
    * spent. EVERY retry's wall time counts against the budget,
    * including failing ones (r12 advice: only successful retries were
    * charged, so slow failures could blow past the cap).
    */
  private val retimeBudgetSec = 45.0

  /** Per-query floor history: the per-query MIN over the last TWO
    * committed `BENCH_r*_builder.json` lines (the builder records its
    * own gate-shaped run each round). The min-of-two matters: a single
    * loaded-host builder line (r13's was ~35% hot) would otherwise
    * inflate every floor by the same factor and under-retime exactly
    * the regressions the mechanism exists to catch; one clean line in
    * the window keeps the floors honest. Absent files / unparsable
    * content degrade to no history — flat floor.
    */
  private def history(): Map[String, Double] =
    try {
      val files = Option(new java.io.File("bench_history").listFiles)
        .getOrElse(Array.empty) ++
        Option(new java.io.File(".").listFiles).getOrElse(Array.empty)
      // dedupe by ROUND before taking two: a round archived into
      // bench_history/ while its cwd copy remains would fill both
      // slots with the same line, and min() over two copies of one
      // loaded-host run is exactly the single-line inflation the
      // min-of-two exists to prevent
      val newestTwo = files
        .filter(_.getName.matches("BENCH_r\\d+_builder\\.json"))
        .groupBy(f => "\\d+".r.findFirstIn(f.getName).fold(0)(_.toInt))
        .toSeq.sortBy(-_._1)
        .take(2)
        // within a round, the newest copy wins: a round re-run after
        // being archived leaves a stale line in bench_history/ beside
        // the fresher cwd one
        .map(_._2.maxBy(_.lastModified))
      mergeHistories(newestTwo.toSeq.map { f =>
        val text = new String(
          java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        val qIdx = text.indexOf("\"queries\":{")
        val end = if (qIdx < 0) -1 else text.indexOf('}', qIdx)
        if (end < 0) Map.empty[String, Double]
        else "\"([^\"]+)\":(-?[0-9.]+)".r
          .findAllMatchIn(text.substring(qIdx + 11, end))
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      })
    } catch { case _: Throwable => Map.empty }

  /** Per-query minimum across builder lines; negative entries (recorded
    * failures) are dropped — a failed run is no evidence of speed.
    */
  private[graft] def mergeHistories(hs: Seq[Map[String, Double]]): Map[String, Double] =
    hs.flatMap(_.toSeq).filter(_._2 > 0)
      .groupMapReduce(_._1)(_._2)(math.min)

  /** Host-drift scalar: the MEDIAN first-pass/history ratio over the
    * common queries. This VM drifts ±30% on identical code (r15: the
    * driver line ran a uniform median 1.31× over history while the
    * same-commit idle line sat at 1.03×), so an absolute `1.3×h`
    * floor fires on EVERY query of a hot run — 44/180 retimed in the
    * r15 gate, the shared budget spent on jitter instead of real
    * regressions. The median over ~180 queries is exactly the uniform
    * inflation (a real regression moves one query, not the median);
    * dividing it out makes the floor a RELATIVE test: flag a query
    * only when it regressed against the rest of the same run. Clamped
    * to ≥ 1 (a faster-than-history host must not tighten floors below
    * the absolute protocol) and to 1 when fewer than 8 common queries
    * exist (a median of noise is noise).
    */
  private[graft] def driftScalar(firstPass: Seq[(String, Double, Long)],
                                 hist: Map[String, Double]): Double = {
    val ratios = firstPass.collect {
      case (n, s, _) if s > 0 && hist.get(n).exists(_ > 0) => s / hist(n)
    }.sorted
    if (ratios.size < 8) 1.0
    // CAPPED at 1.5 (r16 advice): an uncapped scalar would also absorb
    // a genuinely UNIFORM code regression — a change that slows every
    // query 2× is indistinguishable from a hot host by the median
    // alone, and uncapped floors would scale up with it and never
    // retime. 1.5 covers this VM's observed ±30-48% thermal band;
    // beyond it floors stop stretching, retimes fire, and the
    // still-slow numbers surface in the line. The probe_ratio field
    // ([[hostProbe]]) is the independent signal that narrows the
    // cause: drift high + probe elevated = hot host CPU; drift high +
    // probe at par = NOT a CPU event — a uniform code regression
    // (persists across re-runs) or IO/page-cache variance (the
    // per-query retimes recover; see SCALING.md's measured finding).
    else math.min(1.5, math.max(1.0, ratios(ratios.size / 2)))
  }

  /** Engine-independent host-speed probe: a fixed integer loop run on
    * 8 THREADS at once (no Spark, no IO — pure CPU), min of 3 runs of
    * the joint wall time. Parallel, not single-threaded, because the
    * first single-threaded cut measured per-core IPC at par (ratio
    * 1.04) during a run whose drift scalar read 1.42 on IDENTICAL
    * code — this VM's drift lives in multi-core throughput
    * (hypervisor steal / memory bandwidth under parallel load), which
    * only a parallel workload feels. The thread count is a FIXED
    * constant (8) — deliberately NOT derived from SPARK_GRAFT_CPUS, so
    * probe times stay comparable across rounds even if the gate's CPU
    * setting ever changes; [[probeHistory]] filters on `probe_v`, and
    * a probe-shape change (thread count included) must bump
    * [[ProbeVersion]].
    * Its time moves with host contention and NEVER with engine code,
    * so `probe_sec / historical-min-probe` is the load signal that
    * cross-checks the drift scalar: a hot host raises both; a uniform
    * code regression raises drift while the probe stays at par.
    * Emitted as `probe_sec` + `probe_ratio` in the bench line.
    */
  private val ProbeThreads = 8
  /** Probe definition version, emitted as `probe_v`: [[probeHistory]]
    * compares only same-version probes (v2 = sustained ~1 s parallel
    * loop; the v1 single-threaded burst was at par during a drift-1.42
    * window and is not comparable).
    */
  private[graft] val ProbeVersion = 2
  private[graft] def hostProbe(): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      val sink = new java.util.concurrent.atomic.AtomicLong()
      val threads = (0 until ProbeThreads).map { t =>
        new Thread(() => {
          var acc = t.toLong
          var k = 0L
          // ~1 s sustained: hypervisor steal and thermal capping show
          // up under SUSTAINED parallel load; a 0.2 s burst slips
          // between throttle windows and reads at par on a hot host
          while (k < 600000000L) { acc += (k * 2654435761L) ^ (acc >>> 7); k += 1 }
          sink.addAndGet(acc) // JIT cannot elide the loop
          ()
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      if (sink.get == 42L) System.err.println("probe")
      (System.nanoTime() - t0) / 1e9
    }
    (1 to 3).map(_ => once()).min
  }

  /** Historical minimum probe time over the same builder-line window
    * [[history]] reads (absent in pre-r17 lines → None → ratio 1).
    */
  private def probeHistory(): Option[Double] =
    try {
      val files = Option(new java.io.File("bench_history").listFiles)
        .getOrElse(Array.empty) ++
        Option(new java.io.File(".").listFiles).getOrElse(Array.empty)
      val vals = files
        .filter(_.getName.matches("BENCH_r\\d+_builder\\.json"))
        .flatMap { f =>
          val text = new String(
            java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
          // same-version probes only: a definition change resets the
          // reference (ratio 1.0) instead of comparing unlike loads
          if (!text.contains("\"probe_v\":" + ProbeVersion)) None
          else "\"probe_sec\":(-?[0-9.]+)".r.findFirstMatchIn(text)
            .map(_.group(1).toDouble)
        }
        .filter(_ > 0)
      if (vals.isEmpty) None else Some(vals.min)
    } catch { case _: Throwable => None }

  /** The drift-adjusted retime floor for a query with history `h`:
    * 1.5× its drift-scaled historical time plus absolute slack. At
    * drift 1 this is the idle-host protocol (slightly looser than the
    * old 1.3× so sub-second jitter stops burning budget); on a
    * uniformly hot host every floor scales by the same drift factor,
    * so zero false positives — while a genuine 2× single-query
    * regression still exceeds 1.5×(its own drifted floor) and is
    * caught.
    */
  private[graft] def historyFloor(h: Double, drift: Double): Double =
    math.max(retimeMinFloorSec, 1.5 * drift * h + 0.15)

  /** Second-pass retry order: outliers sorted by FIRST-PASS START time,
    * earliest first — NOT biggest-first. The r13 gate showed why: the
    * retry pass begins seconds after the first pass ends, so a query
    * that sat at the END of the first pass gets retried inside the same
    * host-stall window that inflated it (w5_window_suite: first 12.41 s,
    * adjacent retry 11.60 s, idle-host truth 0.99 s). Earliest-started
    * outliers have had the longest separation from their stall window;
    * late-suite outliers retry LAST, buying them the whole second pass
    * as separation.
    */
  private[graft] def retryOrder(firstPass: Seq[(String, Double, Long)],
                                floorFor: String => Double): Seq[String] =
    firstPass.filter { case (n, s, _) => s > floorFor(n) }
      .sortBy(_._3).map(_._1)

  /** Third-pass candidates: retried queries whose retry improved by
    * LESS than 20% while still above their floor — the signature of a
    * retry that ran inside the same stall window as its first pass
    * (both runs inflated) rather than a genuinely-expensive query
    * (where the retry confirms the first pass and a third run is
    * wasted budget... bounded by the shared budget either way). Also
    * earliest-started first, at the very END of the suite — maximal
    * separation from any first-pass stall.
    */
  private[graft] def thirdPassCandidates(
      firstPass: Seq[(String, Double, Long)],
      retried: Map[String, Double],
      floorFor: String => Double): Seq[String] =
    firstPass.filter { case (n, first, _) =>
      retried.get(n).exists { again =>
        val best = math.min(first, again)
        best > floorFor(n) && again > 0.8 * first
      }
    }.sortBy(_._3).map(_._1)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus)
    // Untimed warmup: absorb session/codegen/parquet-listing startup AND
    // the host page cache for EVERY fixture table, so no measured query
    // is charged for a cold read of documents/embeddings/events — the
    // driver gate runs on a fresh host where cold-cache reads inflated
    // document/LM-heavy queries 3-11x in round 8. Queries run in sorted
    // order so per-query numbers are comparable across rounds.
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings"))
      try spark.read.parquet(s"$sfDir/$t.parquet").foreach(_ => ())
      catch { case _: Throwable => () }
    // Explicit artifact warm phase: cold builds are charged to one
    // reported build_sec line, not to the first alphabetical consumer.
    val buildSec =
      try Warm.ensureAll(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] warm failed: ${e.getMessage}"); -1.0
      }
    // Host-speed probe BEFORE the timed passes: engine-independent, so
    // its ratio to history separates "hot host" from "uniformly slower
    // code" when the drift scalar is elevated (see driftScalar's cap).
    val probeSec = hostProbe()
    val probeRatio = probeHistory().fold(1.0)(h => probeSec / h)
    var errors = List.empty[String]
    def timeOne(name: String,
                fn: (org.apache.spark.sql.SparkSession, String)
                  => org.apache.spark.sql.DataFrame,
                recordError: Boolean): Double = {
      val t0 = System.nanoTime()
      val ok =
        try { GraftSession.forceAndCount(fn(spark, sfDir)); true }
        catch { case e: Throwable =>
          if (recordError) {
            errors ::= name
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
          }
          false
        }
      // A failed query must not read as the fastest query: report -1.
      if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
    }
    // First pass: every query once, in sorted order, with a wall-clock
    // start stamp (epoch ms) so a stall window in the gate's run is
    // localizable to host time after the fact.
    val firstPass = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val startMs = System.currentTimeMillis()
        (name, timeOne(name, fn, recordError = true), startMs)
    }
    // Second pass: re-time outliers, EARLIEST-STARTED first (see
    // retryOrder — a biggest-first retry of a late-suite query runs
    // seconds after its stalled first pass, inside the same stall
    // window), within budget; a query's official number is the min of
    // its passes (a stall can inflate a run, nothing can deflate one).
    val hist = history()
    // drift-normalized floors (see driftScalar/historyFloor): the r15
    // gate retimed 44/180 on a uniformly 1.31×-hot host — totals and
    // absolute per-query floors are the wrong primitives on this VM,
    // so the floor tests each query against its drift-ADJUSTED history
    val drift = driftScalar(firstPass, hist)
    def floorFor(name: String): Double = hist.get(name) match {
      case Some(h) if h > 0 => historyFloor(h, drift)
      case _ => retimeFloorSec
    }
    val retimed = scala.collection.mutable.Map.empty[String, Double]
    var retimeSpent = 0.0
    def retryPass(names: Seq[String]): Unit =
      for (name <- names if retimeSpent < retimeBudgetSec) {
        val t0 = System.nanoTime()
        val again = timeOne(name, SparkEntry.queries(name), recordError = false)
        retimeSpent += (System.nanoTime() - t0) / 1e9 // failures count too
        if (again >= 0)
          retimed(name) = retimed.get(name).fold(again)(math.min(_, again))
      }
    retryPass(retryOrder(firstPass, floorFor))
    // Third pass, at the very end: a retry that barely improved is as
    // likely a second sample of the SAME stall as a confirmation — one
    // more attempt after maximal time separation, same shared budget.
    retryPass(thirdPassCandidates(firstPass, retimed.toMap, floorFor))
    val results = firstPass.map { case (name, sec, _) =>
      val best = retimed.get(name) match {
        case Some(s) if sec >= 0 => math.min(sec, s)
        case _ => sec
      }
      name -> best
    }
    val good = results.filter(_._2 >= 0)
    val total = if (good.nonEmpty) good.map(_._2).sum else 0.0
    // Failed-query names, capped to the byte budget: with many
    // failures the raw array alone could overflow the driver's ~2KB
    // capture window exactly when its content matters most, so emit
    // the first few names plus a count of the rest.
    val sortedErrs = errors.sorted
    val shownErrs = sortedErrs.take(5)
    val errItems = shownErrs.map("\"" + _ + "\"") ++
      (if (sortedErrs.size > shownErrs.size)
         Seq("\"+" + (sortedErrs.size - shownErrs.size) + " more\"")
       else Nil)
    val errs = errItems.mkString("[", ",", "]")
    def jsonLine(qs: Seq[(String, Double)], extra: String): String = {
      val m = qs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","build_sec":${fmt(buildSec)},"drift":${fmt(drift)},"probe_sec":${fmt(probeSec)},"probe_v":$ProbeVersion,"probe_ratio":${fmt(probeRatio)},"n_queries":${results.size},"n_errors":${sortedErrs.size},"errors":$errs$extra,"queries":$m,"sf":"$sfDir"}"""
    }
    // Full per-query detail goes ONLY to bench_full.json (cwd): a
    // second stdout copy of the ~5 KB line risks landing inside the
    // driver's 2 KB tail window on a short suite and truncating the
    // line that matters. `timing` carries per-query first-pass start
    // stamp + raw pass times so any future stall is auditable.
    val timing = firstPass.map { case (name, sec, startMs) =>
      val re = retimed.get(name).map(s => ",\"retry\":" + fmt(s)).getOrElse("")
      "\"" + name + "\":{\"t0\":" + startMs + ",\"first\":" + fmt(sec) + re + "}"
    }.mkString("{", ",", "}")
    val fullLine = jsonLine(results, s""","timing":$timing""") + "\n"
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_full.json"),
      fullLine.getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] bench_full.json write failed: ${e.getMessage}")
    }
    // The LAST stdout line is the gate contract. The driver keeps only
    // the final ~2000 bytes of sbt output (sbt appends its own
    // "[success]" trailer after us), and the full 130-query line is
    // ~5 KB — every BENCH_r1..r9 capture truncated it mid-line and
    // parsed nothing. So the final line is a compact summary (total,
    // build, errors, the most expensive queries) sized well under the
    // window; full detail lives in bench_full.json (cwd).
    val budget = 1400
    val top = results.sortBy(-_._2)
    val kept = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    var used = 220 + errs.length // fixed fields + slack
    for ((k, v) <- top if used + k.length + 12 < budget) {
      kept += ((k, v)); used += k.length + 12
    }
    println(jsonLine(kept.sortBy(-_._2).toSeq,
      s""","retimed":${retimed.size},"detail":"bench_full.json""""))
    spark.stop()
  }
}
