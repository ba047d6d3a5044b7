package graft.analytics

import graft.Tables
import graft.Tables.{davg, dsum}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The three daily KPI shapes of the reference's analytics job
  * (`glue_jobs/music-streaming-transform.py:100-153`): a multi-measure
  * hash aggregation (A1+A2), and two group-count → ranking-window → rank
  * filter top-K pipelines (A3+W1, A4+W2).
  *
  * Scale notes (100 TB):
  *  - A1's `countDistinct` plans Expand + two-phase HashAggregate —
  *    exact but shuffle-heavy; [[genreKpisApprox]] is the HLL variant
  *    for the bench path (documented deviation, SURVEY.md §7.4).
  *  - Top-K uses `row_number` + `rank <= k`: Spark ≥3.5 rewrites this
  *    with WindowGroupLimit, pushing a per-partition top-k below the
  *    shuffle so only k rows per group per mapper move.
  *  - Tie-breaks are explicit secondary sort keys (the reference's ties
  *    are arbitrary, `music-streaming-transform.py:126-128`; we need
  *    deterministic output for the oracle gate — SURVEY.md §7.5).
  */
object Kpis {

  /** A1+A2: per-(group, day) multi-measure aggregate — the `genre_kpis`
    * table (`music-streaming-transform.py:100-106`). count /
    * countDistinct / sum / avg plus the derived per-user ratio.
    */
  def genreKpis(enriched: DataFrame): DataFrame =
    enriched
      .groupBy(col("event_type"), col("date"))
      .agg(
        count(lit(1)).as("listen_count"),
        countDistinct(col("user_id")).as("unique_listeners"),
        dsum(col("value")).as("total_value"),
        davg(col("value")).as("avg_value"))
      .withColumn("avg_value_per_user", col("total_value") / col("unique_listeners"))

  /** A1 at 100 TB: exact distinct swapped for HLL (±2% default) — one
    * shuffle instead of Expand's two, no blow-up on wide group counts.
    */
  def genreKpisApprox(enriched: DataFrame): DataFrame =
    enriched
      .groupBy(col("event_type"), col("date"))
      .agg(
        count(lit(1)).as("listen_count"),
        approx_count_distinct(col("user_id")).as("unique_listeners"),
        dsum(col("value")).as("total_value"),
        davg(col("value")).as("avg_value"))
      .withColumn("avg_value_per_user", col("total_value") / col("unique_listeners"))

  /** W1/W2 shape: rank rows inside each group and keep the top k.
    * `orderBy` is descending on the measure with ascending tie-break
    * keys appended for determinism.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[Column], measure: Column,
                   tieBreak: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols: _*)
      .orderBy(measure.desc +: tieBreak.map(_.asc): _*)
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** A3+W1: top-3 parts by play count per (returnflag, ship-day) — the
    * `top_songs` analog (`music-streaming-transform.py:121-130`).
    * `days` scopes the computation to the given days (the aggregation
    * and window are per-day, so a day-sliced run equals the same days of
    * a full run — the property the incremental serving store relies on);
    * the filter sits directly on the scan, so a date-partitioned
    * lineitem prunes at the source.
    */
  def topPartsPerFlagDay(spark: SparkSession, dir: String, k: Int = 3,
                         days: Option[Seq[String]] = None): DataFrame = {
    val base = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), to_date(col("l_shipdate")).as("date"), col("l_partkey"))
    val counted = days.fold(base)(ds => base.filter(col("date").cast("string").isin(ds: _*)))
      .groupBy(col("l_returnflag"), col("date"), col("l_partkey"))
      .agg(count(lit(1)).as("play_count"))
    topKPerGroup(counted,
      Seq(col("l_returnflag"), col("date")), col("play_count"),
      Seq(col("l_partkey")), k)
  }

  /** A4+W2: top-5 event types per day — the `top_genres` analog
    * (`music-streaming-transform.py:145-153`). `days` as in
    * [[topPartsPerFlagDay]].
    */
  def topTypesPerDay(spark: SparkSession, dir: String, k: Int = 5,
                     days: Option[Seq[String]] = None): DataFrame = {
    val base = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("date"), col("event_type"))
    val counted = days.fold(base)(ds => base.filter(col("date").cast("string").isin(ds: _*)))
      .groupBy(col("date"), col("event_type"))
      .agg(count(lit(1)).as("total_plays"))
    topKPerGroup(counted,
      Seq(col("date")), col("total_plays"), Seq(col("event_type")), k)
  }

  /** A1 distinct-count via a deterministic KMV (k-minimum-values /
    * theta-sketch family, Bar-Yossef et al. 2002) estimator — the
    * oracle-verifiable twin of [[genreKpisApprox]]'s HLL: per group,
    * hash each user to a 60-bit integer (md5 prefix — both engines
    * compute the identical value), keep the k-th smallest distinct
    * hash h_k, and estimate distinct = (k−1)·2⁶⁰/h_k (exact distinct
    * when a group has fewer than k). Every step is integer-exact —
    * the estimate itself is a half-up INTEGRAL division carried out in
    * DECIMAL(38,0)/HUGEINT (the numerator 2·(k−1)·2⁶⁰ overflows a
    * long), so DuckDB replays it hash-for-hash with no double-rounding
    * grid anywhere — unlike HLL, whose registers are engine-private.
    * rse ≈ 1/√(k−2); the default k=32 (rse ≈ 18%) is chosen so the
    * ESTIMATOR branch actually executes at gate scale (sf0.01 groups
    * hold ~50–100 distinct users) — production would run k≥256, and
    * the exact count rides alongside in `uniq_exact` either way.
    *
    * Scale shape: the dedup on (group, hash) and the per-group order
    * statistic are one shuffle each on the same keys. The window is
    * rank-bounded per group, and the alternative at 100 TB — keeping
    * only k minima per partition and merging — is what a sketch
    * library does; for pure speed at scale [[genreKpisApprox]] (HLL,
    * map-side partial merge) remains the documented serving path, with
    * this as the deterministic gate twin (the Pca exact/fast pattern).
    */
  def genreKpisKmv(enriched: DataFrame, k: Int = 32): DataFrame = {
    val h = conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
      .cast("long")
    val dh = enriched
      .select(col("event_type"), col("date"), h.as("h"))
      .distinct()
    val w = Window.partitionBy(col("event_type"), col("date")).orderBy(col("h"))
    // half-up((k−1)·2⁶⁰ / hk) on exact integers: hu(N/d) = (2N+d) div 2d.
    // 2N = (k−1)·2⁶¹ needs 128-bit intermediates — DECIMAL(38,0) here,
    // HUGEINT in the oracle; the quotient is back under 2⁶³.
    val num2 = (BigInt(k - 1) * BigInt(2).pow(61)).toString
    dh.withColumn("rn", row_number().over(w))
      .groupBy(col("event_type"), col("date"))
      .agg(count(lit(1)).as("uniq_exact"),
        max(when(col("rn") === k, col("h"))).as("hk"))
      .select(col("event_type"), col("date"), col("uniq_exact"),
        when(col("uniq_exact") < k, col("uniq_exact"))
          .otherwise(expr(
            s"CAST((CAST('$num2' AS DECIMAL(38,0)) + hk) DIV (2 * hk) AS BIGINT)"))
          .as("uniq_kmv"))
  }

  /** Daily retention cohorts over the event stream — the engagement
    * report every activity pipeline ships: users grouped by
    * first-activity day, then for each later day the count still
    * active and the retained share of the cohort. All exact integer
    * aggregation; the share is computed as half-up integer micro-units
    * (`retention_ppm`) — round(double, 6) is engine-dependent at 7-dp
    * tie ratios like 3/640 (Spark rounds the shortest-decimal
    * representation, DuckDB the scaled binary) — with the double
    * `retention` derived by ONE correctly-rounded division ppm/10⁶,
    * identical in every engine. (Day granularity rather
    * than the classic week: the fixture spans 30 days, so weeks would
    * collapse to a single cohort and verify nothing.)
    *
    * Scale shape: distinct (user, day) shuffles once on user for the
    * cohort min, once on (cohort, offset) for the report — no window
    * over the full stream. The first-week table is users-sized and
    * already partitioned by user_id from its groupBy, so the join back
    * reuses that exchange (AQE broadcasts it instead when users fit);
    * the per-cohort size table is weeks-sized and hinted broadcast.
    */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val uw = events
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val first = uw.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
    val sized = first.groupBy(col("cohort")).agg(count(lit(1)).as("cohort_size"))
    uw.join(first, Seq("user_id"))
      .groupBy(col("cohort"),
        datediff(col("day"), col("cohort")).cast("int").as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sized), Seq("cohort"))
      .select(col("cohort"), col("day_offset"), col("n_active"),
        expr("(2 * n_active * 1000000 + cohort_size) DIV (2 * cohort_size)")
          .as("retention_ppm"))
      .withColumn("retention",
        col("retention_ppm").cast("double") / lit(1000000.0))
  }

  /** Ordered conversion funnel over the event stream (view → click →
    * purchase by default): a user converts through step i when their
    * earliest step-i event is strictly later than their earliest
    * step-(i−1) event — the standard loose-ordering funnel semantics.
    * One conditional-min aggregate per user, then a global roll-up:
    * two shuffles total, no self-joins, no windows over the stream.
    */
  def eventFunnel(events: DataFrame,
                  steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    val stepMins = steps.map(st =>
      min(when(col("event_type") === st, col("ts"))).as(s"t_$st"))
    val mins = events
      .filter(col("event_type").isin(steps: _*))
      .groupBy(col("user_id"))
      .agg(stepMins.head, stepMins.tail: _*)
    val reached = steps.indices.map { i =>
      // reached step i = every prior step seen, in strictly increasing
      // earliest-occurrence order
      val conds = (0 to i).map(j => col(s"t_${steps(j)}").isNotNull) ++
        (1 to i).map(j => col(s"t_${steps(j - 1)}") < col(s"t_${steps(j)}"))
      sum(when(conds.reduce(_ && _), 1L).otherwise(0L)).as(s"n_${steps(i)}")
    }
    val totals = mins.agg(reached.head, reached.tail: _*)
    // unpivot to one row per step with the conversion rate vs step 1 —
    // half-up integer micro-units (the retention_ppm discipline: no
    // round(double, 6) on a ratio), double derived as ppm/10⁶
    val rows = steps.zipWithIndex.map { case (st, i) =>
      val ppm = when(col(s"n_${steps.head}") > 0, expr(
        s"(2 * n_$st * 1000000 + n_${steps.head}) DIV (2 * n_${steps.head})"))
      struct(lit(i + 1).as("step"), lit(st).as("event_type"),
        col(s"n_$st").as("n_users"),
        (ppm.cast("double") / lit(1000000.0)).as("conversion"),
        ppm.as("conversion_ppm"))
    }
    totals.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** Batch sessionization of the event stream — the offline twin of
    * the streaming session windows ([[graft.stream.Sessions]]): a new
    * session starts at a user's first event or after a gap >
    * `gapMinutes`; output is one row per session with its event count
    * and exact duration. Timestamps leave as epoch-micro longs
    * (`start_us`/`end_us`/`duration_us`) — pure integers, so the
    * oracle compares exactly with no cross-engine timestamp-formatting
    * grid.
    *
    * Scale shape: one shuffle on user_id feeding both windows (lag and
    * the running is-start sum share the same partitioning and sort)
    * plus the groupBy on (user, session) which AQE-reuses that
    * exchange; per-user state is a sort, never a collect. Session
    * count per user is data-bounded, not corpus-bounded.
    */
  def userSessions(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    require(gapMinutes > 0, s"session gap must be positive: $gapMinutes")
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("is_start",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("is_start"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"), max(col("us")).as("end_us"))
      .select(col("user_id"), col("session_seq"), col("n_events"),
        col("start_us"), col("end_us"),
        (col("end_us") - col("start_us")).as("duration_us"))
  }

  /** K-step funnel with WINDOWED ordering — the general form of
    * [[eventFunnel]] real funnel analysis needs: the step list is a
    * parameter, and a user advances from step i−1 to step i only via
    * an event STRICTLY after their step-(i−1) anchor and within
    * `maxGapDays` of it (conversion-within-N semantics). The anchor
    * chain is sequential (t_i depends on t_{i−1}), so it cannot be one
    * conditional-min aggregate; instead ONE groupBy collects each
    * user's per-step sorted timestamp lists and the chain evaluates as
    * per-row higher-order array expressions — no self-joins, no k
    * passes. Output matches [[eventFunnel]]:
    * (step, event_type, n_users, conversion, conversion_ppm).
    *
    * Skew guard: the per-user lists would otherwise be bounded only by
    * that user's own event count — a bot/service account with 10⁷
    * events in one step is a task-OOM at 100 TB (the `collect_list`
    * BUFFER blows up, so capping after collection guards nothing).
    * Instead a rank filter keeps each user's `maxEventsPerStep`
    * EARLIEST events per step BEFORE the aggregation; it rides
    * WindowGroupLimit (plan spec-pinned), so every map task truncates
    * its own (user, step) runs to the cap before anything shuffles.
    * Documented semantics under the cap: a user's step-i candidates
    * are their earliest `maxEventsPerStep` step-i events — a funnel
    * whose qualifying event lies beyond that prefix counts as a
    * non-reacher. The default cap (10⁴ per step) is ~60× the densest
    * fixture user and far past any human activity pattern; boundary
    * ties in `ts` are harmless because only the kept timestamp
    * MULTISET feeds the chain, and the earliest-N multiset is
    * order-insensitive.
    *
    * The cap is NOT silent (house no-silent-caps discipline): each
    * output row carries `n_capped_users` — how many users had more
    * than `maxEventsPerStep` events of that step, i.e. whose candidate
    * list was truncated. The marker costs nothing extra: the rank
    * filter keeps rows up to cap+1, the cap+1 row is only the per-user
    * capped flag (it never enters the timestamp lists), and the flags
    * ride the same two aggregations the funnel already runs.
    */
  def funnelWindowed(events: DataFrame,
                     steps: Seq[String] = Seq("view", "click", "purchase"),
                     maxGapDays: Int = 7,
                     maxEventsPerStep: Int = 10000): DataFrame = {
    require(steps.size >= 2, s"a funnel needs at least 2 steps: $steps")
    require(maxGapDays > 0, s"conversion window must be positive: $maxGapDays")
    require(maxEventsPerStep > 0,
      s"per-step event cap must be positive: $maxEventsPerStep")
    val arrays = steps.map(st =>
      sort_array(collect_list(when(col("event_type") === st &&
        col("_rn") <= maxEventsPerStep, col("ts")))).as(s"a_$st"))
    // the cap+1 row exists ⟺ this user's step list was truncated
    val capFlags = steps.map(st =>
      max(when(col("event_type") === st &&
        col("_rn") === maxEventsPerStep + 1, 1L).otherwise(0L))
        .as(s"capped_$st"))
    val aggs = arrays ++ capFlags
    val capWindow = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"))
    var cur = events
      .filter(col("event_type").isin(steps: _*))
      .withColumn("_rn", row_number().over(capWindow))
      .filter(col("_rn") <= maxEventsPerStep + 1)
      .groupBy(col("user_id"))
      .agg(aggs.head, aggs.tail: _*)
      // anchor of step 1: the user's earliest step-1 event
      .withColumn(s"t_${steps.head}", array_min(col(s"a_${steps.head}")))
    for (i <- 1 until steps.size) {
      val prev = col(s"t_${steps(i - 1)}")
      // earliest step-i event in (t_{i-1}, t_{i-1} + gap]; a null
      // anchor nulls the lambda predicate, so the filter empties and
      // array_min returns null — non-reachers propagate for free
      cur = cur.withColumn(s"t_${steps(i)}",
        array_min(filter(col(s"a_${steps(i)}"),
          x => x > prev &&
            x <= prev + expr(s"INTERVAL $maxGapDays DAYS"))))
    }
    val reached = steps.map(st =>
      sum(when(col(s"t_$st").isNotNull, 1L).otherwise(0L)).as(s"n_$st")) ++
      steps.map(st => sum(col(s"capped_$st")).as(s"nc_$st"))
    val totals = cur.agg(reached.head, reached.tail: _*)
    val rows = steps.zipWithIndex.map { case (st, i) =>
      val ppm = when(col(s"n_${steps.head}") > 0, expr(
        s"(2 * n_$st * 1000000 + n_${steps.head}) DIV (2 * n_${steps.head})"))
      struct(lit(i + 1).as("step"), lit(st).as("event_type"),
        col(s"n_$st").as("n_users"),
        (ppm.cast("double") / lit(1000000.0)).as("conversion"),
        ppm.as("conversion_ppm"),
        col(s"nc_$st").as("n_capped_users"))
    }
    totals.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }
}
