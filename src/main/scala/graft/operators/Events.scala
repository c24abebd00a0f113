package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-stream analytics over the (user, timestamp, type) schema — the
 * classic product-analytics trio: sessionization (gaps-and-islands),
 * ordered funnels, and cohort retention.
 *
 * Scale shape: everything here is one shuffle on the user key; the
 * per-user windows parallelize across users (billions of users = good
 * partitioning, never a global window), aggregations are partial-agg
 * friendly, and all time arithmetic is integer epoch-microseconds so
 * any engine reproduces it bit-for-bit.
 */
object Events {

  /** Epoch-microseconds of a timestamp column. TIMESTAMP passes through
    * `unix_micros` directly; TIMESTAMP_NTZ (files written without a UTC
    * flag) is first cast to TIMESTAMP — exact under the engine's UTC
    * session timezone. Any OTHER type is rejected up front: a blanket
    * cast would silently read a numeric epoch column as SECONDS (and a
    * string column as best-effort parse-to-null), turning every
    * downstream result quietly wrong instead of failing analysis. */
  private def us(df: DataFrame, tsCol: String): Column =
    df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(col(tsCol))
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col(tsCol).cast(org.apache.spark.sql.types.TimestampType))
      case other => throw new IllegalArgumentException(
        s"column $tsCol must be TIMESTAMP or TIMESTAMP_NTZ, got $other " +
          "- convert explicitly (e.g. timestamp_micros for epoch longs)")
    }

  /** Gaps-and-islands sessionization: a session breaks when the gap to
    * the user's previous event EXCEEDS `gapSeconds`. One row per session
    * with its event count, start, and duration. Tie-safe: rows sharing a
    * timestamp land in the same session regardless of intra-tie order
    * (zero gap; the RANGE running sum gives equal session indexes), so
    * the result is deterministic under any partitioning.
    *
    * The batch twin of `streaming.Streams.sessionize`
    * (flatMapGroupsWithState) — same gap rule, replayable over history. */
  def sessionize(events: DataFrame, userCol: String = "user_id",
                 tsCol: String = "ts", gapSeconds: Long = 1800L): DataFrame = {
    require(gapSeconds > 0, "gap must be positive")
    val byUser = Window.partitionBy(userCol).orderBy(col("__us"))
    events.select(col(userCol), us(events, tsCol).as("__us"))
      .withColumn("__gap", col("__us") - lag("__us", 1).over(byUser))
      .withColumn("__new",
        when(col("__gap").isNull || col("__gap") > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum("__new").over(byUser))
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min("__us").as("start_us"),
        (max("__us") - min("__us")).as("duration_us"))
  }

  /** Chunk-and-stitch sessionization — EXACT [[sessionize]] semantics
    * with the single-task-per-user ceiling removed: one pathological user
    * with a billion events funnels [[sessionize]]'s whole per-user window
    * into one task (the measured ceiling in PLANS.md eventskew); here the
    * per-event window runs within (user, coarse time bucket) partitions,
    * and only a per-(user, bucket) SUMMARY (first/last timestamp, local
    * session count — |buckets| rows, not |events|) takes the sequential
    * per-user pass that stitches boundary-crossing sessions back
    * together.
    *
    * Correct because the gap rule is ADJACENT-ONLY: a session crosses a
    * bucket boundary iff the gap between one bucket's last event and the
    * next non-empty bucket's first event is within the threshold, so the
    * global session index of a local session is
    * `(Σ earlier buckets' local sessions) + local_idx − (Σ stitched
    * boundaries up to and including this bucket)` — pure prefix sums over
    * the summary rows. Result ≡ [[sessionize]] (spec-pinned on hot-user
    * fixtures, boundary-exact gaps included).
    *
    * Pick `bucketSeconds` ≫ `gapSeconds` (default 256× — buckets an
    * order of magnitude longer than any session gap) so per-bucket event
    * counts, not per-user history, bound the window task. */
  def sessionizeChunked(events: DataFrame, userCol: String = "user_id",
                        tsCol: String = "ts", gapSeconds: Long = 1800L,
                        bucketSeconds: Long = 0L): DataFrame = {
    require(gapSeconds > 0, "gap must be positive")
    val bucketUs = (if (bucketSeconds > 0) bucketSeconds
                    else gapSeconds * 256L) * 1000000L
    val gapUs = gapSeconds * 1000000L

    val ev = events.select(col(userCol), us(events, tsCol).as("__us"))
      .withColumn("__bucket", expr(s"__us div ${bucketUs}L"))
    // per-(user, bucket) local sessionization — the parallel part
    val wLocal = Window.partitionBy(userCol, "__bucket").orderBy(col("__us"))
    val local = ev
      .withColumn("__gap", col("__us") - lag("__us", 1).over(wLocal))
      .withColumn("__new",
        when(col("__gap").isNull || col("__gap") > gapUs, 1L).otherwise(0L))
      .withColumn("__lidx", sum("__new").over(wLocal))
    // per-(user, bucket) summary — |non-empty buckets| rows per user
    val summary = local.groupBy(col(userCol), col("__bucket"))
      .agg(min("__us").as("__first"), max("__us").as("__last"),
        max("__lidx").as("__nlocal"))
    val wBuckets = Window.partitionBy(userCol).orderBy(col("__bucket"))
    val stitched = summary
      .withColumn("__stitch",
        when(col("__first") - lag("__last", 1).over(wBuckets) <= gapUs, 1L)
          .otherwise(0L))
      .withColumn("__pre",
        coalesce(sum("__nlocal").over(
          wBuckets.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__stitches",
        sum("__stitch").over(
          wBuckets.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col(userCol), col("__bucket"), col("__pre"), col("__stitches"))
    // both sides arrive hash-partitioned on (user, bucket) from their
    // window/aggregation — the stitch join re-uses that layout
    local.join(stitched, Seq(userCol, "__bucket"))
      .withColumn("session_idx",
        col("__pre") + col("__lidx") - col("__stitches"))
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min("__us").as("start_us"),
        (max("__us") - min("__us")).as("duration_us"))
  }

  /** First-occurrence ordered funnel: a user completes step i when the
    * FIRST occurrence of every step 1..i exists and their first-occurrence
    * times strictly increase (t1 < t2 < ... < ti). Returns one row per
    * step with the completing-user count. One groupBy(user) with
    * conditional mins — no self-joins, no per-event state. */
  def funnel(events: DataFrame, steps: Seq[String],
             userCol: String = "user_id", tsCol: String = "ts",
             typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val spark = events.sparkSession
    import spark.implicits._
    val mins = steps.zipWithIndex.map { case (s, i) =>
      min(when(col(typeCol) === s, us(events, tsCol))).as(s"__t$i")
    }
    val perUser = events.groupBy(col(userCol)).agg(mins.head, mins.tail: _*)
    val completed = steps.indices.map { i =>
      val cond = (0 to i).map(j => col(s"__t$j").isNotNull)
        .reduce(_ && _) &&
        (1 to i).map(j => col(s"__t${j - 1}") < col(s"__t$j"))
          .foldLeft(lit(true))(_ && _)
      sum(when(cond, 1L).otherwise(0L)).as(s"__c$i")
    }
    val row = perUser.agg(completed.head, completed.tail: _*).head()
    // empty input -> the global agg returns one all-null row; every step
    // completed by zero users
    steps.zipWithIndex.map { case (s, i) =>
      (i + 1, s, if (row.isNullAt(i)) 0L else row.getLong(i))
    }.toDF("step", "event_type", "n_users")
  }

  /** Strict sequential funnel — the windowed production form of
    * [[funnel]]: step i completes at the user's FIRST step-i event
    * STRICTLY AFTER their step-(i-1) completion (not the global first
    * occurrence — an early stray view doesn't block a later
    * signup→view chain), and when `windowUs` is set, within that many
    * microseconds of it (the "converted within 24h of the previous
    * step" product question). Returns (step, event_type, n_users).
    *
    * Shape at 100 TB: one shuffle join + partial-aggregated min per
    * step — `steps.size` rounds over a frontier that only SHRINKS
    * (completing users), each round's frontier eagerly checkpointed and
    * its predecessor's blocks released; never a per-user sorted pass or
    * a window over the whole stream. */
  def funnelSequential(events: DataFrame, steps: Seq[String],
                       userCol: String = "user_id", tsCol: String = "ts",
                       typeCol: String = "event_type",
                       windowUs: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    require(windowUs.forall(_ > 0), "window must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events.select(col(userCol).as("__u"), col(typeCol).as("__t"),
      us(events, tsCol).as("__us"))
    var frontier = typed.filter(col("__t") === steps.head)
      .groupBy("__u").agg(min("__us").as("__prev"))
      .localCheckpoint(true)
    val counts = Array.newBuilder[(Int, String, Long)]
    counts += ((1, steps.head, frontier.count()))
    steps.drop(1).zipWithIndex.foreach { case (s, i) =>
      val prevFrontier = frontier
      val inWindow = windowUs.map(w => col("__us") <= col("__prev") + w)
        .getOrElse(lit(true))
      frontier = typed.filter(col("__t") === s)
        .join(frontier, "__u")
        .filter(col("__us") > col("__prev") && inWindow)
        .groupBy("__u").agg(min("__us").as("__prev"))
        .localCheckpoint(true)
      Exec.releaseCheckpoint(prevFrontier)
      counts += ((i + 2, s, frontier.count()))
    }
    // the returned frame is a tiny local counts table; the last step's
    // |users|-sized frontier checkpoint would otherwise stay pinned
    Exec.releaseCheckpoint(frontier)
    counts.result().toSeq.toDF("step", "event_type", "n_users")
  }

  /** As-of join. Per left row, within the same key (all bounds
    * INCLUSIVE, matching DuckDB's ASOF JOIN family — the q71/q121
    * oracles):
    *  - `"backward"` (default): the right row with the GREATEST
    *    timestamp ≤ the left's (`l.ts >= r.ts`);
    *  - `"forward"`: the right row with the SMALLEST timestamp ≥ the
    *    left's (`l.ts <= r.ts`);
    *  - `"nearest"`: whichever of the two is closer in time, backward
    *    winning exact-distance ties (the pandas `merge_asof` tie
    *    convention).
    *
    * Implemented as the union + carry window trick — tag both sides,
    * sort per key by (ts, side) with the right side adjacent to ties,
    * and let `last/first(..., ignoreNulls)` carry the right payload
    * across the frame — so any direction is ONE shuffle on the key with
    * per-key parallel windows: no range-condition join, no
    * candidate-pair explosion, the shape that survives billions of rows
    * per side ("nearest" adds a second sorted window over the SAME hash
    * partitioning — no extra exchange, plan-asserted in EventsSpec).
    * The right side must be unique per (key, ts) (pre-aggregate
    * otherwise); left rows with no match in the direction keep nulls. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String = "user_id",
               tsCol: String = "ts", payloadCol: String = "event_id",
               direction: String = "backward"): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got $direction")
    // the two appended output columns must not collide with a left column
    // of the same name (the left row expands back to top level at the end)
    val reserved = Seq(s"asof_$payloadCol", "asof_us")
    val clash = left.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"asofJoin output column(s) ${clash.mkString(", ")} already exist " +
        "in the left frame - rename them before joining")
    val leftStruct = struct(left.columns.map(col): _*)
    val payloadType = right.schema(payloadCol).dataType
    val l = left.select(col(keyCol).as("__k"), us(left, tsCol).as("__us"),
      lit(1).as("__kind"), leftStruct.as("__lrow"),
      lit(null).cast(payloadType).as("__p"))
    val lrowType = l.schema("__lrow").dataType
    val r = right.select(col(keyCol).as("__k"), us(right, tsCol).as("__us"),
      lit(0).as("__kind"), lit(null).cast(lrowType).as("__lrow"),
      col(payloadCol).cast(payloadType).as("__p"))
    // backward: right-before-left on ties, carry the last prior right
    val wB = Window.partitionBy("__k").orderBy(col("__us"), col("__kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward: left-before-right on ties, take the first following right
    val wF = Window.partitionBy("__k")
      .orderBy(col("__us"), col("__kind").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val rightUs = when(col("__kind") === 0, col("__us"))
    val base = l.unionByName(r)
    val tagged = direction match {
      case "backward" =>
        base.withColumn("__asof_p", last(col("__p"), true).over(wB))
          .withColumn("__asof_us", last(rightUs, true).over(wB))
      case "forward" =>
        base.withColumn("__asof_p", first(col("__p"), true).over(wF))
          .withColumn("__asof_us", first(rightUs, true).over(wF))
      case "nearest" =>
        base
          .withColumn("__bp", last(col("__p"), true).over(wB))
          .withColumn("__bus", last(rightUs, true).over(wB))
          .withColumn("__fp", first(col("__p"), true).over(wF))
          .withColumn("__fus", first(rightUs, true).over(wF))
          .withColumn("__asof_p",
            when(col("__fus").isNull || (col("__bus").isNotNull &&
              (col("__us") - col("__bus")) <= (col("__fus") - col("__us"))),
              col("__bp")).otherwise(col("__fp")))
          .withColumn("__asof_us",
            when(col("__fus").isNull || (col("__bus").isNotNull &&
              (col("__us") - col("__bus")) <= (col("__fus") - col("__us"))),
              col("__bus")).otherwise(col("__fus")))
    }
    tagged
      .filter(col("__kind") === 1)
      .select(Seq(col("__lrow.*"),
        col("__asof_p").as(s"asof_$payloadCol"),
        col("__asof_us").as("asof_us")): _*)
  }

  /** Gap-fill / resample onto a fixed time grid with last-observation-
    * carried-forward: per key, one row per `stepUs`-wide grid instant
    * from floor(first obs) to floor(last obs), each carrying the latest
    * observation at-or-before it ([[asofJoin]] backward — the grid
    * instant preceding the first observation keeps nulls, the standard
    * LOCF bucket-0 convention). Returns the grid columns (`keyCol`,
    * `grid_us`, `tsCol`) plus `asof_<payloadCol>` / `asof_us`.
    *
    * The right side must be unique per (key, ts) — pre-aggregate ties.
    *
    * Shape at 100 TB: bounds are one partial-aggregated pass; the grid
    * is a narrow per-key explode bounded by span/step rows per key (no
    * shuffle); the fill is the one-shuffle as-of window. A pathological
    * span/step ratio inflates the GRID, not a join — size `stepUs` to
    * the reporting granularity, never below it. */
  def resampleLocf(obs: DataFrame, keyCol: String = "user_id",
                   tsCol: String = "ts", payloadCol: String = "event_id",
                   stepUs: Long = 86400000000L): DataFrame = {
    require(stepUs > 0, "step must be positive")
    val bounds = obs.groupBy(col(keyCol))
      .agg(min(us(obs, tsCol)).as("__mn"), max(us(obs, tsCol)).as("__mx"))
    val grid = bounds.select(col(keyCol),
        explode(sequence(
          (col("__mn") - pmod(col("__mn"), lit(stepUs))),
          (col("__mx") - pmod(col("__mx"), lit(stepUs))),
          lit(stepUs))).as("grid_us"))
      .withColumn(tsCol, timestamp_micros(col("grid_us")))
    asofJoin(grid, obs.select(col(keyCol), col(tsCol), col(payloadCol)),
      keyCol, tsCol, payloadCol)
  }

  /** Range join: points matched to the intervals containing them
    * (start ≤ pt ≤ end, inclusive) within the same key — via interval
    * BINNING: each interval explodes to the fixed-width bins it covers,
    * points equi-join on (key, bin), and the exact range predicate
    * filters the candidates. Spark's native plan for a range condition
    * is a nested-loop/cartesian (quadratic); the binned form is a plain
    * equi-join whose cost scales with interval-length/binWidth — the
    * standard interval-bucketing trade (EventsSpec asserts no
    * BroadcastNestedLoopJoin in the plan). Each point lives in exactly
    * one bin, so containment hits are emitted exactly once. */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keyCol: String,
                ptUsCol: String, startUsCol: String, endUsCol: String,
                binWidthUs: Long = 3600000000L): DataFrame = {
    require(binWidthUs > 0, "bin width must be positive")
    val binned = intervals.withColumn("__bin",
      explode(sequence(expr(s"$startUsCol div ${binWidthUs}L"),
        expr(s"$endUsCol div ${binWidthUs}L"))))
    points.withColumn("__bin", expr(s"$ptUsCol div ${binWidthUs}L"))
      .join(binned, Seq(keyCol, "__bin"))
      .filter(col(ptUsCol) >= col(startUsCol) &&
        col(ptUsCol) <= col(endUsCol))
      .drop("__bin")
  }

  /** Cohort retention: users bucketed by their first-activity period
    * (periodDays-wide windows from the epoch, pure integer division of
    * epoch-microseconds); one row per (cohort period, offset) with the
    * count of cohort users active in that offset period. */
  def retention(events: DataFrame, userCol: String = "user_id",
                tsCol: String = "ts", periodDays: Int = 7): DataFrame = {
    require(periodDays > 0, "periodDays must be positive")
    val periodUs = periodDays * 86400000000L
    val active = events
      .select(col(userCol),
        (us(events, tsCol).cast("long")).as("__us"))
      .select(col(userCol), expr(s"__us div ${periodUs}L").as("period"))
      .distinct()
    val cohorts = active.groupBy(col(userCol))
      .agg(min("period").as("cohort"))
    active.join(cohorts, userCol)
      .groupBy(col("cohort"), (col("period") - col("cohort")).as("period_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Hopping (sliding) time-window aggregation — the BATCH face of the
    * streaming windowed agg in [[graft.streaming.Streams]]: every event
    * lands in the `width/slide` windows covering its timestamp
    * ([start, start + width), starts aligned to epoch multiples of
    * `slide` — Spark's `window()` convention, which the built-in
    * generates natively as a narrow per-row explode, no join). Returns
    * (ws_us, we_us, <keys>, n, total) with window bounds as epoch
    * micros and `total` the DECIMAL-exact sum of `valueCol` cast back
    * to double (associative under any partial-agg order — gate q134
    * replays it cell-exactly from window-index arithmetic in DuckDB).
    *
    * Shape at 100 TB: one map-side-combined hash aggregate on
    * (window, keys); the explode factor is width/slide (4 for the
    * 1h/15min default) applied BEFORE partial aggregation, so the
    * shuffle carries one row per (window, key) per map task — never
    * the exploded event stream. */
  def hoppingWindowAgg(events: DataFrame, width: String = "1 hour",
                       slide: String = "15 minutes",
                       tsCol: String = "ts",
                       keyCols: Seq[String] = Seq("event_type"),
                       valueCol: String = "value",
                       decimalScale: Int = 6): DataFrame = {
    val ts = events.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampType => col(tsCol)
      case org.apache.spark.sql.types.TimestampNTZType =>
        // the NTZ→TIMESTAMP cast reinterprets the wall clock in the
        // SESSION timezone; any tz but UTC would silently shift every
        // window boundary away from the documented epoch-micro
        // arithmetic on the NTZ value — fail loudly instead
        require(events.sparkSession.conf.get(
            "spark.sql.session.timeZone") == "UTC",
          s"NTZ $tsCol requires spark.sql.session.timeZone=UTC (the " +
            "engine-wide convention) — window placement would otherwise " +
            "depend on the session timezone")
        col(tsCol).cast(org.apache.spark.sql.types.TimestampType)
      case other => throw new IllegalArgumentException(
        s"column $tsCol must be TIMESTAMP or TIMESTAMP_NTZ, got $other")
    }
    events
      .groupBy(window(ts, width, slide) +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast(
            org.apache.spark.sql.types.DecimalType(18, decimalScale)))
          .cast("double").as("total"))
      .select(unix_micros(col("window.start")).as("ws_us") +:
        unix_micros(col("window.end")).as("we_us") +:
        keyCols.map(col) :+ col("n") :+ col("total"): _*)
  }

  /** Event-type transition matrix — the first-order Markov view of
    * user journeys: for each (from_type, to_type) consecutive pair
    * within a user's timeline, the exact BIGINT count, the from-state
    * marginal, and prob = n/n_from as ONE IEEE division (bit-exact in
    * any engine). Ordering ties break on `idCol`, so the successor of
    * every event is engine-independent. The to-state of a user's last
    * event is undefined and drops.
    *
    * Shape at 100 TB: one per-user window (billions of users
    * parallelize; never a global window over events) and two
    * map-side-combined counts; the marginal re-aggregates the
    * |types|²-bounded transition table, not the events. */
  def transitionMatrix(events: DataFrame, userCol: String = "user_id",
                       tsCol: String = "ts", typeCol: String = "event_type",
                       idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col("__us"), col(idCol))
    val nxt = events
      .select(col(userCol), col(idCol), col(typeCol).as("from_type"),
        us(events, tsCol).as("__us"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
    val c = nxt.groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
    val m = c.groupBy("from_type").agg(sum(col("n")).as("n_from"))
    c.join(m, "from_type")
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        (col("n").cast("double") / col("n_from").cast("double")).as("prob"))
  }

  /** Per-group z-score outliers with DECIMAL-exact moments: per
    * `typeCol` group, n, Σx and Σx² accumulate as decimals (value
    * snapped to cents — associative, so any aggregation plan produces
    * the same sums), then μ, population σ and z = (x−μ)/σ are ONE
    * fixed IEEE expression over the exact moments — the q152 gate
    * replays every selected row and z bit-identically. Returns the
    * events with |z| > `threshold` (compared as z² > threshold², the
    * same expression both engines evaluate). A zero-variance group
    * yields ±Inf/NaN z — of the caller's degenerate group, not the
    * operator.
    *
    * Shape at 100 TB: one map-side-combined group aggregate (|types|
    * rows), broadcast back over the events — no window, no sort. */
  def zscoreOutliers(events: DataFrame, typeCol: String = "event_type",
                     valueCol: String = "value", idCol: String = "event_id",
                     threshold: Double = 3.0): DataFrame = {
    require(threshold > 0.0, "threshold must be positive")
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val stats = events
      .select(col(typeCol).as("__ty"), col(valueCol).cast(dec).as("__v"))
      .groupBy("__ty")
      .agg(count(lit(1)).as("__n"), sum(col("__v")).as("__sx"),
        sum(col("__v") * col("__v")).as("__sx2"))
      .select(col("__ty"),
        col("__n").cast("double").as("__nd"),
        col("__sx").cast("double").as("__sxd"),
        col("__sx2").cast("double").as("__sx2d"))
    val mu = col("__sxd") / col("__nd")
    val sigma = sqrt((col("__nd") * col("__sx2d") -
      col("__sxd") * col("__sxd")) / (col("__nd") * col("__nd")))
    events.join(broadcast(stats), col(typeCol) === col("__ty"))
      .withColumn("z", (col(valueCol) - mu) / sigma)
      .filter(col("z") * col("z") > threshold * threshold)
      .select(col(idCol), col(typeCol), col(valueCol), col("z"))
  }

  /** Session-concurrency sweep line over [[sessionize]] output: each
    * session contributes a start (+1) and an end (−1) boundary, and
    * the running sum ordered by (t, is_end, user, session) is the
    * number of concurrently open sessions after each boundary —
    * closed-interval convention (starts sort before ends at the same
    * instant, so a zero-duration session still counts 1 and the count
    * never dips negative). The unique ordering key makes every row
    * engine-independent.
    *
    * Shape at 100 TB: the sweep is ONE global window — but over the
    * 2·|sessions| boundary table (the same cost class as the final
    * ORDER BY of any report), never over raw events; sessionization
    * itself stays per-user partitioned. */
  /** Ordered n-grams of each key's event-type path: every window of
    * `n` consecutive events (the (us, idCol) total order) becomes one
    * (step_1, …, step_n) row, counted globally — the journey-mining
    * generalization of [[transitionMatrix]] (its n = 2 case). One
    * per-key window pass + one map-side-combined count. */
  def pathNGrams(events: DataFrame, n: Int = 3,
                 userCol: String = "user_id", tsCol: String = "ts",
                 idCol: String = "event_id",
                 typeCol: String = "event_type"): DataFrame = {
    require(n >= 2, "n must be >= 2")
    val w = Window.partitionBy(col(userCol))
      .orderBy(us(events, tsCol), col(idCol))
    val withLeads = (1 until n).foldLeft(
      events.withColumn("step_1", col(typeCol))) { (df, i) =>
        df.withColumn(s"step_${i + 1}", lead(col(typeCol), i).over(w))
      }
    withLeads.filter(col(s"step_$n").isNotNull)
      .groupBy((1 to n).map(i => col(s"step_$i")): _*)
      .agg(count(lit(1)).as("n_paths"))
  }

  /** Seasonal-baseline deviation: flag events whose value exceeds
    * `mult`× their own (key, hour-of-day) mean, with the mean
    * comparison cross-multiplied to exact integers
    * (value·n > mult·Σ) — no division, engine-independent rows.
    * Keys with fewer than `minObs` observations in the hour are
    * never flagged (no baseline to deviate from). */
  def seasonalDeviation(events: DataFrame, valueCol: String = "cents",
                        userCol: String = "user_id", tsCol: String = "ts",
                        mult: Int = 2, minObs: Int = 4): DataFrame = {
    val withHour = events.withColumn("hod", hour(col(tsCol)).cast("long"))
    val base = withHour.groupBy(col(userCol), col("hod"))
      .agg(count(lit(1)).as("n_base"), sum(col(valueCol)).as("sum_base"))
    withHour.join(base, Seq(userCol, "hod"))
      .filter(col("n_base") >= minObs &&
        col(valueCol) * col("n_base") > lit(mult) * col("sum_base"))
  }

  /** Last-touch attribution: each conversion joins the latest touch
    * event of the same key at-or-before it, within `windowUs` — the
    * marketing-attribution face of the backward [[asofJoin]] (which
    * carries the machinery: one union + one per-key window, no range
    * self-join). Conversions with no in-window touch drop. */
  def lastTouchAttribution(conversions: DataFrame, touches: DataFrame,
                           windowUs: Long, keyCol: String = "user_id",
                           tsCol: String = "ts",
                           touchIdCol: String = "event_id"): DataFrame =
    asofJoin(conversions, touches, keyCol, tsCol, touchIdCol)
      .filter(col("asof_us").isNotNull &&
        us(conversions, tsCol) - col("asof_us") <= windowUs)

  /** Burst detection: hours in which a user's event count exceeds
    * `mult`× their own lower-median hourly count (with at least
    * `minHours` active hours of baseline) — all rank selections and
    * integer comparisons, zero float. Two aggregations over the
    * (user, hour) census + one broadcast-sized median join. */
  def bursts(events: DataFrame, userCol: String = "user_id",
             tsCol: String = "ts", mult: Int = 3,
             minHours: Int = 4): DataFrame = {
    val hourly = events
      .withColumn("hour_us", (us(events, tsCol) -
        pmod(us(events, tsCol), lit(3600000000L))))
      .groupBy(col(userCol), col("hour_us"))
      .agg(count(lit(1)).as("n_events"))
    val med = Stats.lowerMedianPerKey(hourly, userCol, "n_events")
      .withColumnRenamed("median", "med_hourly")
    val nHours = hourly.groupBy(col(userCol))
      .agg(count(lit(1)).as("n_hours"))
    hourly.join(broadcast(med), userCol)
      .join(broadcast(nHours), userCol)
      .filter(col("n_hours") >= minHours &&
        col("n_events") > lit(mult) * col("med_hourly"))
  }

  /** Time-to-convert: for each key, the delay from its first `fromType`
    * event to its first `toType` event AT OR AFTER it (keys that never
    * convert drop), plus the whole-day bucket — the funnel-latency
    * distribution input. Two filtered min-aggregations + one join, all
    * integer microseconds. */
  def timeToConvert(events: DataFrame, fromType: String, toType: String,
                    userCol: String = "user_id", tsCol: String = "ts",
                    typeCol: String = "event_type"): DataFrame = {
    val usC = us(events, tsCol)
    val first = events.filter(col(typeCol) === fromType)
      .groupBy(col(userCol)).agg(min(usC).as("from_us"))
    val conv = events.filter(col(typeCol) === toType)
      .select(col(userCol), usC.as("__to"))
    first.join(conv, userCol)
      .filter(col("__to") >= col("from_us"))
      .groupBy(col(userCol), col("from_us"))
      .agg(min(col("__to")).as("to_us"))
      .withColumn("delta_us", col("to_us") - col("from_us"))
      .withColumn("day_bucket", expr("delta_us div 86400000000"))
  }

  /** SCD2 intervalization: collapse each key's event stream into
    * validity intervals of a tracked attribute — a new interval opens
    * when the attribute CHANGES from the previous event (run-length
    * encoding over time), `valid_to_us` is the next interval's start
    * (null while current). The warehouse slowly-changing-dimension
    * build, as one window pass + one groupBy. */
  def scd2Intervals(events: DataFrame, attrCol: String,
                    userCol: String = "user_id",
                    tsCol: String = "ts",
                    idCol: String = "event_id"): DataFrame = {
    val usC = us(events, tsCol)
    val w = Window.partitionBy(col(userCol)).orderBy(usC, col(idCol))
    val seg = events
      .withColumn("__us", usC)
      .withColumn("__chg",
        when(lag(col(attrCol), 1).over(w).isNull ||
          lag(col(attrCol), 1).over(w) =!= col(attrCol), 1L).otherwise(0L))
      .withColumn("__seg", sum(col("__chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = seg.groupBy(col(userCol), col("__seg"))
      .agg(min(col("__us")).as("valid_from_us"),
        max(col(attrCol)).as(attrCol), // constant within the run
        count(lit(1)).as("n_events"))
    val wNext = Window.partitionBy(col(userCol)).orderBy(col("valid_from_us"))
    runs.withColumn("valid_to_us",
        lead(col("valid_from_us"), 1).over(wNext))
      .drop("__seg")
  }

  /** Merge overlapping [start_us, end_us) intervals per key and report
    * each key's covered span count and total covered time — the
    * interval-union sweep (ad exposure, machine uptime, session
    * coverage). A span starts where an interval's start exceeds the
    * running max of all earlier ends (cummax window), so the merge is
    * one per-key window + one groupBy — no self-join, no sweep-line
    * collect. Window partitions are per-key interval counts: the same
    * skew class as sessionize, safe at scale for bounded per-key
    * activity. */
  def intervalCoverage(intervals: DataFrame, keyCol: String = "user_id",
                       startCol: String = "start_us",
                       endCol: String = "end_us"): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(endCol))
    val prevMaxEnd = max(col(endCol)).over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    val spans = intervals
      .withColumn("__new", when(prevMaxEnd.isNull ||
        col(startCol) > prevMaxEnd, 1L).otherwise(0L))
      .withColumn("__span", sum(col("__new")).over(w))
      .groupBy(col(keyCol), col("__span"))
      .agg(min(col(startCol)).as("s"), max(col(endCol)).as("e"))
    spans.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e") - col("s")).as("covered_us"))
  }

  def sessionConcurrency(events: DataFrame, userCol: String = "user_id",
                         tsCol: String = "ts",
                         gapSeconds: Long = 1800L): DataFrame = {
    val sess = sessionize(events, userCol, tsCol, gapSeconds)
    val bounds = sess.select(col(userCol), col("session_idx"),
        col("start_us").as("t"), lit(0).as("is_end"))
      .unionByName(sess.select(col(userCol), col("session_idx"),
        (col("start_us") + col("duration_us")).as("t"), lit(1).as("is_end")))
    val sweep = Window.orderBy(col("t"), col("is_end"), col(userCol),
      col("session_idx"))
    bounds.withColumn("concurrency",
      sum(when(col("is_end") === 0, 1L).otherwise(-1L)).over(sweep))
  }

  /** RFM (recency / frequency / monetary) customer scoring — the
    * classic segmentation trio as deterministic quantile buckets:
    * per user, last-event epoch micros, event count, and the
    * DECIMAL-exact spend sum (the file-header convention: decimal is
    * associative, so any aggregation plan produces the same cents),
    * then `buckets`-tile ranks over (metric, user) — the unique tie
    * key makes every rank replayable in any engine. `rfm` packs the
    * three digits (r·100 + f·10 + m). Higher bucket = more recent /
    * more frequent / higher spend.
    *
    * Shape at 100 TB: one map-side-combined per-user aggregation
    * (billions of events → |users| rows), then three window ranks over
    * the AGGREGATED table — |users|-sized sorts, the same cost class
    * as the final ORDER BY of any report, never a window over raw
    * events. */
  def rfmScores(events: DataFrame, userCol: String = "user_id",
                tsCol: String = "ts", valueCol: String = "value",
                buckets: Int = 5): DataFrame = {
    require(buckets >= 2, "buckets must be >= 2")
    val per = events
      .select(col(userCol).as("user_id"), us(events, tsCol).as("__us"),
        col(valueCol).cast(
          org.apache.spark.sql.types.DecimalType(18, 2)).as("__v"))
      .groupBy("user_id")
      .agg(max(col("__us")).as("last_us"),
        count(lit(1)).as("n_events"),
        sum(col("__v")).cast("double").as("monetary"))
    per
      .withColumn("r", ntile(buckets).over(
        Window.orderBy(col("last_us"), col("user_id"))))
      .withColumn("f", ntile(buckets).over(
        Window.orderBy(col("n_events"), col("user_id"))))
      .withColumn("m", ntile(buckets).over(
        Window.orderBy(col("monetary"), col("user_id"))))
      .withColumn("rfm", col("r") * 100 + col("f") * 10 + col("m"))
  }

  /** Temporal (time-respecting) earliest-arrival reachability: over
    * timestamped edges (src, dst, t), a path is valid only if edge
    * times never decrease, and arr(v) = the earliest time v is
    * reachable from any source — the propagation-speed primitive
    * (information/contagion spread through an interaction log; static
    * reachability over the same edges badly OVERSTATES what temporal
    * ordering permits). Relaxation: arr(v) = min over edges (u, v, t)
    * with t ≥ arr(u) of t, iterated from arr(source) = `startTime` to
    * fixpoint — monotone descent over integer times, so any engine
    * replays it exactly. Sources emit `startTime` itself; unreachable
    * nodes are absent.
    *
    * Shape at 100 TB: the [[GraphAlgos]] loop contract — the
    * timestamped edge table (pre-filtered to t ≥ startTime, the only
    * edges that can ever fire) partitions on src ONCE under AQE-off
    * capture; each round joins the |V|-sized arrival frontier and
    * min-combines map-side, with the improvement count riding the
    * round's own checkpoint via `Dataset.observe`; rounds scale with
    * the temporal hop diameter and `requireConverged` fails fast if
    * `maxRounds` was too small (never silently non-minimal). */
  def earliestArrival(edges0: DataFrame, sources: DataFrame,
      srcCol: String = "src", dstCol: String = "dst",
      timeCol: String = "t", sourceCol: String = "node",
      startTime: Long = 0L, maxRounds: Int = 16,
      requireConverged: Boolean = true): DataFrame = {
    require(maxRounds >= 1, "maxRounds must be >= 1")
    val spark = edges0.sparkSession
    val edges = Dedup.withAqeOff(spark) {
      edges0.select(col(srcCol).as("src"), col(dstCol).as("dst"),
          col(timeCol).cast("long").as("__t"))
        .filter(col("__t") >= startTime)
        .distinct()
        .repartition(col("src"))
        .localCheckpoint(true)
    }
    var arr = sources.select(col(sourceCol).as("node")).distinct()
      .withColumn("arr", lit(startTime))
      .localCheckpoint(true)
    var round = 0
    var changed = true
    while (changed && round < maxRounds) {
      val step = edges.join(arr, col("src") === col("node"))
        .filter(col("__t") >= col("arr"))
        .select(col("dst").as("node"), col("__t").as("arr"),
          lit(null).cast("long").as("old"))
      val merged = arr.withColumn("old", col("arr"))
        .unionByName(step)
        .groupBy("node")
        .agg(min(col("arr")).as("arr"), min(col("old")).as("old"))
      val obs = org.apache.spark.sql.Observation()
      val updated = merged
        .observe(obs, count(when(col("old").isNull ||
          col("arr") < col("old"), 1)).as("improved"))
        .select("node", "arr")
      val prev = arr
      arr = Exec.checkpointCut(updated)
      Exec.releaseCheckpoint(prev)
      changed = obs.get("improved").asInstanceOf[Long] > 0L
      round += 1
    }
    require(!requireConverged || !changed,
      s"earliest-arrival did not converge within $maxRounds rounds " +
        "(long temporal hop chains — raise maxRounds)")
    arr
  }

  /** Daily user-growth accounting: per UTC day, active users, users
    * seen for the FIRST time ever, returning users, and the running
    * total of distinct users — the growth census every product
    * dashboard leads with. First-seen is one min fold per user; the
    * rest is day-keyed counts + a |days|-sized cumulative window.
    * Exact integers end to end. */
  def userGrowth(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val du = events.select(col(userCol).as("u"), us(events, tsCol).as("__us"))
      .select(col("u"), expr("__us div 86400000000").as("day")).distinct()
    Exec.withPersisted(du) {
      val dau = du.groupBy("day").agg(count(lit(1)).as("dau"))
      val firstDay = du.groupBy("u").agg(min(col("day")).as("day"))
        .groupBy("day").agg(count(lit(1)).as("new_users"))
      val w = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dau.join(firstDay, Seq("day"), "left")
        .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
        .withColumn("returning_users", col("dau") - col("new_users"))
        .withColumn("cum_users", sum(col("new_users")).over(w))
    }
  }

  /** DAU/WAU stickiness: per active day, the day's distinct users, the
    * trailing-`windowDays` distinct users, and their ratio. The
    * trailing-distinct is computed by fanning each (day, user) row to
    * the `windowDays` future days it stays visible in — |du|·window
    * narrow rows, grouped with one map-side-combined distinct — never
    * a per-day rescan of history. */
  def stickiness(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    val du = events.select(col(userCol).as("u"), us(events, tsCol).as("__us"))
      .select(col("u"), expr("__us div 86400000000").as("day")).distinct()
    Exec.withPersisted(du) {
      val dau = du.groupBy("day").agg(count(lit(1)).as("dau"))
      val wau = du
        .select(col("u"), explode(sequence(col("day"),
          col("day") + (windowDays - 1))).as("day"))
        .distinct()
        .groupBy("day").agg(count(lit(1)).as("wau"))
      dau.join(wau, "day")
        .select(col("day"), col("dau"), col("wau"),
          (col("dau").cast("double") / col("wau").cast("double"))
            .as("stickiness"))
    }
  }

  /** Session entry/exit census: sessionize (the [[sessionize]] gaps
    * rule), take each session's first and last event type under the
    * (time, event id) total order, and census the (entry, exit) pairs
    * with the single-event bounce count — the landing/exit-page table.
    * One user-keyed window pass + two |sessions|-sized folds. */
  def sessionEntryExit(events: DataFrame, userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts",
      idCol: String = "event_id",
      gapSeconds: Long = 1800L): DataFrame = {
    require(gapSeconds > 0, "gap must be positive")
    val byUser = Window.partitionBy(userCol).orderBy(col("__us"))
    val sessions = events
      .select(col(userCol), col(typeCol).as("__et"),
        us(events, tsCol).as("__us"), col(idCol).as("__id"))
      .withColumn("__gap", col("__us") - lag("__us", 1).over(byUser))
      .withColumn("__new",
        when(col("__gap").isNull || col("__gap") > gapSeconds * 1000000L,
          1L).otherwise(0L))
      .withColumn("__sess", sum("__new").over(byUser))
      .groupBy(col(userCol), col("__sess"))
      .agg(min_by(col("__et"), struct(col("__us"), col("__id")))
          .as("entry_type"),
        max_by(col("__et"), struct(col("__us"), col("__id")))
          .as("exit_type"),
        count(lit(1)).as("__n"))
    sessions.groupBy("entry_type", "exit_type")
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("__n") === 1, 1L).otherwise(0L)).as("n_bounce"))
  }

  /** Kaplan–Meier survival estimate for the `fromType` → `toType`
    * conversion with right-censoring: users who emit `fromType` but
    * never convert are censored at the corpus horizon (global max
    * timestamp). One row per distinct duration with the at-risk count,
    * event/censor counts, and the product-limit survival
    * S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ).
    *
    * Numerics: counts and at-risk sets are exact integers (cumulative
    * window); the survival product is a SEQUENTIAL IEEE chain over the
    * time-ordered rows — executed as one sorted per-group scan here
    * and as a recursive CTE by the oracle, the identical op order, so
    * the doubles replay bit-for-bit (censor-only times multiply by an
    * exact 1.0 — a no-op in any engine). The ordered product does not
    * distribute; the scan runs over |distinct durations| rows (≤
    * |users|, report-sized), never raw events. */
  def kaplanMeier(events: DataFrame, fromType: String, toType: String,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    survivalTimes(events, fromType, toType, userCol, typeCol, tsCol)
      .as[(Long, Long, Long, Long)]
      .groupByKey(_ => true)
      .flatMapGroups { (_, rows) =>
        val sorted = rows.toArray.sortBy(_._1)
        var s = 1.0
        sorted.iterator.map { case (tu, n, d, c) =>
          s = s * (1.0 - d.toDouble / n.toDouble)
          (tu, n, d, c, s)
        }
      }
      .toDF("t_us", "n_risk", "n_event", "n_censor", "survival")
  }

  /** Nelson–Aalen cumulative-hazard estimate over the same censored
    * conversion census as [[kaplanMeier]]: H(t) = Σ_{tᵢ ≤ t} dᵢ/nᵢ,
    * plus the variance running sum Σ dᵢ/nᵢ². Both are SEQUENTIAL IEEE
    * chains over the time-ordered report-sized rows (the km oracle
    * convention — a recursive CTE replays the identical op order;
    * censor-only times add an exact 0.0, a no-op anywhere). */
  def nelsonAalen(events: DataFrame, fromType: String, toType: String,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    survivalTimes(events, fromType, toType, userCol, typeCol, tsCol)
      .as[(Long, Long, Long, Long)]
      .groupByKey(_ => true)
      .flatMapGroups { (_, rows) =>
        val sorted = rows.toArray.sortBy(_._1)
        var h = 0.0
        var v = 0.0
        sorted.iterator.map { case (tu, n, d, c) =>
          h = h + d.toDouble / n.toDouble
          v = v + d.toDouble / (n.toDouble * n.toDouble)
          (tu, n, d, c, h, v)
        }
      }
      .toDF("t_us", "n_risk", "n_event", "n_censor", "cum_hazard",
        "var_sum")
  }

  /** Shared censored-conversion census: one row per distinct duration
    * with (t_us, n_risk, n_event, n_censor). Risk sets are exact
    * integers via the cumulative window over the report-sized distinct
    * durations. */
  private def survivalTimes(events: DataFrame, fromType: String,
      toType: String, userCol: String, typeCol: String,
      tsCol: String): DataFrame = {
    val t = us(events, tsCol)
    val withUs = events.select(col(userCol).as("u"), col(typeCol).as("et"),
      t.as("us"))
    val horizon = withUs.agg(max(col("us")).as("__h"))
    val starts = withUs.filter(col("et") === fromType)
      .groupBy("u").agg(min(col("us")).as("from_us"))
    val convs = withUs.filter(col("et") === toType)
      .select(col("u"), col("us"))
    // the conversion condition lives INSIDE the left join: a user whose
    // only conversions precede the start must surface as censored (null
    // match), not vanish through a post-join filter
    val durations = starts.as("s")
      .join(convs.select(col("u").as("cu"), col("us").as("cus")),
        col("u") === col("cu") && col("cus") >= col("from_us"), "left")
      .groupBy("u", "from_us").agg(min(col("cus")).as("to_us"))
      .crossJoin(broadcast(horizon))
      .select(
        coalesce(col("to_us") - col("from_us"),
          col("__h") - col("from_us")).as("dur"),
        col("to_us").isNotNull.as("converted"))
    val times = durations.groupBy(col("dur").as("t_us"))
      .agg(sum(when(col("converted"), 1L).otherwise(0L)).as("n_event"),
        sum(when(!col("converted"), 1L).otherwise(0L)).as("n_censor"))
    val w = Window.orderBy(col("t_us"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.partitionBy()
    val risky = times
      .withColumn("n_risk",
        sum(col("n_event") + col("n_censor")).over(all) -
          coalesce(sum(col("n_event") + col("n_censor")).over(w), lit(0L)))
    risky
      .select(col("t_us"), col("n_risk"), col("n_event"), col("n_censor"))
  }

  /** Interval-overlap join: pairs of [start, end) intervals from two
    * sets that overlap on the same key, with the exact overlap length
    * min(e) − max(s) — shift overlap, concurrent-session attribution,
    * exposure windows. The join is key-equi + two range predicates;
    * Spark plans the equi part as the shuffle key, so the quadratic
    * term is per-key only (the q171 band-bucket decomposition composes
    * when a single key's interval count explodes). Integer
    * microseconds end to end. */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame, keyCol: String,
      startCol: String, endCol: String): DataFrame = {
    val left = a.select(col(keyCol).as("key"), col(startCol).as("s_a"),
      col(endCol).as("e_a"))
    val right = b.select(col(keyCol).as("key"), col(startCol).as("s_b"),
      col(endCol).as("e_b"))
    left.join(right, Seq("key"))
      .filter(col("s_a") < col("e_b") && col("s_b") < col("e_a"))
      .withColumn("overlap",
        least(col("e_a"), col("e_b")) - greatest(col("s_a"), col("s_b")))
  }

  /** Truncated dyadic EWMA (α = 1/2) of a per-key integral series under
    * a caller-supplied total order: the streaming decay score
    * e_t = Σ_{k<K} x_{t-k}·2^{-(k+1)} + x_{t-K+1}·2^{-(K-1)} with
    * K = min(t, `depth`) — identical to the textbook recursion while
    * t ≤ depth, windowed after. α = 1/2 is deliberate: every weight is
    * a dyadic rational, so as long as x < 2^(52-depth) the weighted sum
    * is EXACT in binary64 in any summation order — the one float
    * recipe that makes a decayed score hash-replayable across engines
    * (pow() is not correctly rounded and never appears; weights are
    * literal constants). One window over the key partition, `depth`
    * lags — no shuffle beyond the key partitioning. */
  def ewmaDyadic(df: DataFrame, keyCol: String, orderCols: Seq[String],
      valueCol: String, depth: Int = 8): DataFrame = {
    require(depth >= 2 && depth <= 32, "depth must be in [2, 32]")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    // lag k (0-based); weight 2^-(k+1), except the OLDEST available
    // term (k = K-1) which carries 2^-(K-1)... realised below by
    // adding lag(K-1) once more at its own weight: 2^-(K-1) =
    // 2·2^-K = 2^-K + 2^-K, and 2^-K is lag(K-1)'s geometric weight.
    val terms: Seq[Column] = (0 until depth).map { k =>
      val weight = math.pow(2.0, -(k + 1)) // exact: power of two
      coalesce(lag(col(valueCol), k).over(w).cast("double") * lit(weight),
        lit(0.0))
    }
    // doubling correction: for each k, if lag(k) exists but lag(k+1)
    // does not (or k = depth-1), that term is the oldest — add it again
    // at the same weight to lift 2^-(k+1) to 2^-k.
    val corrections: Seq[Column] = (0 until depth).map { k =>
      val weight = math.pow(2.0, -(k + 1))
      val isOldest =
        if (k == depth - 1) lag(col(valueCol), k).over(w).isNotNull
        else lag(col(valueCol), k).over(w).isNotNull &&
          lag(col(valueCol), k + 1).over(w).isNull
      when(isOldest, lag(col(valueCol), k).over(w).cast("double") *
        lit(weight)).otherwise(lit(0.0))
    }
    df.withColumn("ewma", (terms ++ corrections).reduce(_ + _))
  }

  /** Running distinct census: one row per (key, new distinct value)
    * milestone — the k-th distinct `distinctCol` the key has emitted,
    * stamped with the event that introduced it. Two windows on the
    * same key partitioning (first-occurrence rank, then ordinal), so
    * one shuffle; output is |keys|·|distinct values| — report-sized. */
  def runningDistinct(events: DataFrame, keyCol: String = "user_id",
      distinctCol: String = "event_type", tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    val t = us(events, tsCol)
    val firstW = Window.partitionBy(col(keyCol), col(distinctCol))
      .orderBy(t, col(tieCol))
    events
      .withColumn("__us", t)
      .withColumn("__rn", row_number().over(firstW))
      .filter(col("__rn") === 1)
      .select(col(keyCol), col(distinctCol), col("__us").as("ts_us"),
        row_number().over(
          Window.partitionBy(col(keyCol)).orderBy(col("__us"), col(tieCol)))
          .as("k_distinct"))
  }

  /** Debounce dedup: drop an event when the PREVIOUS event with the same
    * keys is within `windowSeconds` — the memoryless gap rule (an event
    * survives iff it opens a ≥window gap from its predecessor), i.e. the
    * standard repeated-ping/duplicate-webhook scrub. This is NOT the
    * stateful throttle (gap measured from the last KEPT event) — a chain
    * of sub-window gaps collapses entirely here, which is exactly the
    * duplicate-burst semantics wanted for ingest dedup; a throttle face
    * would need the sessionize chain rule instead.
    *
    * One lag window per (keys) partition — the sessionize scale argument
    * applies verbatim (hot keys → [[sessionizeChunked]]-style bucketing).
    * Deterministic: ties on the timestamp break by `tieCol`. */
  def debounce(events: DataFrame, keyCols: Seq[String], tsCol: String,
               windowSeconds: Long, tieCol: String): DataFrame = {
    require(windowSeconds > 0, "window must be positive")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__us"), col(tieCol))
    events
      .withColumn("__us", us(events, tsCol))
      .withColumn("__gap", col("__us") - lag("__us", 1).over(w))
      .filter(col("__gap").isNull || col("__gap") >= windowSeconds * 1000000L)
      .drop("__us", "__gap")
  }

  /** Total covered time of an interval set per key — the union-length
    * sweep (how long was the user/machine/resource busy, counting
    * overlaps once). One window pass: with intervals ordered by
    * (start, end, tie), each row contributes
    * max(0, end − max(start, running-max of earlier ends)) — the
    * classic line sweep as a running max, integer-exact in
    * microseconds.
    *
    * Scale: one per-key window (the [[sessionize]] shape and skew
    * caveat — a pathological key takes the chunked path upstream) plus
    * a map-side-combined sum. */
  def intervalUnionLength(df: DataFrame, keyCol: String, startCol: String,
      endCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(endCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__prevmax", max(col(endCol)).over(w))
      .withColumn("__c",
        greatest(lit(0L), col(endCol).cast("long") -
          greatest(col(startCol).cast("long"),
            coalesce(col("__prevmax").cast("long"),
              col(startCol).cast("long")))))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("__c")).as("covered_us"))
  }

  /** Top-K event-type n-grams within sessions — the path-mining census
    * ("what do users DO in a session") a product-analytics pipeline
    * reports. Sessions are the [[sessionize]] gap rule derived inline
    * (lag + running sum of session starts), n-grams are `lead` windows
    * CONFINED to the session (a lead crossing a session boundary is
    * dropped), the census is exact, and top-K breaks ties on the
    * n-gram string. Two window passes over (user)-partitioned events
    * plus one n-gram-keyed census — the sessionize scale argument plus
    * a Zipf-bounded aggregation. */
  def sessionNgrams(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String, gapSeconds: Long, n: Int,
      topK: Int): DataFrame = {
    require(n >= 2 && n <= 8, "n must be in 2..8")
    require(topK >= 1, "topK must be >= 1")
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col("__us"), col(tieCol))
    val sessioned = events
      .withColumn("__us", us(events, tsCol))
      .withColumn("__gap", col("__us") - lag("__us", 1).over(byUser))
      .withColumn("__new",
        when(col("__gap").isNull ||
          col("__gap") > gapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn("__sess", sum("__new").over(byUser))
    val bySess = Window.partitionBy(col(userCol), col("__sess"))
      .orderBy(col("__us"), col(tieCol))
    val parts = (0 until n).map(i =>
      if (i == 0) col(typeCol) else lead(col(typeCol), i).over(bySess))
    val grams = sessioned
      .withColumn("__gram", concat_ws(">", parts: _*))
      .withColumn("__last", lead(col(typeCol), n - 1).over(bySess))
      .filter(col("__last").isNotNull)
    val w = Window.orderBy(col("n").desc, col("ngram"))
    grams.groupBy(col("__gram").as("ngram"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
  }

  /** Time-weighted average (TWAP) per key: each observation's value
    * holds until the NEXT observation (LOCF weighting), so
    * twap = Σ vᵢ·(tᵢ₊₁−tᵢ) / (t_n−t_0) over the key's timeline. All
    * weights are integer microsecond durations and values integral, so
    * the numerator is an exact DECIMAL(38,0) fold and the whole result
    * is ONE double division. Keys with a single observation (zero
    * span) yield NULL. `tieCol` totals the order under equal
    * timestamps — zero-duration rows contribute nothing, but WHICH
    * value carries the following interval must be deterministic.
    *
    * Shape at 100 TB: one shuffle on the key; the lead window
    * parallelizes across keys; final agg map-side combines. */
  def timeWeightedAvg(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__us"), col(tieCol))
    events
      .withColumn("__us", us(events, tsCol))
      .withColumn("__nxt", lead(col("__us"), 1).over(w))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        (max(col("__us")) - min(col("__us"))).as("span_us"),
        sum((col("__nxt") - col("__us")).cast(d38) *
          col(valueCol).cast("long")).as("__num"))
      .select(col(keyCol), col("n"), col("span_us"),
        when(col("span_us") > 0,
          col("__num").cast("double") / col("span_us").cast("double"))
          .as("twap"))
  }

  /** Precedence-pair mining ("a happens before b"): for every ordered
    * pair of event types, the number of keys whose FIRST a precedes
    * their LAST b — the existential i<j witness condition — plus the
    * support fraction over all keys. The per-key grain is the
    * type-census (first/last timestamp per type, ≤ |types| rows per
    * key), so the pair join is k² per key, never events².
    *
    * Ties: simultaneous first-a/last-b (same microsecond) do NOT count
    * as precedence (strict <) — engine-independent without a
    * tie-break. Shape at 100 TB: one shuffle on the key for the
    * census, a key-local k²-join, one map-side-combined pair count. */
  def precedencePairs(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String): DataFrame = {
    val census = events
      .withColumn("__us", us(events, tsCol))
      .groupBy(col(keyCol).as("__k"), col(typeCol).as("__t"))
      .agg(min(col("__us")).as("__first"), max(col("__us")).as("__last"))
    Exec.withPersisted(census) {
      val total = census.select(col("__k")).distinct().count()
      census.as("a").join(census.as("b"),
          col("a.__k") === col("b.__k") &&
            col("a.__t") =!= col("b.__t") &&
            col("a.__first") < col("b.__last"))
        .groupBy(col("a.__t").as("ante"), col("b.__t").as("cons"))
        .agg(count(lit(1)).as("n"))
        .withColumn("support",
          col("n").cast("double") / lit(total).cast("double"))
    }
  }

  /** Burstiness coefficient (Goh–Barabási 2008) of each key's
    * inter-event gaps: B = (σ−μ)/(σ+μ) over the microsecond gap
    * series — B→−1 periodic, 0 Poisson, →1 bursty. Multiplying
    * through by n makes it (√(nQ−S²) − S)/(√(nQ−S²) + S) with
    * S = Σgap, Q = Σgap² exact DECIMAL(38,0): ONE sqrt + one
    * division, engine-independent. Keys with <2 gaps (≤2 events) or
    * all-zero gaps yield NULL.
    *
    * Shape at 100 TB: one key shuffle for the lag window, then a
    * map-side-combined per-key agg. */
  def burstiness(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def dbl(c: Column): Column = c.cast("double")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__us"), col(tieCol))
    val gaps = events
      .withColumn("__us", us(events, tsCol))
      .withColumn("__gap", col("__us") - lag(col("__us"), 1).over(w))
      .filter(col("__gap").isNotNull)
    gaps.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("__gap").cast(d38)).as("__s"),
        sum(col("__gap").cast(d38) * col("__gap")).as("__q"))
      .select(col(keyCol), col("n_gaps"),
        col("__s").cast("long").as("gap_sum"), {
          val disc = dbl(col("n_gaps").cast(d38) * col("__q") -
            col("__s") * col("__s"))
          when(col("n_gaps") > 1 && col("__s") > 0,
            (sqrt(disc) - dbl(col("__s"))) /
              (sqrt(disc) + dbl(col("__s")))).as("b")
        })
  }

  /** Precedence TRIPLES ("a then b then c"): for every ordered triple
    * of distinct types, the number of keys holding a witness
    * i < j < k — equivalently (pick i = argmin a, k = argmax c) some
    * b-occurrence strictly inside (first(a), last(c)). Strict
    * comparisons as [[precedencePairs]]. The middle leg joins the
    * OCCURRENCE grain (key-local), so the per-key cost is
    * |types|²·|events(key)| — never events³.
    *
    * Shape at 100 TB: census + occurrence tables share the key
    * shuffle; the triple join is key-local; the DISTINCT collapses to
    * ≤ k³ rows per key before the global count. */
  def precedenceTriples(events: DataFrame, keyCol: String,
      tsCol: String, typeCol: String): DataFrame = {
    val withUs = events.withColumn("__us", us(events, tsCol))
    val census = withUs
      .groupBy(col(keyCol).as("__k"), col(typeCol).as("__t"))
      .agg(min(col("__us")).as("__first"), max(col("__us")).as("__last"))
    val occ = withUs.select(col(keyCol).as("__k"),
      col(typeCol).as("__t"), col("__us"))
    Exec.withPersisted(census) {
      val total = census.select(col("__k")).distinct().count()
      census.as("a").join(census.as("c"),
          col("a.__k") === col("c.__k") && col("a.__t") =!= col("c.__t"))
        .join(occ.as("b"),
          col("b.__k") === col("a.__k") &&
            col("b.__t") =!= col("a.__t") &&
            col("b.__t") =!= col("c.__t") &&
            col("b.__us") > col("a.__first") &&
            col("b.__us") < col("c.__last"))
        .select(col("a.__k").as("__k"), col("a.__t").as("ante"),
          col("b.__t").as("mid"), col("c.__t").as("cons"))
        .distinct()
        .groupBy("ante", "mid", "cons")
        .agg(count(lit(1)).as("n"))
        .withColumn("support",
          col("n").cast("double") / lit(total).cast("double"))
    }
  }
}
