package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.{col, timestamp_micros}
import graft.operators.Events

class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    new Timestamp(1704067200000L + minute * 60000L) // 2024-01-01 + minutes

  test("sessionize breaks on gaps > threshold and aggregates per island") {
    val events = Seq(
      (1L, ts(0)), (1L, ts(10)), (1L, ts(20)),   // session 1: 3 events
      (1L, ts(120)), (1L, ts(125)),              // session 2 after 100-min gap
      (2L, ts(5))                                // lone event
    ).toDF("user_id", "ts")
    val got = Events.sessionize(events, gapSeconds = 1800L)
      .orderBy("user_id", "session_idx")
      .select("user_id", "session_idx", "n_events", "duration_us")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 3L, 20L * 60000000L),
      (1L, 2L, 2L, 5L * 60000000L),
      (2L, 1L, 1L, 0L)))
  }

  test("sessionize is tie-safe: equal timestamps share a session deterministically") {
    val events = Seq((1L, ts(0)), (1L, ts(0)), (1L, ts(0))).toDF("user_id", "ts")
    val got = Events.sessionize(events, gapSeconds = 60L).collect()
    assert(got.length == 1 &&
      got.head.getAs[Long]("n_events") == 3L &&
      got.head.getAs[Long]("duration_us") == 0L)
  }

  test("sessionizeChunked == sessionize: boundary-exact gaps, stitched " +
       "multi-bucket sessions, and empty buckets in between") {
    import org.apache.spark.sql.functions.timestamp_micros
    // gap 10 s, bucket 100 s — crafted boundary cases in SECONDS:
    //  user 1: [0,5] | [95,105] crosses bucket 0->1 with a gap of EXACTLY
    //  10 s (NOT a break: rule is gap > threshold), then 300 new session,
    //  then 1000 after 3 empty-ish buckets (break), 1005
    //  user 2: a session that spans three buckets [95..210]
    val secs = Seq(
      1L -> Seq(0L, 5L, 95L, 105L, 300L, 1000L, 1005L),
      2L -> (0 to 13).map(i => 95L + 9L * i), // 95..212, one unbroken run
      3L -> Seq(42L))
    val events = secs.flatMap { case (u, ts) => ts.map(t => (u, t * 1000000L)) }
      .toDF("user_id", "us")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"))
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("user_id", "session_idx", "n_events", "start_us", "duration_us")
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    val exact = canon(Events.sessionize(events, gapSeconds = 10L))
    val chunked = canon(Events.sessionizeChunked(events, gapSeconds = 10L,
      bucketSeconds = 100L))
    assert(chunked == exact)
    assert(exact.count(_._1 == 1L) == 4) // [0,5] [95,105] [300] [1000,1005]
    assert(exact.count(_._1 == 2L) == 1) // one session across 3 buckets
  }

  test("sessionizeChunked == sessionize on a hot-user corpus (the " +
       "eventskew shape) at several bucket widths") {
    import org.apache.spark.sql.functions.timestamp_micros
    // one user with 4000 events: mostly small increments, a long gap
    // every 97th event — deterministic, no RNG
    var t = 0L
    val hot = (1 to 4000).map { i =>
      t += (if (i % 97 == 0) 5000L else (i * 7) % 13 + 1)
      (77L, t * 1000000L)
    }
    val cold = (1 to 50).map(i => (100L + i, (i * 31).toLong * 1000000L))
    val events = (hot ++ cold).toDF("user_id", "us")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"))
      .repartition(8)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("user_id", "session_idx", "n_events", "start_us", "duration_us")
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    val exact = canon(Events.sessionize(events, gapSeconds = 60L))
    for (bucket <- Seq(120L, 600L, 0L)) { // 0 = the gap*256 default
      val chunked = canon(Events.sessionizeChunked(events, gapSeconds = 60L,
        bucketSeconds = bucket))
      assert(chunked == exact, s"bucketSeconds=$bucket")
    }
    assert(exact.count(_._1 == 77L) > 30) // the long gaps made real sessions
  }

  test("funnel counts strictly ordered first occurrences") {
    val events = Seq(
      (1L, ts(0), "signup"), (1L, ts(1), "view"), (1L, ts(2), "purchase"), // full
      (2L, ts(0), "signup"), (2L, ts(1), "view"),                          // 2 steps
      (3L, ts(1), "view"), (3L, ts(2), "signup"),                          // wrong order
      (4L, ts(0), "purchase")                                              // step 3 only
    ).toDF("user_id", "ts", "event_type")
    val got = Events.funnel(events, Seq("signup", "view", "purchase"))
      .orderBy("step").select("step", "n_users")
      .as[(Int, Long)].collect().toSeq
    assert(got == Seq((1, 3L), (2, 2L), (3, 1L)))
  }

  test("funnel on an empty corpus reports zero users per step") {
    val events = Seq.empty[(Long, Timestamp, String)]
      .toDF("user_id", "ts", "event_type")
    val got = Events.funnel(events, Seq("signup", "view"))
      .orderBy("step").select("n_users").as[Long].collect().toSeq
    assert(got == Seq(0L, 0L))
  }

  test("funnel requires strict inequality between first occurrences") {
    val events = Seq((1L, ts(0), "signup"), (1L, ts(0), "view"))
      .toDF("user_id", "ts", "event_type")
    val got = Events.funnel(events, Seq("signup", "view"))
      .orderBy("step").select("n_users").as[Long].collect().toSeq
    assert(got == Seq(1L, 0L))
  }

  test("asofJoin picks the latest right row at-or-before each left row") {
    val left = Seq(
      (100L, 1L, ts(10)), // matches click at ts(10) (inclusive tie)
      (101L, 1L, ts(30)), // matches click at ts(20)
      (102L, 1L, ts(1)),  // no prior click -> nulls
      (103L, 2L, ts(50))  // other user's clicks must not leak
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, ts(10), 7L), (1L, ts(20), 8L), (2L, ts(40), 9L)
    ).toDF("user_id", "ts", "click_id")
    val got = Events.asofJoin(left, right, "user_id", "ts", "click_id")
      .orderBy("event_id")
      .select(col("event_id"), col("asof_click_id"))
      .as[(Long, Option[Long])].collect().toSeq
    assert(got == Seq(
      (100L, Some(7L)), (101L, Some(8L)), (102L, None), (103L, Some(9L))))
  }

  test("asofJoin forward/nearest directions: inclusive bounds, backward " +
    "wins distance ties, one exchange for nearest") {
    val left = Seq(
      (100L, 1L, ts(10)), // fwd: tie click at ts(10); near: same
      (101L, 1L, ts(30)), // fwd: none; near: backward ts(20)
      (102L, 1L, ts(1)),  // fwd: ts(10); near: forward (no backward)
      (103L, 1L, ts(15)), // equidistant 10/20 -> nearest = backward(10)
      (104L, 2L, ts(50))  // fwd: none for user 2 -> nulls
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, ts(10), 7L), (1L, ts(20), 8L), (2L, ts(40), 9L)
    ).toDF("user_id", "ts", "click_id")
    def run(d: String) = Events.asofJoin(left, right, "user_id", "ts",
        "click_id", direction = d)
      .orderBy("event_id").select(col("event_id"), col("asof_click_id"))
      .as[(Long, Option[Long])].collect().toSeq
    assert(run("forward") == Seq((100L, Some(7L)), (101L, None),
      (102L, Some(7L)), (103L, Some(8L)), (104L, None)))
    assert(run("nearest") == Seq((100L, Some(7L)), (101L, Some(8L)),
      (102L, Some(7L)), (103L, Some(7L)), (104L, Some(9L))))
    // nearest runs BOTH windows over one hash partitioning: exactly one
    // exchange in the plan, never a second shuffle or a range join
    val plan = Events.asofJoin(left, right, "user_id", "ts", "click_id",
        direction = "nearest")
      .queryExecution.executedPlan.toString
    val exchanges = plan.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")
    assert(exchanges == 1, s"expected one exchange, got $exchanges:\n$plan")
  }

  test("funnelSequential: steps chain off the PREVIOUS completion (an " +
    "early stray view doesn't block), and the window prunes slow users") {
    val events = Seq(
      // user 1: view BEFORE signup, then view+purchase after — the
      // first-occurrence funnel rejects (t_view < t_signup); the
      // sequential form completes all 3 steps
      (1L, "view", ts(0)), (1L, "signup", ts(10)), (1L, "view", ts(20)),
      (1L, "purchase", ts(30)),
      // user 2: completes signup->view fast, purchase 3h later —
      // dropped by a 1h window at step 3
      (2L, "signup", ts(0)), (2L, "view", ts(10)), (2L, "purchase", ts(190)),
      // user 3: signup only
      (3L, "signup", ts(5))
    ).toDF("user_id", "event_type", "ts")
    val steps = Seq("signup", "view", "purchase")
    def counts(w: Option[Long]) =
      Events.funnelSequential(events, steps, windowUs = w)
        .orderBy("step").select("n_users").as[Long].collect().toSeq
    assert(counts(None) == Seq(3L, 2L, 2L))
    assert(counts(Some(3600000000L)) == Seq(3L, 2L, 1L))
    // the first-occurrence face disagrees on user 1 by design
    val firstOcc = Events.funnel(events, steps)
      .orderBy("step").select("n_users").as[Long].collect().toSeq
    assert(firstOcc == Seq(3L, 1L, 1L))
  }

  test("resampleLocf fills a fixed grid per key with the last observation " +
    "carried forward; bucket 0 before the first obs keeps nulls") {
    // hourly grid; user 1 observes at 0:30 and 2:30 — grid instants
    // 0h (pre-obs null), 1h and 2h (both carry the 0:30 obs; the 2:30
    // obs only defines the grid's END, it is after every instant)
    val obs = Seq(
      (1L, ts(30), 7L), (1L, ts(150), 8L), (2L, ts(60), 9L)
    ).toDF("user_id", "ts", "event_id")
    val hourUs = 3600000000L
    val got = Events.resampleLocf(obs, "user_id", "ts", "event_id",
        stepUs = hourUs)
      .orderBy("user_id", "grid_us")
      .select(col("user_id"), col("grid_us"), col("asof_event_id"))
      .as[(Long, Long, Option[Long])].collect().toSeq
    val base = 1704067200000000L // 2024-01-01 in epoch micros
    assert(got == Seq(
      (1L, base, None),               // grid 0h precedes the 0:30 obs
      (1L, base + hourUs, Some(7L)),  // 1h carries the 0:30 obs
      (1L, base + 2 * hourUs, Some(7L)), // 2h still carries 0:30
      (2L, base + hourUs, Some(9L)))) // single-instant grid, tie-inclusive
  }

  test("rangeJoin matches containment exactly and never plans a nested loop") {
    val points = Seq(
      (1L, 1L, 100L), (2L, 1L, 250L), (3L, 1L, 999L), (4L, 2L, 100L)
    ).toDF("pt_id", "k", "pt_us")
    val intervals = Seq(
      (10L, 1L, 100L, 200L),  // contains pt 1 (boundary-inclusive both ends)
      (11L, 1L, 200L, 300L),  // contains pt 2
      (12L, 2L, 50L, 5000L)   // long interval spanning many bins; contains pt 4
    ).toDF("iv_id", "k", "s_us", "e_us")
    val joined = Events.rangeJoin(points, intervals, "k",
      "pt_us", "s_us", "e_us", binWidthUs = 100L)
    val got = joined.select("pt_id", "iv_id")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 11L), (4L, 12L)))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    // a point on a shared boundary hits BOTH intervals, once each
    val boundary = Events.rangeJoin(
      Seq((9L, 1L, 200L)).toDF("pt_id", "k", "pt_us"), intervals, "k",
      "pt_us", "s_us", "e_us", binWidthUs = 100L)
    assert(boundary.select("iv_id").as[Long].collect().toSet == Set(10L, 11L))
  }

  test("retention buckets cohorts by first period and counts offsets") {
    def day(d: Int): Timestamp = new Timestamp(1704067200000L + d * 86400000L)
    val events = Seq(
      (1L, day(0)), (1L, day(8)), (1L, day(15)), // cohort w0, active w0/w1/w2
      (2L, day(1)), (2L, day(16)),               // cohort w0, active w0/w2
      (3L, day(9))                               // cohort w1 only
    ).toDF("user_id", "ts")
    val got = Events.retention(events, periodDays = 7)
      .orderBy("cohort", "period_offset")
      .select("period_offset", "n_users").as[(Long, Long)].collect().toSeq
    // epoch-aligned weeks: 2024-01-01 is mid-week of the epoch grid, but
    // offsets are cohort-relative so the shape below is grid-independent
    assert(got.map(_._2).sum == 6L) // six (user, week) activity cells
    assert(got.head == ((0L, 2L)))  // both w0-cohort users active at offset 0
  }

  test("hoppingWindowAgg: each event lands in width/slide epoch-aligned " +
    "windows; decimal sums are exact; non-timestamp ts rejected") {
    import org.apache.spark.sql.functions.timestamp_micros
    // two events inside the same four 1h/15min windows: 01:00 and 01:05
    val ev = Seq((3600000000L, "a", 0.1), (3900000000L, "a", 0.2))
      .toDF("us", "event_type", "value")
      .select(timestamp_micros(col("us")).as("ts"),
        col("event_type"), col("value"))
    val got = Events.hoppingWindowAgg(ev)
      .orderBy("ws_us").collect()
      .map(r => (r.getAs[Long]("ws_us"), r.getAs[Long]("we_us"),
        r.getAs[Long]("n"), r.getAs[Double]("total"))).toSeq
    // covering window indices k ∈ ((t−W)//S, t//S] = 1..4 for both
    assert(got == (1L to 4L).map(k =>
      (k * 900000000L, k * 900000000L + 3600000000L, 2L, 0.3)))
    // 0.1 + 0.2 through DECIMAL is exactly 0.3 — the double fold is not
    assert(got.head._4 == 0.3 && 0.1 + 0.2 != 0.3)
    val bad = ev.select(col("ts").cast("long").as("ts"),
      col("event_type"), col("value"))
    val e = intercept[IllegalArgumentException] {
      Events.hoppingWindowAgg(bad)
    }
    assert(e.getMessage.contains("TIMESTAMP"))
    // the window explode happens BEFORE the single aggregation
    // exchange, with a map-side partial phase — one shuffle total
    val plan = Events.hoppingWindowAgg(ev)
      .queryExecution.executedPlan.toString
    val exchanges = plan.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")
    assert(exchanges == 1, s"expected one exchange, got $exchanges:\n$plan")
    assert(plan.contains("partial_count"),
      s"window counts must map-side combine:\n$plan")
  }

  test("transitionMatrix: per-user successor counts, marginals, " +
    "one-division probabilities") {
    def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    val events = Seq(
      (1L, 1L, ts(1), "A"), (1L, 2L, ts(2), "B"), (1L, 3L, ts(3), "A"),
      (2L, 4L, ts(1), "B"), (2L, 5L, ts(2), "B")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = graft.operators.Events.transitionMatrix(events).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got == Map(
      ("A", "B") -> ((1L, 1L, 1.0)),
      ("B", "A") -> ((1L, 2L, 0.5)),
      ("B", "B") -> ((1L, 2L, 0.5))))
  }

  test("zscoreOutliers: decimal-exact population moments select " +
    "exactly the planted outlier") {
    def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    val rows = (1 to 19).map(i => (i.toLong, ts(i), "buy", 0.0)) :+
      (20L, ts(20), "buy", 100.0)
    val events = rows.toDF("event_id", "ts", "event_type", "value")
    val got = graft.operators.Events.zscoreOutliers(events).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // n=20, mu=5, var=(20*10000-10000)/400=475 -> z = 95/sqrt(475)
    val sigma = math.sqrt((20.0 * 10000.0 - 100.0 * 100.0) / 400.0)
    assert(got == Map(20L -> (100.0 - 5.0) / sigma))
  }

  test("sessionConcurrency: closed-interval sweep counts overlapping " +
    "sessions and never dips negative") {
    def ts(sec: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$sec%02d")
    // user 1: one session [0s, 10s]; user 2: zero-duration at 5s
    val events = Seq((1L, ts(0)), (1L, ts(10)), (2L, ts(5)))
      .toDF("user_id", "ts")
    val base = 1704067200000000L // 2024-01-01 00:00:00 UTC in micros
    val got = graft.operators.Events.sessionConcurrency(events)
      .orderBy("t", "is_end", "user_id", "session_idx")
      .collect()
      .map(r => (r.getLong(2) - base, r.getInt(3), r.getLong(4))).toSeq
    assert(got == Seq((0L, 0, 1L), (5000000L, 0, 2L), (5000000L, 1, 1L),
      (10000000L, 1, 0L)))
  }

  test("rfmScores: decimal-exact monetary, deterministic tiles, " +
    "packed digit") {
    def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    // users 1..4: increasing recency, frequency, and spend together
    val events = (1 to 4).flatMap { u =>
      (1 to u).map(i => (u.toLong, ts(u * 10 + i), u * 1.10))
    }.toDF("user_id", "ts", "value")
    val got = graft.operators.Events.rfmScores(events, buckets = 2)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), r.getDouble(3), r.getInt(4), r.getInt(5),
          r.getInt(6), r.getInt(7)))).toMap
    // user u: n_events = u, monetary = u * 1.10 * u (exact cents)
    assert(got(1L)._1 == 1L && got(4L)._1 == 4L)
    assert(got(2L)._2 == 2.20 * 2)
    assert(got(1L)._3 == 1 && got(1L)._4 == 1 && got(1L)._5 == 1)
    assert(got(4L)._3 == 2 && got(4L)._4 == 2 && got(4L)._5 == 2)
    assert(got(1L)._6 == 111 && got(4L)._6 == 222)
  }

  test("earliestArrival: time-respecting paths only, min wins, " +
    "unreachable absent") {
    // 1 -> 2 at t=5; 2 -> 3 at t=3 (BEFORE arrival at 2: unusable);
    // 2 -> 3 at t=7 (usable); 1 -> 4 at t=2; 9 isolated source
    val edges = Seq((1L, 2L, 5L), (2L, 3L, 3L), (2L, 3L, 7L),
      (1L, 4L, 2L)).toDF("src", "dst", "t")
    val got = Events.earliestArrival(edges, Seq(1L, 9L).toDF("node"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 9L -> 0L, 2L -> 5L, 3L -> 7L, 4L -> 2L))
  }

  test("earliestArrival: a later direct edge never beats an earlier " +
    "multi-hop chain, and vice versa - global min arrival") {
    val edges = Seq((1L, 2L, 10L), (2L, 3L, 12L), (1L, 3L, 20L))
      .toDF("src", "dst", "t")
    val got = Events.earliestArrival(edges, Seq(1L).toDF("node"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(3L) == 12L) // chain 10 -> 12 beats direct 20
    val edges2 = Seq((1L, 2L, 10L), (2L, 3L, 12L), (1L, 3L, 4L))
      .toDF("src", "dst", "t")
    val got2 = Events.earliestArrival(edges2, Seq(1L).toDF("node"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2(3L) == 4L) // direct 4 beats the chain
  }

  test("earliestArrival: startTime filters pre-start edges and " +
    "convergence fails fast when maxRounds is too small") {
    val edges = Seq((1L, 2L, 5L), (1L, 3L, 50L)).toDF("src", "dst", "t")
    val got = Events.earliestArrival(edges, Seq(1L).toDF("node"),
        startTime = 10L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 10L, 3L -> 50L)) // t=5 edge can never fire
    val chain = Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 3L))
      .toDF("src", "dst", "t")
    intercept[IllegalArgumentException] {
      Events.earliestArrival(chain, Seq(1L).toDF("node"), maxRounds = 2)
        .count()
    }
  }

  test("pathNGrams counts ordered type windows per user") {
    val ev = Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
      (2L, 1L, "a"), (2L, 2L, "b"), (2L, 3L, "a"))
      .map { case (u, m, t) => (u, ts(m.toInt), m * 10 + u, t) }
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Events.pathNGrams(ev, n = 3)
      .orderBy("step_1", "step_2", "step_3")
      .as[(String, String, String, Long)].collect().toSeq
    // user1: aba, bab; user2: aba → (a,b,a)×2, (b,a,b)×1
    assert(got === Seq(("a", "b", "a", 2L), ("b", "a", "b", 1L)))
  }

  test("seasonalDeviation flags only cross-multiplied exceedances " +
    "with enough baseline") {
    // hour 0: values 10,10,10,50 (n=4, sum=80): 50*4=200 > 2*80 ✓
    // hour 1: only 3 obs — never flagged
    val ev = Seq((1, 10L), (2, 10L), (3, 10L), (4, 50L)).map { case (m, v) =>
      (1L, ts(m), 100L + m, v) } ++
      Seq((1L, ts(70), 201L, 99L), (1L, ts(75), 202L, 1L),
        (1L, ts(80), 203L, 1L))
    val df = ev.toDF("user_id", "ts", "event_id", "cents")
    val got = Events.seasonalDeviation(df, valueCol = "cents")
      .select("event_id").as[Long].collect().toSeq
    assert(got === Seq(104L))
  }

  test("lastTouchAttribution picks the latest in-window touch") {
    val conv = Seq((1L, ts(100), 900L), (1L, ts(5000), 901L))
      .toDF("user_id", "ts", "event_id")
    val touch = Seq((1L, ts(10), 1L), (1L, ts(90), 2L), (1L, ts(200), 3L))
      .toDF("user_id", "ts", "touch_id")
    val got = Events.lastTouchAttribution(conv, touch,
      windowUs = 60L * 60000000L, touchIdCol = "touch_id")
      .select("event_id", "asof_touch_id").as[(Long, Long)].collect().toSeq
    // conv 900 at t=100: latest touch ≤ 100 within 60 min is id 2
    // conv 901 at t=5000: touch 3 at 200 is 4800 min earlier — dropped
    assert(got === Seq((900L, 2L)))
  }

  test("bursts flags hours above mult x the user's median " +
    "and needs enough baseline") {
    // user 1: hourly counts 1,1,1,6 (median 1) → the 6-event hour bursts
    // user 2: counts 1,9 but only 2 active hours — below minHours
    val ev = (Seq(0, 60, 120).map(m => (1L, ts(m))) ++
      (0 until 6).map(i => (1L, ts(180 + i))) ++
      Seq((2L, ts(0))) ++ (0 until 9).map(i => (2L, ts(60 + i))))
      .toDF("user_id", "ts")
    val got = Events.bursts(ev, mult = 3, minHours = 4)
      .select("user_id", "n_events", "med_hourly")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 6L, 1L)))
  }

  test("timeToConvert pairs first-from with first-at-or-after-to") {
    val ev = Seq((1L, ts(10), 1L, "signup"), (1L, ts(5), 2L, "purchase"),
      (1L, ts(30), 3L, "purchase"), (1L, ts(40), 4L, "purchase"),
      (2L, ts(0), 5L, "signup"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Events.timeToConvert(ev, "signup", "purchase")
      .select("user_id", "delta_us").as[(Long, Long)].collect().toSeq
    // user 1: signup at 10min, first purchase AFTER it at 30min
    assert(got === Seq((1L, 20L * 60000000L)))
  }

  test("debounce keeps an event iff it opens a >= window gap (memoryless)") {
    val ev = Seq(
      (1L, ts(0), 10L), (1L, ts(1), 11L), (1L, ts(2), 12L), // chain collapses
      (1L, ts(30), 13L),                                    // fresh gap: kept
      (2L, ts(0), 20L)                                      // other key: kept
    ).toDF("user_id", "ts", "event_id")
    val got = Events.debounce(ev, Seq("user_id"), "ts",
        windowSeconds = 120L, tieCol = "event_id")
      .orderBy("event_id").select("event_id").as[Long].collect().toSeq
    // the 3-event burst keeps only its head: t=1 and t=2 both sit within
    // 2 min of their PREDECESSOR (not of the last kept event)
    assert(got === Seq(10L, 13L, 20L))
  }

  test("debounce breaks timestamp ties by the tie column") {
    val ev = Seq((1L, ts(0), 5L), (1L, ts(0), 3L)).toDF("user_id", "ts", "id")
    val got = Events.debounce(ev, Seq("user_id"), "ts", 60L, "id")
      .select("id").as[Long].collect().toSeq
    assert(got === Seq(3L)) // lower tie id wins; duplicate dropped
  }

  test("scd2Intervals run-length-encodes attribute changes") {
    val ev = Seq((1L, ts(0), 1L, "x"), (1L, ts(10), 2L, "x"),
      (1L, ts(20), 3L, "y"), (1L, ts(30), 4L, "x"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Events.scd2Intervals(ev, "event_type")
      .orderBy("valid_from_us")
      .select("event_type", "valid_from_us", "valid_to_us", "n_events")
      .as[(String, Long, Option[Long], Long)].collect().toSeq
    val m = 60000000L
    val base = 1704067200000000L // the ts() helper's 2024-01-01 epoch
    assert(got === Seq(
      ("x", base, Some(base + 20 * m), 2L),
      ("y", base + 20 * m, Some(base + 30 * m), 1L),
      ("x", base + 30 * m, None, 1L)))
  }

  test("intervalCoverage merges overlapping and touching intervals") {
    // user 1: [0,10) ∪ [5,15) ∪ [15,20) merge to [0,20); [30,40) apart
    val df = Seq((1L, 0L, 10L), (1L, 5L, 15L), (1L, 15L, 20L),
      (1L, 30L, 40L), (2L, 100L, 101L)).toDF("user_id", "s", "e")
    val got = Events.intervalCoverage(df, "user_id", "s", "e")
      .orderBy("user_id").as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 30L), (2L, 1L, 1L)))
  }

  test("intervalCoverage: a contained interval never extends its span") {
    val df = Seq((1L, 0L, 100L), (1L, 10L, 20L)).toDF("u", "s", "e")
    val got = Events.intervalCoverage(df, "u", "s", "e")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L, 100L)))
  }

  test("userGrowth: new vs returning split and running total") {
    import org.apache.spark.sql.functions.timestamp_micros
    val d = 86400000000L
    val df = Seq((1L, 0L), (1L, d), (2L, d + 5L))
      .toDF("user_id", "us")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"))
    val got = Events.userGrowth(df).orderBy("day")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((0L, 1L, 1L, 0L, 1L), (1L, 2L, 1L, 1L, 2L)))
  }

  test("stickiness: trailing-window distinct via fan-out") {
    import org.apache.spark.sql.functions.timestamp_micros
    val d = 86400000000L
    val df = Seq((1L, 0L), (3L, 1L), (1L, d), (2L, d + 5L))
      .toDF("user_id", "us")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"))
    val got = Events.stickiness(df).orderBy("day")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // day 0: dau {1,3}, wau {1,3}; day 1: dau {1,2}, wau {1,2,3}
    assert(got === Seq((0L, 2L, 2L, 1.0), (1L, 2L, 3L, 2.0 / 3.0)))
  }

  test("sessionEntryExit: landing/exit pairs with bounce counting") {
    import org.apache.spark.sql.functions.timestamp_micros
    val m = 60000000L
    val df = Seq(
      (1L, "view", 0L, 1L), (1L, "click", 10 * m, 2L),
      (1L, "purchase", 60 * m, 3L))
      .toDF("user_id", "event_type", "us", "event_id")
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"), col("event_id"))
    val got = Events.sessionEntryExit(df)
      .orderBy("entry_type", "exit_type")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got === Seq(("purchase", "purchase", 1L, 1L),
      ("view", "click", 1L, 0L)))
  }

  test("kaplanMeier: product-limit chain with horizon censoring") {
    import org.apache.spark.sql.functions.timestamp_micros
    // 4 signups at t=0; conversions at 10, 10, 20; user 4 censored at
    // the horizon (20)
    val rows = Seq(
      (1L, "signup", 0L), (2L, "signup", 0L), (3L, "signup", 0L),
      (4L, "signup", 0L),
      (1L, "purchase", 10L), (2L, "purchase", 10L), (3L, "purchase", 20L))
    val df = rows.toDF("user_id", "event_type", "us")
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"))
    val got = Events.kaplanMeier(df, "signup", "purchase")
      .orderBy("t_us")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq((10L, 4L, 2L, 0L, 0.5), (20L, 2L, 1L, 1L, 0.25)))
  }

  test("kaplanMeier censors users whose conversions precede signup") {
    import org.apache.spark.sql.functions.timestamp_micros
    val rows = Seq((1L, "purchase", 5L), (1L, "signup", 10L),
      (2L, "signup", 10L), (2L, "purchase", 30L))
    val df = rows.toDF("user_id", "event_type", "us")
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"))
    val got = Events.kaplanMeier(df, "signup", "purchase")
      .orderBy("t_us")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    // both durations are 20: user 2 converts, user 1 is censored at
    // the horizon (30) — it must NOT vanish
    assert(got === Seq((20L, 2L, 1L, 1L, 0.5)))
  }

  test("kaplanMeier: an all-censored cohort keeps survival at 1.0") {
    import org.apache.spark.sql.functions.timestamp_micros
    val rows = Seq((1L, "signup", 0L), (2L, "signup", 5L),
      (3L, "click", 20L)) // no purchases at all; horizon = 20
    val df = rows.toDF("user_id", "event_type", "us")
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"))
    val got = Events.kaplanMeier(df, "signup", "purchase")
      .orderBy("t_us")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    // censor times 20 and 15; d = 0 everywhere → survival stays 1.0
    assert(got === Seq((15L, 2L, 0L, 1L, 1.0), (20L, 1L, 0L, 1L, 1.0)))
  }

  test("intervalOverlapJoin: overlap length exact, touching excluded") {
    val a = Seq((1L, 0L, 100L), (1L, 200L, 300L), (2L, 0L, 10L))
      .toDF("u", "s", "e")
    val b = Seq((1L, 50L, 120L), (1L, 300L, 400L), (2L, 50L, 60L))
      .toDF("u", "s", "e")
    val got = Events.intervalOverlapJoin(a, b, "u", "s", "e")
      .select("key", "s_a", "s_b", "overlap")
      .as[(Long, Long, Long, Long)].collect().toSet
    // [0,100)∩[50,120) = 50; [200,300) touches [300,400): excluded;
    // key 2 disjoint
    assert(got === Set((1L, 0L, 50L, 50L)))
  }

  test("ewmaDyadic matches the α=1/2 recursion while t <= depth") {
    // e1 = 1, e2 = (2+1)/2 = 1.5, e3 = (3+1.5)/2 = 2.25
    val df = Seq((1L, 1L, 1L), (1L, 2L, 2L), (1L, 3L, 3L))
      .toDF("u", "ord", "n")
    val got = Events.ewmaDyadic(df, "u", Seq("ord"), "n", depth = 8)
      .orderBy("ord").as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.map(_._4) === Seq(1.0, 1.5, 2.25))
  }

  test("ewmaDyadic truncation doubles the oldest in-window weight") {
    // depth 2, series 1,2,3: e3 = 3/2 + 2/2 = 2.5 (the 1 fell out)
    val df = Seq((1L, 1L, 1L), (1L, 2L, 2L), (1L, 3L, 3L))
      .toDF("u", "ord", "n")
    val got = Events.ewmaDyadic(df, "u", Seq("ord"), "n", depth = 2)
      .orderBy("ord").as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.map(_._4) === Seq(1.0, 1.5, 2.5))
  }

  test("runningDistinct emits one ordered milestone per new value") {
    import org.apache.spark.sql.functions.timestamp_micros
    val df = Seq(
      (1L, "a", 100L, 1L), (1L, "a", 200L, 2L), (1L, "b", 300L, 3L),
      (2L, "b", 50L, 4L))
      .toDF("user_id", "event_type", "us", "event_id")
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"), col("event_id"))
    val got = Events.runningDistinct(df)
      .orderBy("user_id", "k_distinct")
      .as[(Long, String, Long, Int)].collect().toSeq
    assert(got === Seq((1L, "a", 100L, 1), (1L, "b", 300L, 2),
      (2L, "b", 50L, 1)))
  }

  test("intervalUnionLength merges overlaps, bridges touching, skips gaps") {
    val iv = Seq(
      (1L, 0L, 10L, 1L), (1L, 5L, 20L, 2L),   // overlap -> 20
      (1L, 20L, 25L, 3L),                      // touching -> +5
      (1L, 40L, 50L, 4L),                      // gap -> +10
      (2L, 0L, 100L, 5L), (2L, 10L, 20L, 6L))  // contained -> 100
      .toDF("k", "s0", "e0", "id")
    val got = graft.operators.Events
      .intervalUnionLength(iv, "k", "s0", "e0", "id")
      .orderBy("k").as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 4L, 35L), (2L, 2L, 100L)))
  }

  test("sessionNgrams confines grams to sessions and ranks exactly") {
    // user 1: A B C then a >30min gap then A B C; user 2: A B
    val base = 1000000000L
    val ev = Seq(
      (1L, base, 1L, "A"), (1L, base + 1000000L, 2L, "B"),
      (1L, base + 2000000L, 3L, "C"),
      (1L, base + 4000000000L, 4L, "A"),
      (1L, base + 4001000000L, 5L, "B"),
      (1L, base + 4002000000L, 6L, "C"),
      (2L, base, 7L, "A"), (2L, base + 1000000L, 8L, "B"))
      .toDF("user_id", "us", "event_id", "event_type")
      .withColumn("ts", timestamp_micros(col("us")))
    val got = graft.operators.Events.sessionNgrams(ev, "user_id", "ts",
        "event_id", "event_type", gapSeconds = 1800L, n = 2, topK = 10)
      .orderBy("rank").as[(String, Long, Int)].collect().toSeq
    // A>B appears in 3 sessions; B>C in 2; the cross-gap C>A must NOT
    assert(got === Seq(("A>B", 3L, 1), ("B>C", 2L, 2)))
  }

  test("timeWeightedAvg holds values LOCF; single-event keys are NULL") {
    // user 1: v=10 for 10us, v=30 for 30us → (100+900)/40 = 25
    val ev = Seq(
      (1L, 0L, 1L, 10L), (1L, 10L, 2L, 30L), (1L, 40L, 3L, 99L),
      (2L, 5L, 4L, 7L))
      .toDF("user_id", "us", "event_id", "v")
      .withColumn("ts", timestamp_micros(col("us")))
    val got = Events.timeWeightedAvg(ev, "user_id", "ts", "event_id", "v")
      .orderBy("user_id").collect()
    assert((got(0).getLong(0), got(0).getLong(1), got(0).getLong(2),
      got(0).getDouble(3)) === ((1L, 3L, 40L, 25.0)))
    assert(got(1).getLong(2) === 0L && got(1).isNullAt(3))
  }

  test("timeWeightedAvg tie-breaks equal timestamps by the tie column") {
    // two events at t=0: the LATER tie (id 2, v=100) carries the 10us
    val ev = Seq((1L, 0L, 1L, 0L), (1L, 0L, 2L, 100L), (1L, 10L, 3L, 0L))
      .toDF("user_id", "us", "event_id", "v")
      .withColumn("ts", timestamp_micros(col("us")))
    val got = Events.timeWeightedAvg(ev, "user_id", "ts", "event_id", "v")
      .select("twap").as[Double].collect().head
    assert(got === 100.0)
  }

  test("timeWeightedAvg plans one key shuffle; precedence joins are " +
    "key-equi, never nested-loop") {
    val ev = Seq((1L, 0L, 1L, 10L))
      .toDF("user_id", "us", "event_id", "v")
      .withColumn("ts", timestamp_micros(col("us")))
    val twapPlan = Events.timeWeightedAvg(ev, "user_id", "ts",
      "event_id", "v").queryExecution.executedPlan.toString
    // the window partitioning is reused by the groupBy: one Exchange
    assert("Exchange".r.findAllIn(twapPlan).size <= 2, twapPlan)
    val pev = Seq((1L, 0L, "A"), (1L, 5L, "B"))
      .toDF("user_id", "us", "event_type")
      .withColumn("ts", timestamp_micros(col("us")))
    for (plan <- Seq(
      Events.precedencePairs(pev, "user_id", "ts", "event_type")
        .queryExecution.executedPlan.toString,
      Events.precedenceTriples(pev, "user_id", "ts", "event_type")
        .queryExecution.executedPlan.toString)) {
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoop"), plan)
    }
  }

  test("burstiness: periodic gaps give -1, one gap gives NULL") {
    val ev = Seq((1L, 0L, 1L), (1L, 10L, 2L), (1L, 20L, 3L),
      (2L, 0L, 4L), (2L, 0L, 5L), (2L, 30L, 6L),
      (3L, 0L, 7L), (3L, 5L, 8L))
      .toDF("user_id", "us", "event_id")
      .withColumn("ts", timestamp_micros(col("us")))
    val got = Events.burstiness(ev, "user_id", "ts", "event_id")
      .orderBy("user_id").collect()
    assert(got(0).getDouble(3) === -1.0)              // gaps 10,10
    assert(got(1).getDouble(3) === 0.0)               // gaps 0,30
    assert(got(2).isNullAt(3))                        // single gap
  }

  test("nelsonAalen accumulates d/n and d/n^2 over the KM census") {
    // u1 converts at 10, u2 at 20, u3 censored at the horizon (20)
    val ev = Seq((1L, 0L, "s"), (1L, 10L, "p"),
      (2L, 0L, "s"), (2L, 20L, "p"), (3L, 0L, "s"))
      .toDF("user_id", "us", "event_type")
      .withColumn("ts", timestamp_micros(col("us")))
    val got = Events.nelsonAalen(ev, "s", "p")
      .orderBy("t_us").as[(Long, Long, Long, Long, Double, Double)]
      .collect().toSeq
    assert(got === Seq(
      (10L, 3L, 1L, 0L, 1.0 / 3, 1.0 / 9),
      (20L, 2L, 1L, 1L, 1.0 / 3 + 1.0 / 2, 1.0 / 9 + 1.0 / 4)))
  }

  test("precedenceTriples: strict in-between witness, support over keys") {
    // user 1: A@0 B@5 C@10 → only (A,B,C); user 2 all simultaneous
    val ev = Seq((1L, 0L, "A"), (1L, 5L, "B"), (1L, 10L, "C"),
      (2L, 0L, "A"), (2L, 0L, "B"), (2L, 0L, "C"))
      .toDF("user_id", "us", "event_type")
      .withColumn("ts", timestamp_micros(col("us")))
    val got = Events.precedenceTriples(ev, "user_id", "ts", "event_type")
      .as[(String, String, String, Long, Double)].collect().toSeq
    assert(got === Seq(("A", "B", "C", 1L, 0.5)))
  }

  test("precedencePairs: strict first-before-last witnesses, support") {
    // user 1: A@0 B@5 A@10 → A<B (0<5), B<A (5<10); user 2: only B A
    // with A@0 B@0 (simultaneous → neither direction counts)
    val ev = Seq((1L, 0L, "A"), (1L, 5L, "B"), (1L, 10L, "A"),
      (2L, 0L, "A"), (2L, 0L, "B"))
      .toDF("user_id", "us", "event_type")
      .withColumn("ts", timestamp_micros(col("us")))
    val got = Events.precedencePairs(ev, "user_id", "ts", "event_type")
      .orderBy("ante", "cons").as[(String, String, Long, Double)]
      .collect().toSeq
    assert(got === Seq(("A", "B", 1L, 0.5), ("B", "A", 1L, 0.5)))
  }
}
