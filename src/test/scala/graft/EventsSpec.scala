package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Events

class EventsSpec extends SparkTestBase {

  test("q_range_join matches a driver-side brute-force inequality scan") {
    val got = Events.qRangeJoin(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("win_id"), r.getAs[Long]("n_purchases"),
        Option(r.getAs[Any]("purchase_value"))))
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id"), unix_timestamp(col("ts")).as("s"),
        col("event_type"), col("value")).collect()
    val wins = ev.filter(r => r.getAs[String]("event_type") == "error" &&
      r.getAs[Double]("value") >= 15.0)
      .map(r => (r.getAs[Long]("event_id"),
        r.getAs[Long]("s") - 300, r.getAs[Long]("s") + 300))
    val pts = ev.filter(_.getAs[String]("event_type") == "purchase")
      .map(r => (r.getAs[Long]("s"), r.getAs[Double]("value")))
    val want = wins.map { case (id, lo, hi) =>
      val in = pts.filter(p => p._1 >= lo && p._1 <= hi)
      (id, in.length.toLong,
        if (in.isEmpty) None
        else Some(in.map(p => BigDecimal(p._2).setScale(2)).sum.toDouble))
    }.sortBy(_._1)
    assert(got.length == want.length) // zero-match windows are retained
    got.zip(want).foreach { case ((gi, gn, gv), (wi, wn, wv)) =>
      assert(gi == wi && gn == wn)
      assert(gv.map(_.asInstanceOf[Double]) == wv)
    }
    assert(want.exists(_._2 == 0L)) // the fixture really has empty windows
    assert(want.exists(_._2 > 0L))
  }

  test("rangeJoinPairs emits boundary pairs exactly once across bin edges") {
    import spark.implicits._
    // windows straddling bin boundaries (binW=10) + points ON the
    // lo/hi bounds and just outside them
    val wins = Seq((1L, 8L, 18L), (2L, 10L, 20L), (3L, 25L, 27L))
      .toDF("win_id", "lo", "hi")
    val pts = Seq(8L, 9L, 10L, 18L, 19L, 20L, 21L, 24L, 25L, 27L, 28L)
      .toDF("p_ts")
    val got = Events.rangeJoinPairs(wins, pts, 10L)
      .select("win_id", "p_ts").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = for {
      (id, lo, hi) <- Seq((1L, 8L, 18L), (2L, 10L, 20L), (3L, 25L, 27L))
      p <- Seq(8L, 9L, 10L, 18L, 19L, 20L, 21L, 24L, 25L, 27L, 28L)
      if p >= lo && p <= hi
    } yield (id, p)
    assert(got.sorted.toSeq == want.sorted) // no misses, no double-emits
    assert(got.length == got.distinct.length)
  }

  test("q_range_join plans as an equi hash join, not a nested loop") {
    val p = Events.qRangeJoin(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"range join fell back to an all-pairs plan:\n${p.take(2000)}")
  }

  test("q_funnel matches a driver-side staged-min recompute") {
    val got = Events.qFunnel(spark, sfDir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((Option(r.getAs[Timestamp]("view_ts")),
          Option(r.getAs[Timestamp]("click_ts")),
          Option(r.getAs[Timestamp]("purchase_ts")),
          r.getAs[Int]("stage")))).toMap
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_type").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("ts"),
        r.getAs[String]("event_type")))
      .filter(e => Set("view", "click", "purchase")(e._3))
    val want = ev.groupBy(_._1).map { case (u, es) =>
      val v = es.filter(_._3 == "view").map(_._2).sortBy(_.getTime)
        .headOption
      val c = v.flatMap(vt => es.filter(e => e._3 == "click" &&
        !e._2.before(vt)).map(_._2).sortBy(_.getTime).headOption)
      val p = c.flatMap(ct => es.filter(e => e._3 == "purchase" &&
        !e._2.before(ct)).map(_._2).sortBy(_.getTime).headOption)
      val stage = if (p.isDefined) 3 else if (c.isDefined) 2
        else if (v.isDefined) 1 else 0
      u -> ((v, c, p, stage))
    }
    assert(got == want)
    // every user with any funnel event appears exactly once, staged 0-3
    // (stage DIVERSITY is pinned on the planted fixture below — at
    // sf0.001 every user has a month of events and converts fully)
    assert(got.nonEmpty && got.values.forall(v => v._4 >= 0 && v._4 <= 3))
  }

  test("q_funnel stage bounds are >= (equal-timestamp events qualify)") {
    import spark.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val ev = Seq(
      // user 1: click at the SAME instant as the first view counts,
      // purchase at the same instant as that click counts
      (1L, t0, "view"), (1L, t0, "click"), (1L, t0, "purchase"),
      // user 2: click strictly BEFORE the first view does not count
      (2L, new Timestamp(t0.getTime - 1000), "click"), (2L, t0, "view"),
      // user 3: purchase before the qualified click does not count
      (3L, t0, "view"), (3L, new Timestamp(t0.getTime + 1000), "purchase"),
      (3L, new Timestamp(t0.getTime + 2000), "click"))
      .toDF("user_id", "ts", "event_type")
    withEventsFixture(ev) { dir =>
      val got = Events.qFunnel(spark, dir).collect()
        .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("stage")).toMap
      assert(got == Map(1L -> 3, 2L -> 1, 3L -> 2))
    }
  }

  test("q_retention matches a driver-side cohort recompute") {
    val got = Events.qRetention(spark, sfDir).collect()
      .map(r => (r.getAs[java.sql.Date]("cohort").toString,
        r.getAs[Long]("day_offset")) -> r.getAs[Long]("n_users")).toMap
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Date]("day")))
    val cohort = ev.groupBy(_._1)
      .map { case (u, ds) => u -> ds.map(_._2.toLocalDate).min(
        Ordering.by((d: java.time.LocalDate) => d.toEpochDay)) }
    val want = ev.map { case (u, d) =>
      val c = cohort(u)
      ((c.toString, d.toLocalDate.toEpochDay - c.toEpochDay), u)
    }.distinct.groupBy(_._1).map { case (k, us) => k -> us.length.toLong }
    assert(got == want)
    // offset-0 cell of each cohort counts the whole cohort
    val sizes = cohort.groupBy(_._2).map { case (c, us) =>
      c.toString -> us.size.toLong }
    sizes.foreach { case (c, n) => assert(got((c, 0L)) == n) }
  }

  test("q_funnel runs on a single user-keyed shuffle") {
    val p = Events.qFunnel(spark, sfDir).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(p.replace("ReusedExchange", "reused")).length
    assert(exchanges == 1, s"expected one user shuffle:\n${p.take(2000)}")
  }

  test("q_gap_fill densifies every hour of the span for every type") {
    val rows = Events.qGapFill(spark, sfDir).collect()
      .map(r => (r.getAs[Timestamp]("hour"), r.getAs[String]("event_type"),
        r.getAs[Long]("n"), Option(r.getAs[Any]("delta"))))
    val types = rows.map(_._2).distinct.sorted
    val hours = rows.map(_._1).distinct.sorted(
      Ordering.by((t: Timestamp) => t.getTime))
    // the grid is complete: |rows| = |hours| x |types|, hours contiguous
    assert(rows.length == hours.length * types.length)
    hours.sliding(2).foreach { case Array(a, b) =>
      assert(b.getTime - a.getTime == 3600 * 1000L)
    case _ => ()
    }
    // zero cells exist (densification is real on this fixture) and
    // totals conserve the event count
    assert(rows.exists(_._3 == 0L))
    assert(rows.map(_._3).sum ==
      graft.sources.Tables.events(spark, sfDir).count())
    // delta is n - previous n within the type, null on each type's
    // first hour
    types.foreach { t =>
      val series = rows.filter(_._2 == t).sortBy(_._1.getTime)
      assert(series.head._4.isEmpty)
      series.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._4.contains(b._3 - a._3), s"$t delta drift")
        case _ => ()
      }
    }
  }

  test("q_click_attribution matches a driver-side lookback scan") {
    val got = Events.qClickAttribution(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("click_id")))
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select("event_id", "user_id", "ts", "event_type").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("ts"), r.getAs[String]("event_type")))
    val clicks = ev.filter(_._4 == "click")
    val want = for {
      (pid, pu, pts, _) <- ev.filter(_._4 == "purchase")
      (cid, cu, cts, _) <- clicks
      if cu == pu && !pts.before(cts) &&
        pts.getTime <= cts.getTime + 10 * 60 * 1000
    } yield (pid, cid)
    assert(got.sorted.toSeq == want.sorted.toSeq)
    assert(got.nonEmpty)
  }

  test("attributionStream equals the batch core across micro-batches") {
    import spark.implicits._
    def ts(m: Int) = new Timestamp(
      Timestamp.valueOf("2024-01-01 10:00:00").getTime + m * 60000L)
    val clicks = Seq(Ev(1, ts(0), 1, "click"), Ev(2, ts(5), 1, "click"),
      Ev(3, ts(0), 2, "click"), Ev(4, ts(40), 2, "click"))
    val buys = Seq(Ev(10, ts(8), 1, "purchase"),   // matches clicks 1,2
      Ev(11, ts(11), 1, "purchase"),               // matches click 2 only
      Ev(12, ts(45), 2, "purchase"),               // matches click 4 only
      Ev(13, ts(30), 3, "purchase"))               // no clicks at all
    val cIn = MemoryStream[Ev](spark)
    val pIn = MemoryStream[Ev](spark)
    val q = graft.streaming.Streams
      .attributionStream(cIn.toDF().withColumn("value", lit(1.0)),
        pIn.toDF().withColumn("value", lit(1.0)))
      .writeStream.format("memory").queryName("attrib_test")
      .outputMode("append").start()
    try {
      // split across triggers: the join must buffer clicks in state
      cIn.addData(clicks.take(2)); q.processAllAvailable()
      pIn.addData(buys.take(2)); q.processAllAvailable()
      cIn.addData(clicks.drop(2)); pIn.addData(buys.drop(2))
      q.processAllAvailable()
      val got = spark.table("attrib_test")
        .select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val batch = Events.clickAttribution(
        clicks.toDF().withColumn("value", lit(1.0)),
        buys.toDF().withColumn("value", lit(1.0)))
        .select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == batch)
      assert(got == Seq((10L, 1L), (10L, 2L), (11L, 2L), (12L, 4L)))
    } finally q.stop()
  }

  test("funnelStateful finalizes out-of-order stages behind the watermark") {
    import spark.implicits._
    import graft.streaming.FunnelEvent
    def t(s: String) = Timestamp.valueOf(s)
    val input = MemoryStream[FunnelEvent](spark)
    val q = graft.streaming.Streams.funnelStateful(input.toDS())
      .writeStream.format("memory").queryName("funnel_stateful")
      .outputMode("append").start()
    try {
      // trigger 1: the click ARRIVES first though its event time is
      // after the view's — a naive incremental fold would discard it
      input.addData(FunnelEvent(1, t("2024-01-01 10:05:00"), "click"))
      q.processAllAvailable()
      // trigger 2: the earlier view and the completing purchase, plus
      // a view-less purchase for user 2; watermark still behind all
      input.addData(FunnelEvent(1, t("2024-01-01 10:00:00"), "view"),
        FunnelEvent(1, t("2024-01-01 10:07:00"), "purchase"),
        FunnelEvent(2, t("2024-01-01 10:30:00"), "purchase"))
      q.processAllAvailable()
      assert(spark.table("funnel_stateful").count() == 0)
      // two watermark pushers: the first advances the watermark past
      // every buffered event at its END, the second's trigger then
      // finalizes and emits
      input.addData(FunnelEvent(99, t("2024-01-01 13:00:00"), "view"))
      q.processAllAvailable()
      input.addData(FunnelEvent(98, t("2024-01-01 13:30:00"), "view"))
      q.processAllAvailable()
      val got = spark.table("funnel_stateful").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("stage"),
          r.getAs[Timestamp]("at").toString)).sortBy(x => (x._1, x._2))
      // user 1 walks all three stages in EVENT-time order; user 2's
      // view-less purchase finalizes silently (stage 0, the batch
      // dual's answer); the pushers are still in-watermark
      assert(got.toSeq == Seq(
        (1L, 1, "2024-01-01 10:00:00.0"),
        (1L, 2, "2024-01-01 10:05:00.0"),
        (1L, 3, "2024-01-01 10:07:00.0")))
    } finally q.stop()
  }

  test("funnelStateful equals the batch funnel on randomized arrivals") {
    import spark.implicits._
    import graft.streaming.FunnelEvent
    val rnd = new scala.util.Random(421)
    val types = Array("view", "click", "purchase")
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val evs = (1 to 120).map { i =>
      FunnelEvent(rnd.nextInt(20).toLong,
        new Timestamp(base + rnd.nextInt(6 * 3600) * 1000L),
        types(rnd.nextInt(3)))
    }
    val arrival = rnd.shuffle(evs)
    val input = MemoryStream[FunnelEvent](spark)
    // delay must cover the full 6 h disorder span: the shuffled arrival
    // order delivers events arbitrarily late, and Spark's stateful
    // late-row filter drops anything behind the watermark on arrival —
    // the batch-equality contract is "disorder bounded by delay"
    val q = graft.streaming.Streams.funnelStateful(input.toDS(), "6 hours")
      .writeStream.format("memory").queryName("funnel_rand")
      .outputMode("append").start()
    try {
      arrival.grouped(17).foreach { batch =>
        input.addData(batch); q.processAllAvailable()
      }
      // push the watermark past every event, then trigger the drain
      val push = new Timestamp(base + 12 * 3600 * 1000L)
      input.addData(FunnelEvent(900, push, "view")); q.processAllAvailable()
      input.addData(FunnelEvent(901, push, "view")); q.processAllAvailable()
      val gotStages = spark.table("funnel_rand").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("stage")))
        .filter(_._1 < 900)
        .groupBy(_._1).map { case (u, ss) => u -> ss.map(_._2).max }
      val want = graft.operators.Events.funnelStages(
        evs.toDF("user_id", "ts", "event_type")).collect()
        .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("stage"))
        .filter(_._2 > 0).toMap // stage-0 users emit no transitions
      assert(gotStages == want)
    } finally q.stop()
  }

  test("events operators degrade gracefully on edge-case fixtures") {
    import spark.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 00:30:00")
    // no funnel event types at all: funnel is empty, retention and
    // gap fill still cover the signup-only stream
    val signupOnly = Seq((1L, t0, "signup"), (2L, t0, "signup"))
      .toDF("user_id", "ts", "event_type")
    withEventsFixture(signupOnly) { dir =>
      assert(Events.qFunnel(spark, dir).count() == 0)
      val ret = Events.qRetention(spark, dir).collect()
      assert(ret.map(_.getAs[Long]("n_users")).sum == 2)
      // single-hour span: the grid is exactly one row per type, all
      // deltas null
      val gf = Events.qGapFill(spark, dir).collect()
      assert(gf.length == 1 && gf.head.getAs[Long]("n") == 2
        && gf.head.isNullAt(3))
      // no windows and no points: zero rows, no failure
      assert(Events.qRangeJoin(spark, dir).count() == 0)
      assert(Events.qClickAttribution(spark, dir).count() == 0)
    }
    // a lone user whose only activity is one purchase: stage 0 (no
    // view), one session, cohort offset 0
    val loner = Seq((7L, t0, "purchase")).toDF("user_id", "ts", "event_type")
    withEventsFixture(loner) { dir =>
      val f = Events.qFunnel(spark, dir).collect()
      assert(f.length == 1 && f.head.getAs[Int]("stage") == 0)
      val ep = graft.operators.Pipelines.qPipelineEngagement(spark, dir)
        .collect()
      assert(ep.length == 1 &&
        ep.head.getAs[Int]("stage") == 0 &&
        ep.head.getAs[Long]("n_sessions") == 1L &&
        ep.head.getAs[Long]("active_days") == 1L)
    }
  }

  test("q_scd2_dim rebuilds each user's exact status timeline") {
    val got = Events.qScd2Dim(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("version"),
        r.getAs[String]("status"), r.getAs[Timestamp]("effective_from"),
        Option(r.getAs[Timestamp]("effective_to")),
        r.getAs[Boolean]("is_current")))
    // driver-side recompute: run-length collapse of the (ts, event_id)
    // ordered stream per user
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("ts"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
    val want = ev.groupBy(_._1).toSeq.flatMap { case (uid, rows) =>
      val ordered = rows.sortBy(r => (r._2.getTime, r._3))
      val runs = ordered.foldLeft(List.empty[(String, Timestamp)]) {
        case (acc, (_, ts, _, st)) =>
          if (acc.headOption.exists(_._1 == st)) acc
          else (st, ts) :: acc
      }.reverse
      runs.zipWithIndex.map { case ((st, from), i) =>
        val to = runs.lift(i + 1).map(_._2)
        (uid, (i + 1).toLong, st, from, to, to.isEmpty)
      }
    }.sortBy(r => (r._1, r._2))
    assert(got.toSeq == want)
    // interval algebra: versions abut exactly (to == next from), one
    // open current version per user, version numbers dense from 1
    got.groupBy(_._1).foreach { case (uid, vs) =>
      val s = vs.sortBy(_._2)
      assert(s.map(_._2).toSeq == (1L to s.length), s"versions $uid")
      assert(s.count(_._6) == 1 && s.last._6, s"current flag $uid")
      s.sliding(2).foreach {
        case Array(a, b) => assert(a._5.contains(b._4), s"gap in $uid")
        case _ =>
      }
    }
    // consecutive versions always change status (no no-op versions)
    got.groupBy(_._1).values.foreach { vs =>
      vs.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) => assert(a._3 != b._3)
        case _ =>
      }
    }
  }

  test("q_temporal_join matches a driver-side interval scan") {
    val got = Events.qTemporalJoin(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("event_id"),
        Option(r.getAs[Any]("version")).map(_.asInstanceOf[Long]),
        Option(r.getAs[String]("status"))))
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type")).collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("ts").getTime,
        r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
    // per user: run-collapse the non-purchase stream into versions,
    // then give each purchase the version with from <= ts and the
    // highest version number (= interval containment)
    val dims = ev.filter(_._4 != "purchase").groupBy(_._1).map {
      case (u, rows) =>
        val runs = rows.sortBy(r => (r._2, r._3))
          .foldLeft(List.empty[(String, Long)]) {
            case (acc, (_, ts, _, st)) =>
              if (acc.headOption.exists(_._1 == st)) acc
              else (st, ts) :: acc
          }.reverse.zipWithIndex
          .map { case ((st, from), i) => (i + 1L, st, from) }
        u -> runs
    }
    val want = ev.filter(_._4 == "purchase").map { case (u, ts, id, _) =>
      val hit = dims.getOrElse(u, Nil).filter(_._3 <= ts)
        .sortBy(_._1).lastOption
      (id, hit.map(_._1), hit.map(_._2))
    }.sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    assert(got.exists(_._2.isEmpty)) // some purchase precedes any status
    assert(got.exists(_._2.isDefined))
  }

  test("temporal join boundary: a probe at the change instant takes the new version") {
    import spark.implicits._
    val t = (s: String) => Timestamp.valueOf(s)
    val fx = Seq(
      (1L, t("2024-01-01 00:00:00"), "signup"),
      (1L, t("2024-01-01 02:00:00"), "error"),
      // purchase exactly at the second change's instant
      (1L, t("2024-01-01 02:00:00"), "purchase"),
      // and one before ANY status event
      (2L, t("2024-01-01 00:00:00"), "purchase"))
      .toDF("user_id", "ts", "event_type")
    withEventsFixture(fx) { dir =>
      val rows = Events.qTemporalJoin(spark, dir).collect()
        .map(r => (r.getAs[Long]("user_id"),
          Option(r.getAs[Any]("version")).map(_.asInstanceOf[Long]),
          Option(r.getAs[String]("status"))))
      assert(rows.toSet == Set(
        (1L, Some(2L), Some("error")), // [from, to): boundary inclusive
        (2L, None, None)))             // no dimension yet: LEFT semantics
    }
  }

  test("temporal join plans the carry window, not an interval join") {
    val p = Events.qTemporalJoin(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the naive plan is a per-user nested loop over versions; the
    // union-window carry must plan NO join operator at all
    assert(!p.contains("Join"), p.take(2000))
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), p.take(500))
  }

  test("q_transitions matches a driver-side adjacent-pair recount") {
    val got = Events.qTransitions(spark, sfDir).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type"),
        r.getAs[Long]("n"), r.getAs[Double]("p")))
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type")).collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("ts").getTime, r.getAs[Long]("event_id"),
        r.getAs[String]("event_type")))
    val pairs = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val o = rows.sortBy(r => (r._2, r._3)).map(_._4)
      o.zip(o.drop(1))
    }
    val counts = pairs.groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong }
    val totals = counts.groupBy(_._1._1).map { case (f, m) =>
      f -> m.values.sum }
    val want = counts.toSeq.map { case ((f, t), n) =>
      (f, t, n, n.toDouble / totals(f))
    }.sortBy(r => (r._1, r._2))
    assert(got.toSeq == want)
    // each source type's outgoing probabilities sum to ~1 (exact sums
    // of n/n_from with a shared denominator)
    got.groupBy(_._1).values.foreach { rs =>
      assert(math.abs(rs.map(_._4).sum - 1.0) < 1e-9)
    }
  }

  test("q_outliers matches a driver-side median/MAD recompute") {
    val got = Events.qOutliers(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Double]("med"),
        r.getAs[Double]("mad"), r.getAs[Double]("m_score"),
        r.getAs[Boolean]("is_outlier")))
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
        r.getAs[Double]("value")))
    // Spark's exact percentile: sorted, rank = p*(n-1), lower +
    // (upper - lower) * frac — reproduce the IEEE op order exactly
    def pct50(vs: Seq[Double]): Double = {
      val s = vs.sorted
      val rank = 0.5 * (s.length - 1)
      val lo = rank.toInt
      if (lo + 1 >= s.length) s(lo)
      else s(lo) + (s(lo + 1) - s(lo)) * (rank - lo)
    }
    val meds = ev.groupBy(_._2).map { case (t, rs) =>
      t -> pct50(rs.map(_._3).toSeq) }
    val mads = ev.groupBy(_._2).map { case (t, rs) =>
      t -> pct50(rs.map(r => math.abs(r._3 - meds(t))).toSeq) }
    val want = ev.map { case (id, t, v) =>
      val m = 0.6745 * (v - meds(t)) / mads(t)
      (id, meds(t), mads(t), m, math.abs(m) > 3.5)
    }.sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    // the fixture's uniform values produce SOME inliers and the flag
    // rule actually bites somewhere in the m-score range
    assert(got.exists(!_._5))
  }

  test("q_outliers flags a planted wild value and nothing near the median") {
    import spark.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val vals = (1 to 60).map(i => (i.toLong, t0, "purchase",
      10.0 + (i % 7))) :+ (99L, t0, "purchase", 10000.0)
    val fx = vals.toDF("user_id", "ts", "event_type", "value")
    withValuedEventsFixture(fx) { dir =>
      // the planted-wild contract must hold for BOTH the exact query
      // and its GK-sketch 100 TB dual
      Seq(Events.qOutliers _, Events.qOutliersApprox _).foreach { q =>
        val rows = q(spark, dir).collect()
          .map(r => (r.getAs[Double]("value"),
            r.getAs[Boolean]("is_outlier")))
        assert(rows.filter(_._1 == 10000.0).forall(_._2 == true))
        assert(rows.filter(_._1 < 20.0).forall(_._2 == false))
      }
    }
  }

  test("q_outliers_approx med/MAD land within 2% of the exact row") {
    def stats(df: org.apache.spark.sql.DataFrame) = df
      .select("event_type", "med", "mad").distinct().collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("med"), r.getAs[Double]("mad"))).toMap
    val exact = stats(Events.qOutliers(spark, sfDir))
    val approx = stats(Events.qOutliersApprox(spark, sfDir))
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (t, (med, mad)) =>
      val (aMed, aMad) = approx(t)
      assert(math.abs(aMed - med) <= 0.02 * math.abs(med).max(1e-9),
        s"$t median: approx=$aMed exact=$med")
      assert(math.abs(aMad - mad) <= 0.02 * math.abs(mad).max(1e-9),
        s"$t MAD: approx=$aMad exact=$mad")
    }
  }

  test("scd2Stateful closed versions equal the batch non-current rows") {
    import spark.implicits._
    import graft.streaming.Scd2Event
    val rnd = new scala.util.Random(1187)
    val statuses = Array("bronze", "silver", "gold")
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val evs = (1 to 150).map { i =>
      Scd2Event(rnd.nextInt(12).toLong, i.toLong,
        new Timestamp(base + rnd.nextInt(6 * 3600) * 1000L),
        statuses(rnd.nextInt(3)))
    }
    val arrival = rnd.shuffle(evs)
    val input = MemoryStream[Scd2Event](spark)
    // delay covers the full disorder span — the batch-equality
    // contract is "disorder bounded by delay"
    val q = graft.streaming.Streams.scd2Stateful(input.toDS(), "6 hours")
      .writeStream.format("memory").queryName("scd2_rand")
      .outputMode("append").start()
    try {
      arrival.grouped(23).foreach { batch =>
        input.addData(batch); q.processAllAvailable()
      }
      // push the watermark past every event, then fire the drain
      val push = new Timestamp(base + 13 * 3600 * 1000L)
      input.addData(Scd2Event(900, 9000, push, "bronze"))
      q.processAllAvailable()
      input.addData(Scd2Event(901, 9001, push, "bronze"))
      q.processAllAvailable()
      val got = spark.table("scd2_rand").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("version"),
          r.getAs[String]("status"), r.getAs[Timestamp]("effective_from"),
          r.getAs[Timestamp]("effective_to")))
        .filter(_._1 < 900).sortBy(r => (r._1, r._2))
      val want = graft.operators.Events.scd2Dim(
        evs.toDF("user_id", "event_id", "ts", "status")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("status")))
        .filter(!col("is_current")).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("version"),
          r.getAs[String]("status"), r.getAs[Timestamp]("effective_from"),
          r.getAs[Timestamp]("effective_to")))
        .sortBy(r => (r._1, r._2))
      assert(got.toSeq == want.toSeq)
      assert(got.nonEmpty) // the fixture actually exercises changes
    } finally q.stop()
  }

  test("scd2Stateful holds the open version in state, never emits it") {
    import spark.implicits._
    import graft.streaming.Scd2Event
    val t = (s: String) => Timestamp.valueOf(s)
    val input = MemoryStream[Scd2Event](spark)
    val q = graft.streaming.Streams.scd2Stateful(input.toDS(), "1 hour")
      .writeStream.format("memory").queryName("scd2_open")
      .outputMode("append").start()
    try {
      input.addData(
        Scd2Event(1, 1, t("2024-01-01 00:00:00"), "bronze"),
        Scd2Event(1, 2, t("2024-01-01 01:00:00"), "silver"))
      q.processAllAvailable()
      // watermark has not passed the silver event: nothing final yet
      input.addData(Scd2Event(5, 9, t("2024-01-01 09:00:00"), "x"))
      q.processAllAvailable()
      input.addData(Scd2Event(5, 10, t("2024-01-01 09:00:01"), "x"))
      q.processAllAvailable()
      val rows = spark.table("scd2_open").collect()
        .filter(_.getAs[Long]("user_id") == 1L)
        .map(r => (r.getAs[Long]("version"), r.getAs[String]("status")))
      // exactly the closed bronze version; silver stays open in state
      assert(rows.toSeq == Seq((1L, "bronze")))
    } finally q.stop()
  }

  /** Events fixture that keeps a caller-supplied value column. */
  private def withValuedEventsFixture(ev: org.apache.spark.sql.DataFrame)(
    f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft-events-")
    try {
      ev.withColumn("event_id", monotonically_increasing_id())
        .withColumn("props", lit("{}"))
        .withColumn("ts", expr("unix_micros(ts) * 1000"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      f(dir.toString)
    } finally {
      graft.sources.TempDirs.deleteTreeQuietly(dir)
    }
  }

  test("q_rolling_count matches a brute-force trailing-hour scan") {
    val got = Events.qRollingCount(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[Long]("s"), r.getAs[Long]("n_trailing_hour")))
    val byUser = got.groupBy(_._2)
    got.foreach { case (_, u, s, n) =>
      val want = byUser(u).count(e => e._3 >= s - 3600 && e._3 <= s)
      assert(n == want.toLong, s"user $u at s=$s")
    }
    assert(got.exists(_._4 > 1L)) // the fixture really has bursts
  }

  test("q_rolling_count RANGE frame is tie-stable at equal seconds") {
    import spark.implicits._
    val base = Timestamp.valueOf("2024-01-01 00:00:00")
    // three events in the SAME second for one user: each must count all
    // three peers regardless of sort order within the second
    val ev = Seq.tabulate(3)(_ => (7L, base, "view"))
      .toDF("user_id", "ts", "event_type")
    withEventsFixture(ev) { dir =>
      val ns = Events.qRollingCount(spark, dir).collect()
        .map(_.getAs[Long]("n_trailing_hour")).toSeq
      assert(ns == Seq(3L, 3L, 3L))
    }
  }

  test("q_rolling_count runs the frame on one user-keyed shuffle") {
    val p = Events.qRollingCount(spark, sfDir).queryExecution.executedPlan
      .toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(p.replace("ReusedExchange", "reused")).length
    assert(exchanges == 1, s"expected one user shuffle:\n${p.take(2000)}")
  }

  test("q_user_journey matches a driver-side ordered fold") {
    val got = Events.qUserJourney(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[String]("journey"))).toSeq
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts").cast("long").as("s"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("s"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
    val want = ev.groupBy(_._1).map { case (u, es) =>
      (u, es.length.toLong,
        es.sortBy(e => (e._2, e._3)).take(50).map(_._4).mkString("->"))
    }.toSeq.sortBy(_._1)
    assert(got == want)
    assert(got.exists(_._3.contains("->"))) // real multi-step journeys
  }

  test("q_user_journey bounds aggregation state: rank filter below the collect") {
    // pre-execution plan: post-collect AQE toString prints Final AND
    // Initial plans and double-counts every exchange
    val p = Events.qUserJourney(spark, sfDir)
      .queryExecution.executedPlan.toString
    // one user-keyed hash exchange shared by the rank window, the count
    // window, and the groupBy (the final presentation orderBy is range
    // partitioning, not counted)
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(p.replace("ReusedExchange", "reused")).length
    assert(exchanges == 1, s"expected one user shuffle:\n${p.take(2000)}")
    // the rank cap must sit BELOW the collect_list aggregate (top-down
    // plan print: aggregate first, filter later) so per-group state is
    // ≤50 structs by construction, not sliced after an unbounded collect
    assert(p.contains("row_number"), p.take(2000))
    val cap = p.indexOf("<= 50")
    assert(cap >= 0 && cap > p.indexOf("collect_list"),
      s"rank cap not below the collect:\n${p.take(2000)}")
  }

  test("q_user_journey caps the serialized steps, not the event count") {
    import spark.implicits._
    val base = Timestamp.valueOf("2024-01-01 00:00:00")
    val ev = (0 until 60).map(i =>
      (5L, new Timestamp(base.getTime + i * 60000L), "view"))
      .toDF("user_id", "ts", "event_type")
    withEventsFixture(ev) { dir =>
      val row = Events.qUserJourney(spark, dir).collect().head
      assert(row.getAs[Long]("n_events") == 60L)
      assert(row.getAs[String]("journey").split("->").length == 50)
    }
  }

  test("rollingStateful equals the batch RANGE frame on randomized arrivals") {
    import spark.implicits._
    import graft.streaming.RollingEvent
    val rnd = new scala.util.Random(777)
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // sub-second components and planted equal-second ties: the
    // second-granularity flush must count same-second peers mutually
    val evs = (1 to 150).map { i =>
      val s = rnd.nextInt(4 * 3600)
      RollingEvent(rnd.nextInt(8).toLong, i.toLong,
        new Timestamp(base + s * 1000L + rnd.nextInt(1000)))
    } ++ Seq(
      RollingEvent(7L, 901L, new Timestamp(base + 5000 * 1000L + 100)),
      RollingEvent(7L, 902L, new Timestamp(base + 5000 * 1000L + 900)))
    val arrival = rnd.shuffle(evs)
    val input = MemoryStream[RollingEvent](spark)
    val q = graft.streaming.Streams.rollingStateful(input.toDS(), "6 hours")
      .writeStream.format("memory").queryName("rolling_stateful")
      .outputMode("append").start()
    try {
      arrival.grouped(23).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      val push = new Timestamp(base + 14 * 3600 * 1000L)
      input.addData(RollingEvent(900L, 0L, push)); q.processAllAvailable()
      input.addData(RollingEvent(901L, 0L, push)); q.processAllAvailable()
      val got = spark.table("rolling_stateful").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
          r.getAs[Long]("s"), r.getAs[Long]("n_trailing_hour")))
        .sortBy(x => (x._1, x._2)).toSeq
      val secs = evs.map(e => (e.user_id, e.event_id,
        Math.floorDiv(e.ts.getTime, 1000L)))
      val want = secs.map { case (u, id, s) =>
        (u, id, s, secs.count(o => o._1 == u &&
          o._3 >= s - 3600 && o._3 <= s).toLong)
      }.sortBy(x => (x._1, x._2))
      assert(got == want)
      assert(want.exists(_._4 > 1L))
      // the planted tie pair counted each other
      assert(got.filter(g => g._2 == 901L || g._2 == 902L)
        .forall(_._4 >= 2L))
    } finally q.stop()
  }

  test("q_scd2_dim runs all three windows on one user-keyed shuffle") {
    val p = Events.qScd2Dim(spark, sfDir).queryExecution.executedPlan
      .toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(p.replace("ReusedExchange", "reused")).length
    assert(exchanges == 1, s"expected one user shuffle:\n${p.take(2000)}")
  }

  /** Write an events-shaped fixture and run `f` against its dir. The
    * driver's events.parquet stores `ts` as raw nanosecond longs
    * (TESTDATA.md; [[graft.sources.Tables.events]] decodes them), so
    * the fixture serializes the same way. */
  private def withEventsFixture(ev: org.apache.spark.sql.DataFrame)(
    f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft-events-")
    try {
      ev.withColumn("event_id", monotonically_increasing_id())
        .withColumn("value", lit(1.0))
        .withColumn("props", lit("{}"))
        .withColumn("ts", expr("unix_micros(ts) * 1000"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      f(dir.toString)
    } finally {
      graft.sources.TempDirs.deleteTreeQuietly(dir)
    }
  }
}
