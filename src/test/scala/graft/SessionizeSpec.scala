package graft

import graft.operators.{Sessionize, SkewJoin}
import graft.queries.Tables
import graft.streaming.StreamingIngest
import graft.streaming.StreamingIngest.SessionEvent
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  test("batch sessionize: gaps split sessions, ids are 1-based per user") {
    val t0 = 1700000000000000L // µs
    val ev = Seq(
      (1L, t0), (1L, t0 + 60_000000L), (1L, t0 + 4000_000000L), // gap > 30min
      (2L, t0)
    ).toDF("user_id", "ts_us")
      .withColumn("ts", timestamp_micros($"ts_us"))
    val s = Sessionize.sessions(ev, "user_id", "ts", 1800)
      .orderBy("user_id", "session_id")
      .select("user_id", "session_id", "n_events").as[(Long, Long, Long)]
      .collect().toSeq
    assert(s == Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("streaming sessionize closes the same sessions the batch op finds") {
    val events = Tables(spark, "/root/testdata/sf0.001", "events")
    val batch = Sessionize.sessions(events, "user_id", "ts", 1800)
      .select($"user_id", $"session_id", $"n_events", $"session_start_s")
      .as[(Long, Long, Long, Long)].collect().toSet
    // run the stateful op in a single batch over the same data (batch mode
    // execution of flatMapGroupsWithState keeps identical semantics)
    val ds = events.select($"user_id", unix_micros($"ts").as("ts_us"))
      .as[SessionEvent]
    val streamed = StreamingIngest.sessionizeStream(ds, 1800)
      .collect().map(s => (s.user_id, s.session_id, s.n_events, s.session_start_s))
      .toSet
    // streaming emits only CLOSED sessions; the per-user open tail stays in
    // state — so streamed must equal batch minus each user's last session
    val lastPerUser = batch.groupBy(_._1).view.mapValues(_.maxBy(_._2)).values.toSet
    assert(streamed == batch -- lastPerUser)
    assert(streamed.nonEmpty)
  }

  test("a real AvailableNow streaming run terminates and matches batch minus open sessions") {
    // idleTimeoutSeconds = 0 (NoTimeout) is load-bearing: with a pending
    // processing-time timeout, AvailableNow parks in a "cleaning up state"
    // batch until the idle horizon and never terminates within the run
    val tmp = tmpDir("stream_sess")
    val events = Tables(spark, "/root/testdata/sf0.001", "events")
      .select($"user_id", $"ts")
    events.coalesce(1).write.parquet(s"$tmp/src")
    val stream = StreamingIngest.parquetStream(spark, s"$tmp/src", events)
      .select($"user_id", unix_micros($"ts").as("ts_us"))
      .as[SessionEvent]
    val q = StreamingIngest
      .sessionizeStream(stream, 1800, idleTimeoutSeconds = 0L)
      .writeStream
      .format("parquet")
      .option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), s"did not terminate: ${q.status}")
    val streamed = spark.read.parquet(s"$tmp/out")
      .select($"user_id", $"session_id", $"n_events", $"session_start_s")
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = Sessionize.sessions(events, "user_id", "ts", 1800)
      .select($"user_id", $"session_id", $"n_events", $"session_start_s")
      .as[(Long, Long, Long, Long)].collect().toSet
    val lastPerUser = batch.groupBy(_._1).view.mapValues(_.maxBy(_._2)).values.toSet
    assert(streamed == batch -- lastPerUser)
    assert(streamed.nonEmpty)
  }

  test("idle eviction keeps a sid tombstone so a returning user continues the sequence") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import graft.streaming.StreamingIngest.{SessionAgg, SessionOut}
    val step = StreamingIngest.sessionStep(1800L * 1000000L, 3600_000L) _
    val t0 = 1700000000000000L
    // user 7 has an open session (sid=2, 3 events) and goes idle → timeout
    val s1 = TestGroupState.create[SessionAgg](
      Optional.of(SessionAgg(2L, t0, t0 + 60_000000L, 3L)),
      GroupStateTimeout.ProcessingTimeTimeout, 0L, Optional.empty[Long](),
      hasTimedOut = true)
    val out1 = step(7L, Iterator.empty, s1).toSeq
    assert(out1 == Seq(SessionOut(7L, 2L, 3L, t0 / 1000000L)),
      "timeout flushes the open session")
    assert(s1.get == SessionAgg(2L, 0L, 0L, 0L), "state shrinks to a sid tombstone")
    // the user returns: next session id must be 3, not 1
    val s2 = TestGroupState.create[SessionAgg](
      Optional.of(s1.get), GroupStateTimeout.ProcessingTimeTimeout, 0L,
      Optional.empty[Long](), hasTimedOut = false)
    val out2 = step(7L, Iterator.single(SessionEvent(7L, t0 + 9000_000000L)), s2).toSeq
    assert(out2.isEmpty, "new session is still open — nothing closed yet")
    assert(s2.get.sid == 3L && s2.get.count == 1L,
      s"sid sequence continues after eviction, got ${s2.get}")
    // a tombstone that idles through a second timeout is removed for good
    val s3 = TestGroupState.create[SessionAgg](
      Optional.of(SessionAgg(2L, 0L, 0L, 0L)),
      GroupStateTimeout.ProcessingTimeTimeout, 0L, Optional.empty[Long](),
      hasTimedOut = true)
    assert(step(7L, Iterator.empty, s3).isEmpty)
    assert(s3.isRemoved, "expired tombstone is evicted")
  }

  test("salted join returns exactly the plain join's result") {
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_extendedprice")
    val ord = Tables(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(ord, Seq("l_orderkey")).count()
    val salted = SkewJoin.saltedJoin(li, ord, Seq("l_orderkey"), 8).count()
    assert(salted == plain)
    val sum1 = li.join(ord, Seq("l_orderkey"))
      .agg(sum($"o_totalprice".cast("decimal(18,2)"))).collect().head.getDecimal(0)
    val sum2 = SkewJoin.saltedJoin(li, ord, Seq("l_orderkey"), 8)
      .agg(sum($"o_totalprice".cast("decimal(18,2)"))).collect().head.getDecimal(0)
    assert(sum1 == sum2)
  }

  test("salted join rejects build-preserving join types") {
    val df = Seq((1L, "a")).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(df, df, Seq("k"), 4, "full_outer")
    }
    assert(e.getMessage.contains("probe-preserving"))
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(df, df, Seq("k"), 4, "right_outer")
    }
  }

  test("approx distinct (HLL + KMV) stays within tolerance of exact") {
    val r = graft.queries.RelationalQueries.qApproxDistinct(
      spark, "/root/testdata/sf0.001")
      .as[(String, Long, Boolean, Boolean)].collect()
    r.foreach { case (flag, exact, hllOk, kmvOk) =>
      assert(exact > 0)
      assert(hllOk, s"HLL out of tolerance for $flag")
      assert(kmvOk, s"KMV out of tolerance for $flag")
    }
  }
}
