package graft.ops

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asOf picks the latest right row at-or-before each left row") {
    val trades = Seq((1L, 100L, "t1"), (1L, 205L, "t2"), (2L, 50L, "t3"))
      .toDF("key", "ts", "trade")
    val quotes = Seq((1L, 100L, 9.0, 1L), (1L, 200L, 10.0, 2L), (2L, 60L, 5.0, 3L))
      .toDF("key", "ts", "px", "qid")

    val got = AsOfJoin.asOf(trades, quotes, Seq("key"), "ts", "ts", Seq("px"), "qid")
      .select("key", "trade", "px", "ts_matched")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getDouble(2),
        if (r.isNullAt(3)) null else r.getLong(3))).toSet

    assert(got == Set(
      (1L, "t1", 9.0, 100L),   // equal ts counts (<= semantics)
      (1L, "t2", 10.0, 200L),  // latest preceding, not first
      (2L, "t3", null, null))) // no quote at-or-before 50
  }

  test("timestamp ties on the right resolve to the highest seq") {
    val left = Seq((1L, 10L)).toDF("key", "ts")
    val right = Seq((1L, 10L, "a", 1L), (1L, 10L, "b", 2L)).toDF("key", "ts", "v", "seq")
    val got = AsOfJoin.asOf(left, right, Seq("key"), "ts", "ts", Seq("v"), "seq")
      .select("v").as[String].collect()
    assert(got.toSeq == Seq("b"))
  }

  test("fails fast when a right payload column shadows a left column") {
    val left = Seq((1L, 10L, 1.0)).toDF("key", "ts", "px")
    val right = Seq((1L, 9L, 2.0, 1L)).toDF("key", "ts", "px", "qid")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, right, Seq("key"), "ts", "ts", Seq("px"), "qid")
    }
    assert(e.getMessage.contains("px"))
    // reserved working names are rejected too
    val badLeft = Seq((1L, 10L, "x")).toDF("key", "ts", "__side")
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(badLeft, right.drop("px"), Seq("key"), "ts", "ts", Seq("qid"), "qid")
    }
  }

  test("union-window result equals the quadratic range-join formulation") {
    val rnd = new scala.util.Random(7)
    val left = (1 to 200).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("key", "ts", "lid")
    val right = (1 to 300).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("key", "ts", "rid")
    val got = AsOfJoin.asOf(left, right, Seq("key"), "ts", "ts", Seq("rid"), "rid")
      .select("lid", "rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    // oracle: argmax over the range join, ties by rid desc
    val l = left.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rr = right.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = l.map { case (k, ts, lid) =>
      val cands = rr.filter(q => q._1 == k && q._2 <= ts)
      lid -> (if (cands.isEmpty) -1L
              else cands.maxBy(q => (q._2, q._3))._3)
    }.toMap
    assert(got == expect)
  }

  test("forward + tolerance equals the quadratic reference; left rows always kept") {
    val rnd = new scala.util.Random(11)
    val left = (1 to 200).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("key", "ts", "lid")
    val right = (1 to 300).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("key", "ts", "rid")
    val out = AsOfJoin.asOfDirectional(left, right, Seq("key"), "ts", "ts",
      Seq("rid"), "rid", forward = true, tolerance = Some(50L))
    assert(out.count() == 200, "tolerance must null payloads, never drop left rows")
    val got = out.select("lid", "rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    // reference: earliest right at ts' >= ts (ties: min ts', then max rid
    // among the collapsed per-(key,ts) survivors), nulled beyond 50
    val l = left.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rr = right.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = l.map { case (k, ts, lid) =>
      val cands = rr.filter(q => q._1 == k && q._2 >= ts && q._2 - ts <= 50L)
      lid -> (if (cands.isEmpty) -1L
              else { val m = cands.minBy(_._2)._2
                     cands.filter(_._2 == m).maxBy(_._3)._3 })
    }.toMap
    assert(got == expect)
  }

  test("backward tolerance nulls stale matches but keeps exact-distance ones") {
    val left = Seq((1L, 100L, 10L), (1L, 300L, 11L)).toDF("key", "ts", "lid")
    val right = Seq((1L, 90L, 1L), (1L, 150L, 2L)).toDF("key", "ts", "rid")
    val got = AsOfJoin.asOfDirectional(left, right, Seq("key"), "ts", "ts",
      Seq("rid"), "rid", forward = false, tolerance = Some(10L))
      .select("lid", "rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // lid 10: match at 90, gap exactly 10 → kept; lid 11: match at 150,
    // gap 150 > 10 → nulled
    assert(got == Map(10L -> 1L, 11L -> -1L))
  }
}
