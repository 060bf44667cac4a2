package graft.ops

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    // user 1: full funnel in order
    (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
    // user 2: clicked BEFORE viewing — click must not count
    (2L, 10L, "click"), (2L, 20L, "view"),
    // user 3: view then purchase, no click — funnel stalls at step 1
    (3L, 10L, "view"), (3L, 20L, "purchase"),
    // user 4: never viewed — not in the funnel at all
    (4L, 10L, "click"), (4L, 20L, "purchase"),
    // user 5: simultaneous view/click — strictly-after excludes the click
    (5L, 10L, "view"), (5L, 10L, "click")
  ).toDF("user_id", "ts", "event_type")

  test("ordered funnel: strictly-after semantics per step") {
    val out = Funnel.funnel(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[java.lang.Long]("t1"), r.getAs[java.lang.Long]("t2"),
          r.getAs[java.lang.Long]("t3"), r.getAs[Long]("steps_completed"))).toMap
    assert(out(1L) == ((10L, 20L, 30L, 3L)))
    assert(out(2L) == ((20L, null, null, 1L))) // pre-view click ignored
    assert(out(3L) == ((10L, null, null, 1L)))
    assert(!out.contains(4L))                  // never entered the funnel
    assert(out(5L) == ((10L, null, null, 1L))) // same-ts click not strictly after
  }

  test("earliest qualifying event wins each step") {
    val e = Seq(
      (1L, 10L, "view"), (1L, 15L, "view"),         // first view wins
      (1L, 12L, "click"), (1L, 14L, "click"),       // first click AFTER t1=10
      (1L, 13L, "purchase"), (1L, 99L, "purchase")  // purchase at 13 is after t2=12
    ).toDF("user_id", "ts", "event_type")
    val r = Funnel.funnel(e, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")).head()
    assert(r.getAs[Long]("t1") == 10L && r.getAs[Long]("t2") == 12L
      && r.getAs[Long]("t3") == 13L && r.getAs[Long]("steps_completed") == 3L)
  }
}
