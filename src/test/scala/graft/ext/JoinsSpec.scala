package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Temporal join goldens: hand-computed as-of matches and interval
  * memberships on tiny fixtures, plus the edge semantics (equal timestamps,
  * exclusive interval end, no preceding right row).
  */
class JoinsSpec extends SparkTestBase {

  import spark.implicits._

  test("asofJoin: latest right row at-or-before each left row, per key") {
    val trades = Seq(
      (1L, "a", 10L), (2L, "a", 25L), (3L, "a", 31L), (4L, "b", 5L))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("a", 8L, 1.0), ("a", 20L, 2.0), ("a", 30L, 3.0), ("b", 9L, 9.0))
      .toDF("sym", "t", "px")
    val out = Joins.asofJoin(trades, quotes, Seq("sym"), "t", "t", Seq("px"))
      .orderBy("trade_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 1.0),   // t=10 → quote t=8
      (2L, 2.0),   // t=25 → quote t=20
      (3L, 3.0),   // t=31 → quote t=30
      (4L, null))) // t=5 precedes every b quote
  }

  test("asofJoin: an equal-timestamp right row is visible") {
    val l = Seq((1L, "k", 100L)).toDF("id", "k", "t")
    val r = Seq(("k", 100L, 7.0)).toDF("k", "t", "v")
    val out = Joins.asofJoin(l, r, Seq("k"), "t", "t", Seq("v")).collect()
    assert(out.head.getDouble(3) == 7.0)
  }

  test("asofJoin: a matched right row with a NULL value is not torn") {
    // the matched row (t=20) carries px=NULL; per-column forward-fill would
    // pair its id with the OLDER row's px — the struct fill must not
    val l = Seq((1L, "k", 25L)).toDF("id", "k", "t")
    val r = Seq(("k", 10L, Some(5.0), 100L), ("k", 20L, None, 200L))
      .toDF("k", "t", "px", "rid")
    val out = Joins.asofJoin(l, r, Seq("k"), "t", "t", Seq("px", "rid")).head()
    // columns: id, k, t, px, rid
    assert(out.getLong(4) == 200L)   // matched rid is the t=20 row
    assert(out.isNullAt(3),          // and its px is genuinely NULL
      "px must be the matched row's NULL, not an older row's value")
  }

  test("asofJoin: equal-(key,ts) right rows resolve by the value struct") {
    val l = Seq((1L, "k", 10L)).toDF("id", "k", "t")
    val r = Seq(("k", 10L, 1.0), ("k", 10L, 9.0)).toDF("k", "t", "v")
    val out = Joins.asofJoin(l, r, Seq("k"), "t", "t", Seq("v")).head()
    assert(out.getDouble(3) == 9.0) // field-wise-greatest struct wins
  }

  test("asofJoin rejects colliding right value column names") {
    val l = Seq((1L, "k", 100L)).toDF("id", "k", "t")
    val r = Seq(("k", 100L, 7.0)).toDF("k", "t", "id")
    intercept[IllegalArgumentException] {
      Joins.asofJoin(l, r, Seq("k"), "t", "t", Seq("id"))
    }
  }

  test("rangeJoinBinned: membership across bin boundaries, end exclusive") {
    // binWidth 10; interval [5, 25) covers bins 0,1,2; [30, 40) covers 3
    val intervals = Seq(("k", 1L, 5L, 25L), ("k", 2L, 30L, 40L))
      .toDF("key", "iid", "s", "e")
    val points = Seq(
      ("k", 5L),   // = start of 1 → in
      ("k", 24L),  // in 1 (different bin than start)
      ("k", 25L),  // = end of 1, exclusive → out
      ("k", 39L),  // in 2
      ("k", 40L),  // = end of 2 → out
      ("x", 6L))   // wrong key → out
      .toDF("key", "p")
    val out = Joins.rangeJoinBinned(points, "p", intervals, "s", "e",
        Seq("key"), binWidth = 10L)
      .select("iid", "p").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 5L), (1L, 24L), (2L, 39L)))
  }

  test("rangeJoinBinned: inverted/empty intervals match nothing, cheaply") {
    // end <= start can never contain a point, but without the pre-filter
    // sequence(startBin, endBin) would count DOWNWARD — the far-inverted
    // row below would otherwise explode into a ~10^8-element bin array
    val intervals = Seq(
      ("k", 1L, 5L, 25L),           // normal
      ("k", 2L, 50L, 50L),          // empty
      ("k", 3L, 1000000000L, 10L))  // far-inverted
      .toDF("key", "iid", "s", "e")
    val points = Seq(("k", 6L), ("k", 50L)).toDF("key", "p")
    val out = Joins.rangeJoinBinned(points, "p", intervals, "s", "e",
        Seq("key"), binWidth = 10L)
      .select("iid", "p").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 6L)))
  }

  test("rangeJoinBinned: each qualifying pair appears exactly once") {
    // a long interval spanning many bins must not duplicate its matches
    val intervals = Seq(("k", 1L, 0L, 100L)).toDF("key", "iid", "s", "e")
    val points = (0L until 100L by 7L).map(("k", _)).toDF("key", "p")
    val out = Joins.rangeJoinBinned(points, "p", intervals, "s", "e",
      Seq("key"), binWidth = 10L)
    assert(out.count() == out.distinct().count())
    assert(out.count() == 15) // 0,7,...,98
  }
}
