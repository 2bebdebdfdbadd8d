package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Connected-components goldens: hand-checked component structures, a
  * randomized comparison against an in-test union-find, and the dedup
  * cluster/representative semantics built on top.
  */
class ConnectedComponentsSpec extends SparkTestBase {

  import spark.implicits._

  private def labelMap(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.labels(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("path graph collapses to its minimum") {
    // 1-2-3-...-12: only adjacent pairs edged; closure must label all 1
    val edges = (1L until 12L).map(i => (i, i + 1))
    val m = labelMap(edges)
    assert(m.keySet == (1L to 12L).toSet)
    assert(m.values.toSet == Set(1L))
  }

  test("two components, edge direction and duplicates irrelevant") {
    val edges = Seq((5L, 3L), (3L, 5L), (5L, 3L), (9L, 7L), (7L, 8L))
    val m = labelMap(edges)
    assert(m == Map(3L -> 3L, 5L -> 3L, 7L -> 7L, 8L -> 7L, 9L -> 7L))
  }

  test("self-loops ignored; empty edge set yields empty labels") {
    assert(labelMap(Seq((4L, 4L))).isEmpty)
    assert(labelMap(Seq.empty).isEmpty)
  }

  test("randomized graph agrees with union-find") {
    // deterministic pseudo-random edges over 60 nodes (LCG, fixed seed)
    var s = 12345L
    def next(n: Int): Int = { s = s * 6364136223846793005L + 1442695040888963407L
      (math.abs(s >>> 33) % n).toInt }
    val edges = Seq.fill(55)((next(60).toLong, next(60).toLong))
      .filter { case (a, b) => a != b }
    // reference union-find
    val par = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = { val p = par.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); par(x) = r; r } }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) par(math.max(ra, rb)) = math.min(ra, rb) }
    val expected = par.keys.map(x => x -> {
      // min id of the component, not just the union-find root
      val r = find(x); par.keys.filter(find(_) == r).min
    }).toMap
    assert(labelMap(edges) == expected)
  }

  test("duplicateClusters: closure labels + singleton self-labels + representatives") {
    val docs = (0L to 6L).toDF("doc_id")
    // pairs chain 1-2, 2-3 (one cluster {1,2,3}); 5-6; 0 and 4 untouched
    val pairs = Seq((2L, 1L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Dedup.duplicateClusters(docs, "doc_id", pairs)
      .select("doc_id", "cluster_id", "is_representative")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(out == Set(
      (0L, 0L, true), (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (4L, 4L, true), (5L, 5L, true), (6L, 5L, false)))
    val kept = Dedup.dropNearDuplicates(docs, "doc_id", pairs)
      .as[Long].collect().toSet
    assert(kept == Set(0L, 1L, 4L, 5L))
  }

  test("keepBestPerCluster: argmax priority wins, ties break by id, nulls lose") {
    val docs = Seq(
      (0L, Some(9.0)),               // singleton: kept regardless
      (1L, Some(2.0)), (2L, Some(7.0)), (3L, Some(7.0)), // cluster {1,2,3}
      (4L, None: Option[Double]),    // singleton with null priority: kept
      (5L, None: Option[Double]), (6L, Some(1.0)), // cluster {5,6}
      (7L, None: Option[Double]), (8L, None: Option[Double])) // all-null cluster
      .toDF("doc_id", "q")
    val pairs = Seq((2L, 1L), (2L, 3L), (5L, 6L), (7L, 8L)).toDF("id_a", "id_b")
    val out = Dedup.keepBestPerCluster(docs, "doc_id", "q", pairs)
      .select("doc_id", "cluster_id", "keep")
      .as[(Long, Long, Boolean)].collect().toSet
    // {1,2,3}: 2 and 3 tie at 7.0 → smaller id 2 wins; {5,6}: null loses
    // to 1.0 → 6 wins; {7,8}: all null → smaller id 7 wins
    assert(out == Set(
      (0L, 0L, true), (1L, 1L, false), (2L, 1L, true), (3L, 1L, false),
      (4L, 4L, true), (5L, 5L, false), (6L, 5L, true),
      (7L, 7L, true), (8L, 7L, false)))
  }

  test("keepBestPerCluster randomized: agrees with union-find + argmax reference") {
    // deterministic pseudo-random graph + priorities (LCG, fixed seed);
    // reference = union-find closure, then per-component argmax by
    // (priority desc, id asc), singletons keep
    var s = 987654321L
    def next(n: Int): Int = { s = s * 6364136223846793005L + 1442695040888963407L
      (math.abs(s >>> 33) % n).toInt }
    val n = 50
    val edges = Seq.fill(35)((next(n).toLong, next(n).toLong))
      .filter { case (a, b) => a != b }
    val prio = (0L until n.toLong).map(i => i -> next(1000).toDouble).toMap
    val par = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = { val p = par.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); par(x) = r; r } }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) par(math.max(ra, rb)) = math.min(ra, rb) }
    val comps = (0L until n.toLong).groupBy(i =>
      if (par.contains(i)) find(i) else i)
    val expected = (0L until n.toLong).map { i =>
      val members = comps(if (par.contains(i)) find(i) else i)
      val best = members.minBy(m => (-prio(m), m))
      i -> (members.size == 1 || i == best)
    }.toMap
    val df = (0L until n.toLong).map(i => (i, prio(i))).toDF("id", "q")
    val out = Dedup.keepBestPerCluster(df, "id", "q",
        edges.toDF("id_a", "id_b"))
      .select("id", "keep").as[(Long, Boolean)].collect().toMap
    assert(out == expected)
  }

  test("extra pair columns (scores) are ignored") {
    val docs = Seq(1L, 2L).toDF("doc_id")
    val pairs = Seq((1L, 2L, 0.95)).toDF("id_a", "id_b", "jaccard")
    val out = Dedup.duplicateClusters(docs, "doc_id", pairs)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L))
  }
}
