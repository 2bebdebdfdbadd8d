package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Bloom filter goldens: no false negatives ever, bounded false-positive
  * rate at the designed load factor, bitmap/positions agreement, and the
  * word-boundary edges (bit 0, bit 63) an arithmetic shift would break.
  */
class BloomSpec extends SparkTestBase {

  import spark.implicits._

  test("no false negatives; FP rate near design at load 0.37") {
    val ref = (0 until 2000).map(i => s"member-$i").toDF("v")
    val words = Profile.bloomBitmap(ref, "v", numHashes = 3, numBits = 16384)
    val members = (0 until 2000).map(i => s"member-$i")
    val outsiders = (0 until 4000).map(i => s"outsider-$i")
    val verdicts = (members ++ outsiders).toDF("v")
      .select(col("v"),
        Profile.bloomMightContain(words, col("v"), 3, 16384).as("hit"))
      .as[(String, Boolean)].collect().toMap
    assert(members.forall(verdicts(_)), "false negative")
    val fp = outsiders.count(verdicts(_))
    // design FP ≈ (1 − e^(−3·2000/16384))^3 ≈ 2.9% → expect ~116 of 4000;
    // generous deterministic band
    assert(fp > 20 && fp < 400, s"fp=$fp out of band")
  }

  test("probe equals positions-vs-bitmap membership, incl. word edges") {
    // brute-force reference: a value is a hit iff ALL its positions are
    // set in the bitmap built from the reference set
    val ref = (0 until 300).map(i => s"x$i").toDF("v")
    val k = 4; val m = 512
    val words = Profile.bloomBitmap(ref, "v", k, m)
    // reconstruct the set-bit set from the words and from positions
    val setBits = (0 until m).filter(b =>
      (words(b / 64) >>> (b % 64) & 1L) == 1L).toSet
    val fromPositions = ref
      .select(explode(Profile.bloomPositions(col("v"), k, m)).as("b"))
      .as[Long].collect().map(_.toInt).toSet
    assert(setBits == fromPositions)
    // with m=512 and 300×4 inserts the map is dense: bits 0 and 63 of
    // word 0 are almost surely set — assert at least one high bit (63 mod
    // 64) is set somewhere so the unsigned-shift path is exercised
    assert((0 until m / 64).exists(w => (words(w) >>> 63 & 1L) == 1L))
    val probe = (0 until 1500).map(i => s"x$i").toDF("v")
    val got = probe.select(col("v"),
        Profile.bloomMightContain(words, col("v"), k, m).as("hit"))
      .as[(String, Boolean)].collect().toMap
    val expect = (0 until 1500).map { i =>
      val ps = Seq(s"x$i").toDF("v")
        .select(explode(Profile.bloomPositions(col("v"), k, m)).as("b"))
        .as[Long].collect().map(_.toInt)
      s"x$i" -> ps.forall(setBits)
    }.toMap
    assert(got == expect)
  }

  test("probe plan is map-only: no exchange, no join — the bitmap is a literal") {
    val ref = (0 until 100).map(i => s"r$i").toDF("v")
    val words = Profile.bloomBitmap(ref, "v", 3, 4096)
    val probe = (0 until 1000).map(i => s"p$i").toDF("v")
      .select(Profile.bloomMightContain(words, col("v"), 3, 4096).as("hit"))
    val plan = probe.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"probe plan shuffles:\n$plan")
    assert(!plan.contains("Join"), s"probe plan joins:\n$plan")
  }
}
