package graft.runner

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.FakeProvider
import graft.spec._

/** Small pure-unit corners: status serde, provider dim parsing. */
class OpStatusSpec extends AnyFunSuite {

  test("OpStatus round-trips through JSON incl. optional fields") {
    val ds = LoadLocalParquetDatasetOp("h", "/tmp/x.parquet")
    val full = OpStatus(ds.uuid, OpState.Completed,
      startedAt = Some("2026-08-12T00:00:00Z"),
      completedAt = Some("2026-08-12T00:00:05Z"),
      resultFormat = Some("parquet"),
      graph = Some(Graph.serialize(ds)))
    val back = OpStatus.fromJson(Json.parse(Json.renderPretty(full.toJson)))
    assert(back == full)
    val minimal = OpStatus(ds.uuid, OpState.New)
    assert(OpStatus.fromJson(Json.parse(Json.render(minimal.toJson))) == minimal)
  }

  test("OpStatus rejects unknown states") {
    intercept[IllegalArgumentException](OpStatus("X_1", "bogus"))
  }

  test("FakeProvider dim parsing") {
    assert(FakeProvider.parseDim("d16") == 16)
    assert(FakeProvider.parseDim("d2048") == 2048)
    assert(FakeProvider.parseDim("") == 16) // default
    assert(FakeProvider.parseDim("gpt2") == 16) // non-dim model ids → default
    assert(FakeProvider.parseDim("d") == 16)
  }

  test("fake provider values span [-1, 1) and differ per index") {
    val p = FakeProvider(32)
    val v = p.activationVector("some text", -1L, "last")
    assert(v.length == 32)
    assert(v.forall(x => x >= -1.0 && x < 1.0))
    assert(v.distinct.length > 16) // hash-derived, not constant
  }
}
