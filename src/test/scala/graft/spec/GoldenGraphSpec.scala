package graft.spec

import org.scalatest.funsuite.AnyFunSuite

/** A committed graph fixture whose node UUIDs were computed by an
  * INDEPENDENT implementation of the canonical format (a python script using
  * json.dumps(sort_keys) + sha256). Deserialization re-verifies every UUID,
  * so this test fails if the Scala canonical JSON ever drifts — the
  * cross-engine analog of the reference's golden-UUID suite
  * (`tests/test_graph.py:32-54`).
  */
class GoldenGraphSpec extends AnyFunSuite {

  private lazy val fixture: String = {
    val in = getClass.getResourceAsStream("/golden_graph.json")
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  test("externally-authored golden graph deserializes with verified uuids") {
    val outputs = Graph.deserializeString(fixture)
    assert(outputs.length == 3)
    val Seq(take, split, tmpl) = outputs
    assert(take.uuid ==
      "TakeRowsOp_737c38867b6c6e00ee4c60c601be2db523c9f00b38b99381c50b1c89625eb636")
    assert(split.uuid ==
      "AssignTrainTestSplitOp_5f6a505d7a9cb33fa0503111f4efbddef611018f45ba7da1d53f4304c37cbe77")
    assert(tmpl.uuid ==
      "JinjaTemplatizeOp_1e800f3ec880fa1d746aa6c632ec7d18a209df284e56a711941b2cffb2ff4ae5")

    // structure survived: shared MaskRowsOp between all three outputs
    val t = take.asInstanceOf[TakeRowsOp]
    val s = split.asInstanceOf[AssignTrainTestSplitOp]
    assert(t.dataset eq s.dataset.asInstanceOf[OpSpec]) // same instance (memoized construct)
    assert(t.numRows.contains(50L))
    assert(s.testSize.contains(0.25))
    val j = tmpl.asInstanceOf[JinjaTemplatizeOp]
    assert(j.constants == Map("k" -> 7L))
    assert(j.maxLength.contains(100L))

    // and re-serializing reproduces identical uuids
    val rt = Graph.deserialize(Graph.serialize(outputs: _*))
    assert(rt.map(_.uuid) == outputs.map(_.uuid))
  }

  test("multimodal graph hash-matches the external authoring") {
    // fixture from tools/make_golden_multimodal.py: the round-9 binary-
    // column family, authored by an independent canonical-JSON + sha256
    // implementation — field renames/retypes fail UUID verification here
    val in = getClass.getResourceAsStream("/golden_multimodal.json")
    val fixture = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    val outputs = Graph.deserializeString(fixture)
    assert(outputs.map(_.uuid) == Seq(
      "ImageMetaOp_4cf9885d0df2d455dd1b49913cc1abbc6947f729fbdc310a782da17662550b22",
      "ImageEmbedOp_71c79f33fbf8e7141ad084ad4bd057c2f6164b3cf09957c9333637b2cb3c0cc4",
      "AudioMetaOp_8ce97c2d59ec7729c64612e0a033d78a9fa63e34a26ff077a9c02c031e4b77ff",
      "ExplodeFramesOp_e6da502a6ede15a7f69e3da2e86769850ec5d1620578b32b31f39504baac9529"))
    val Seq(meta: ImageMetaOp, embed: ImageEmbedOp, audio: AudioMetaOp,
      frames: ExplodeFramesOp) = outputs: @unchecked
    // shared dataset instance across all four chains (memoized construct)
    val ds = meta.image.asInstanceOf[SelectBinaryColumnOp].dataset
    assert(audio.audio.asInstanceOf[SelectBinaryColumnOp].dataset eq ds)
    assert(frames.video.asInstanceOf[SelectBinaryColumnOp].dataset eq ds)
    val rz = embed.image.asInstanceOf[ImageResizeOp]
    assert(rz.maxSide == 64L && embed.grid == 4L)
    assert(rz.image eq meta.image) // resize and meta share the select
    // re-serializing reproduces identical uuids
    val rt = Graph.deserialize(Graph.serialize(outputs: _*))
    assert(rt.map(_.uuid) == outputs.map(_.uuid))
  }

  test("BPE tokenizer graph hash-matches the external authoring") {
    val in = getClass.getResourceAsStream("/golden_bpe.json")
    val fixture = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    val Seq(tok: BpeTokenizeOp) = Graph.deserializeString(fixture): @unchecked
    assert(tok.uuid ==
      "BpeTokenizeOp_fd504cdf2188487f7de1091862f3ab67cc4b24af91cbeb694ef4817a51084752")
    val trained = tok.tokenizer.asInstanceOf[TrainBpeTokenizerOp]
    assert(trained.numMerges == 8L)
    assert(trained.text eq tok.text) // shared select instance
    assert(Graph.deserialize(Graph.serialize(tok)).head.uuid == tok.uuid)
  }

  test("fully-parameterized UMAP viz graph hash-matches the external authoring") {
    // fixture from tools/make_golden_umap.py: every reference hyperparameter
    // (viz_ops.py:10-52) set to a non-default value — a missing, renamed, or
    // re-typed spec field fails UUID verification on deserialize
    val in = getClass.getResourceAsStream("/golden_umap.json")
    val fixture = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    val Seq(viz: UMAPVizOp) = Graph.deserializeString(fixture): @unchecked
    assert(viz.uuid ==
      "UMAPVizOp_0bad032d08cef361afa13c52d8dd5fb594e75a0b349584280df813ea57678c5c")
    assert(viz.nNeighbors == 30L && viz.metric == "cosine")
    assert(viz.metricKwds.contains(Map("p" -> 2.0)))
    assert(viz.targetNNeighbors == 12L)
    assert(viz.disconnectionDistance.contains(0.75))
    assert(viz.densmap && viz.outputDens && viz.unique)
    // defaulted construction still carries the full surface: field count
    // matches the reference's 30 hyperparameters + the input edge
    assert(viz.productArity == 31)
    val rt = Graph.deserialize(Graph.serialize(viz))
    assert(rt.head.uuid == viz.uuid)
  }

  test("sketch/membership/shard ops round-trip the graph serde") {
    val ds = LoadLocalParquetDatasetOp("abc123", "/tmp/x.parquet")
    val t = SelectTextColumnOp(ds, "text")
    val ops = Seq[OpSpec](
      CmsWordCountsOp(t, depth = 3L, width = 64L, topN = 10L),
      BloomMembershipOp(t,
        SelectTextColumnOp(TakeRowsOp(ds, numRows = Some(5L)), "text"),
        numHashes = 4L, numBits = 128L),
      EpochShardOp(ds, epoch = 2L, numShards = 16L),
      ChunkTextOp(t, size = 64L, overlap = 16L))
    val rt = Graph.deserialize(Graph.serialize(ops: _*))
    assert(rt == ops)
    assert(rt.map(_.uuid) == ops.map(_.uuid))
  }
}
