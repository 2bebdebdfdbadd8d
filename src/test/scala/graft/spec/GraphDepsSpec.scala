package graft.spec

import org.scalatest.funsuite.AnyFunSuite

/** `Graph.dependencies` against the reference's
  * `test_graph_transformations.py` semantics: path tracking through fields,
  * seq indices and map keys; recursive vs direct; type-filter pruning;
  * root exclusion; multi-root dedup; inter-root detection.
  */
class GraphDepsSpec extends AnyFunSuite {

  private val ds = LoadInlineJsonDatasetOp(Map("t" -> Seq("a", "b")))
  private val text = SelectTextColumnOp(ds, "t")
  private val cat = SelectCategoricalColumnOp(ds, "t")
  private val keep = CategoryToBooleanOp(cat, Some(Seq("a")))
  private val masked = MaskRowsOp(ds, keep)

  test("recursive: all transitive deps, roots excluded, post-order") {
    val deps = Graph.dependencies(Seq(masked))
    val uuids = deps.map(_._1.uuid)
    assert(uuids.toSet == Set(ds.uuid, cat.uuid, keep.uuid))
    assert(!uuids.contains(masked.uuid))
    // post-order: a node's own deps are recorded before it
    assert(uuids.indexOf(cat.uuid) < uuids.indexOf(keep.uuid))
  }

  test("non-recursive stops at direct children") {
    val deps = Graph.dependencies(Seq(masked), recursive = false)
    assert(deps.map(_._1.uuid).toSet == Set(ds.uuid, keep.uuid))
  }

  test("field paths: plain field, seq index, map key") {
    val byUuid = Graph.dependencies(Seq(masked))
      .map { case (op, p) => op.uuid -> p }.toMap
    assert(byUuid(keep.uuid) == Seq("mask"))
    // first visit wins: cat is reached through the mask chain, so its path
    // threads through keep's field, mirroring the reference's accumulation
    assert(byUuid(cat.uuid) == Seq("mask", "input_category"))

    val g = GroupedOp(Seq(AssignRowIDOp(ds), AssignTrainTestSplitOp(ds)))
    val gPaths = Graph.dependencies(Seq(g), recursive = false).map(_._2)
    assert(gPaths.contains(Seq("ops", 0)) && gPaths.contains(Seq("ops", 1)))

    val tmpl = JinjaTemplatizeOp("{{x}}", Map("x" -> text))
    val tPaths = Graph.dependencies(Seq(tmpl), recursive = false).map(_._2)
    assert(tPaths == Seq(Seq("context", "x")))
  }

  test("type filter prunes result AND descent (reference isinstance gate)") {
    val only = Graph.dependencies(Seq(masked),
      typeFilter = op => op.isInstanceOf[BooleanColumnType] ||
        op.isInstanceOf[MaskRowsOp])
    // keep matches; its parent cat is behind a matching node but is itself
    // filtered out; ds behind non-matching cat never surfaces
    assert(only.map(_._1.uuid) == Seq(keep.uuid))
  }

  test("multi-root: shared deps dedup to first visit") {
    val deps = Graph.dependencies(Seq(keep, masked))
    assert(deps.count(_._1.uuid == ds.uuid) == 1)
    assert(deps.count(_._1.uuid == cat.uuid) == 1)
  }

  test("interRootDependencies finds roots other roots depend on") {
    assert(Graph.interRootDependencies(Seq(keep, masked)).map(_.uuid) ==
      Seq(keep.uuid))
    assert(Graph.interRootDependencies(Seq(text, keep)).isEmpty)
  }
}
