package graft.spec

import org.scalacheck.{Arbitrary, Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the frozen canonical JSON and the spec layer's
  * identity algebra (pure — no Spark). */
object JsonProps extends Properties("graft.spec") {

  // ---------- generators ----------

  private val genLeaf: Gen[JValue] = Gen.oneOf(
    Gen.const(JNull),
    Arbitrary.arbitrary[Boolean].map(JBool(_)),
    Arbitrary.arbitrary[Long].map(JLong(_)),
    // finite doubles only: NaN/Inf render as strings by design (not round-trippable)
    Arbitrary.arbitrary[Double].suchThat(d => !d.isNaN && !d.isInfinite).map(JDouble(_)),
    Gen.asciiPrintableStr.map(JString(_)),
    Gen.oneOf("\n", "\t", "\"", "\\", "héllo", "日本", "").map(JString(_)))

  private def genJson(depth: Int): Gen[JValue] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      3 -> genLeaf,
      1 -> Gen.listOfN(3, genJson(depth - 1)).map(xs => JArr(xs.toVector)),
      1 -> Gen.listOfN(3, Gen.zip(Gen.alphaNumStr, genJson(depth - 1)))
        .map(kvs => JObj(scala.collection.immutable.ListMap(kvs: _*))))

  // ---------- canonical JSON ----------

  property("render/parse round-trip is identity on canonical form") =
    forAll(genJson(3)) { v =>
      val rendered = Json.render(v)
      Json.render(Json.parse(rendered)) == rendered
    }

  property("rendering is key-order independent") =
    forAll(Gen.listOfN(4, Gen.zip(Gen.alphaNumStr, genLeaf))) { kvs0 =>
      val kvs = kvs0.distinctBy(_._1) // JSON objects have unique keys
      val a = JObj(scala.collection.immutable.ListMap(kvs: _*))
      val b = JObj(scala.collection.immutable.ListMap(kvs.reverse: _*))
      Json.render(a) == Json.render(b)
    }

  property("pretty and compact forms parse to the same value") =
    forAll(genJson(3)) { v =>
      Json.render(Json.parse(Json.renderPretty(v))) == Json.render(v)
    }

  // ---------- spec identity ----------

  private val genDs: Gen[LoadLocalParquetDatasetOp] = for {
    h <- Gen.identifier
    p <- Gen.identifier
  } yield LoadLocalParquetDatasetOp(h, s"/data/$p.parquet")

  private val genTake: Gen[TakeRowsOp] = for {
    ds <- genDs
    skip <- Gen.choose(1L, 9L)
    offset <- Gen.choose(0L, 9L)
    n <- Gen.option(Gen.choose(1L, 99L))
  } yield TakeRowsOp(ds, skip, offset, n)

  property("uuid is a pure function of content") = forAll(genTake) { op =>
    op.uuid == TakeRowsOp(op.dataset, op.skip, op.offset, op.numRows).uuid
  }

  property("uuid ignores excluded fields, tracks content hash") =
    forAll(genDs, Gen.identifier) { (ds, newPath) =>
      val moved = ds.copy(filePath = s"/elsewhere/$newPath")
      val changed = ds.copy(contentHash = ds.contentHash + "X")
      moved.uuid == ds.uuid && changed.uuid != ds.uuid
    }

  property("graph serialization round-trips any take chain") =
    forAll(genTake) { op =>
      Graph.deserialize(Graph.serialize(op)) == Seq(op)
    }

  property("subs identity: replacing a node with itself preserves uuid") =
    forAll(genTake) { op =>
      op.subs(op.dataset, op.dataset).uuid == op.uuid
    }

  property("subs replaces transitively and changes uuid") =
    forAll(genTake, genDs) { (op, other) =>
      Prop(op.dataset.uuid != other.uuid) ==> Prop {
        val swapped = op.subs(op.dataset, other).asInstanceOf[TakeRowsOp]
        swapped.dataset == other && swapped.uuid != op.uuid &&
          swapped.skip == op.skip && swapped.offset == op.offset
      }
    }

  property("TakeRows closed-form re-index matches python slice semantics") =
    forAll(Gen.choose(0, 40), Gen.choose(1L, 7L), Gen.choose(0L, 12L),
      Gen.option(Gen.choose(0L, 20L))) { (n, skip, offset, numRows) =>
      // the runner's filter form: keep old idx i with i>=offset,
      // (i-offset)%skip==0, and (i-offset)/skip < numRows
      val kept = (0L until n.toLong).filter(i =>
        i >= offset && (i - offset) % skip == 0 &&
          numRows.forall(m => (i - offset) / skip < m))
      // python reference semantics: range(n)[offset::skip][:numRows]
      val expected0 = offset.until(n.toLong, skip.toLong).toVector
      val expected = numRows.fold(expected0)(m =>
        expected0.take(math.min(m, Int.MaxValue).toInt))
      kept.toVector == expected
    }
}
