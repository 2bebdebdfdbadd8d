package graft.ext

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the product-quantization kernel (pure JVM — no
  * Spark): code range/determinism, exact representability of
  * codeword-composed vectors, reconstruction-norm consistency, and the
  * LUT ⇄ direct-dot agreement ADC scoring rests on.
  */
object PqProps extends Properties("graft.ext.Similarity.PqCodebooks") {

  private val genShape = for {
    m <- Gen.choose(1, 4)
    dsub <- Gen.choose(1, 6)
    ksub <- Gen.choose(2, 8)
  } yield (m, dsub, ksub)

  private def genCb(m: Int, dsub: Int, ksub: Int): Gen[Similarity.PqCodebooks] =
    Gen.listOfN(m * ksub * dsub, Gen.choose(-1.0f, 1.0f)).map { flat =>
      val words = Array.tabulate(m, ksub) { (s, j) =>
        flat.slice((s * ksub + j) * dsub, (s * ksub + j + 1) * dsub).toArray
      }
      new Similarity.PqCodebooks(m, dsub, words)
    }

  private def genVec(d: Int): Gen[Seq[Float]] =
    Gen.listOfN(d, Gen.choose(-1.0f, 1.0f)).map(_.toSeq)

  property("codes are in range and encoding is deterministic") =
    forAll(genShape.flatMap { case (m, dsub, ksub) =>
      genCb(m, dsub, ksub).flatMap(cb => genVec(m * dsub).map(v => (cb, v)))
    }) { case (cb, v) =>
      val c1 = cb.encode(v); val c2 = cb.encode(v)
      c1.sameElements(c2) && c1.forall(j => j >= 0 && j < cb.ksub)
    }

  property("codeword-composed vectors reconstruct to themselves") =
    forAll(genShape.flatMap { case (m, dsub, ksub) =>
      for {
        cb <- genCb(m, dsub, ksub)
        picks <- Gen.listOfN(m, Gen.choose(0, ksub - 1))
      } yield (cb, picks)
    }) { case (cb, picks) =>
      // v = concat of words(s)(picks(s)) is at L2 distance 0 from its own
      // codeword per subspace; the argmin's chosen codeword must carry the
      // SAME VALUES (a tie between identical codewords resolves to the
      // smaller index, so compare values, not indices)
      val v = (0 until cb.m).flatMap(s => cb.words(s)(picks(s))).map(x => x: Float)
      val codes = cb.encode(v)
      (0 until cb.m).forall { s =>
        cb.words(s)(codes(s)).sameElements(cb.words(s)(picks(s)))
      }
    }

  property("recNorm2 equals the reconstruction's squared norm") =
    forAll(genShape.flatMap { case (m, dsub, ksub) =>
      genCb(m, dsub, ksub).flatMap(cb => genVec(m * dsub).map(v => (cb, v)))
    }) { case (cb, v) =>
      val codes = cb.encode(v)
      val rec = (0 until cb.m).flatMap(s => cb.words(s)(codes(s)))
      val naive = rec.map(x => x.toDouble * x).sum
      math.abs(cb.recNorm2(codes) - naive) <= 1e-9 * math.max(1.0, naive)
    }

  property("LUT gather equals the direct query-reconstruction dot") =
    forAll(genShape.flatMap { case (m, dsub, ksub) =>
      for {
        cb <- genCb(m, dsub, ksub)
        v <- genVec(m * dsub)
        q <- genVec(m * dsub)
      } yield (cb, v, q)
    }) { case (cb, v, q) =>
      val codes = cb.encode(v)
      val lut = cb.lut(q)
      // the ADC numerator: per-subspace LUT entries summed in s order —
      // exactly the dots the LUT tabulates, so equality is EXACT
      val viaLut = (0 until cb.m).map(s => lut(s * cb.ksub + codes(s))).sum
      val direct = (0 until cb.m).map { s =>
        val w = cb.words(s)(codes(s))
        var dp = 0.0; var i = 0
        while (i < cb.dsub) { dp += q(s * cb.dsub + i).toDouble * w(i); i += 1 }
        dp
      }.sum
      viaLut == direct
    }
}
