package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based laws for the pure (driver-side) algorithmic kernels —
  * example-based specs pin known answers; these pin the INVARIANTS for
  * arbitrary inputs (ScalaCheck's seeded generators keep runs
  * reproducible).
  */
object KernelProps extends Properties("graft.kernels") {

  property("hamming2 probe family: complete, distinct, within radius") =
    forAll(Gen.choose(0L, Long.MaxValue), Gen.choose(2, 16)) { (raw, nBits) =>
      val sig = raw & ((1L << nBits) - 1)
      val probes = Ann.hamming2ProbesLocal(sig, nBits)
      probes.forall(p => java.lang.Long.bitCount(p ^ sig) <= 2) &&
        probes.contains(sig) &&
        probes.distinct.size == probes.size &&
        probes.size == 1 + nBits + nBits * (nBits - 1) / 2 &&
        probes.forall(p => (p & ~((1L << nBits) - 1)) == 0L)
    }

  property("dotLocal: linearity in the scalar and symmetry") =
    forAll(Gen.listOfN(8, Gen.choose(-100, 100)),
      Gen.listOfN(8, Gen.choose(-100, 100))) { (xs, ys) =>
      val a = xs.map(_.toFloat).toArray
      val b = ys.map(_.toFloat).toArray
      // integral-valued floats: double accumulation is exact, so these
      // algebraic identities hold with == (no epsilon)
      Ann.dotLocal(a, b) == Ann.dotLocal(b, a) &&
        Ann.dotLocal(a.map(_ * 2f), b) == 2.0 * Ann.dotLocal(a, b)
    }

  property("stubEnergy: bounded by max byte deviation, zero iff centered") =
    forAll(Gen.listOf(Gen.choose(0, 255))) { bytes =>
      val w = bytes.map(_.toByte).toArray
      val e = Multimodal.stubEnergy(w)
      val maxDev =
        if (w.isEmpty) 0.0 else bytes.map(b => math.abs(b - 128.0)).max
      e >= 0.0 && e <= maxDev + 1e-9 &&
        ((e == 0.0) == bytes.forall(_ == 128) || w.isEmpty)
    }

  property("stubResize: exact length, values within byte range") =
    forAll(Gen.listOf(Gen.choose(0, 255)), Gen.choose(1, 32)) { (bytes, res) =>
      val out = Multimodal.stubResize(bytes.map(_.toByte).toArray, res)
      out.length == res && out.forall(v => v >= 0f && v <= 255f)
    }
}
