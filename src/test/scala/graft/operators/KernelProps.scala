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

  property("PNG codec: encode∘decode is the identity on gray pixels") =
    forAll(Gen.choose(1, 12), Gen.choose(1, 12)) { (w, h) =>
      forAll(Gen.listOfN(w * h, Gen.choose(0, 255))) { pixels =>
        val px = pixels.toArray
        val (dw, dh, back) = Multimodal.Codecs.decodeGray(
          Multimodal.Codecs.encodePng(w, h, px))
        dw == w && dh == h && back.sameElements(px)
      }
    }

  property("WAV codec: encode∘decode is the identity on 16-bit PCM") =
    forAll(Gen.listOf(Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt))) { xs =>
      val samples = xs.map(_.toShort).toArray
      Multimodal.Codecs.decodeWav(
        Multimodal.Codecs.encodeWav(samples)).sameElements(samples)
    }

  property("rms: in [0,1+ε], bounded by max |sample|, zero iff silent") =
    forAll(Gen.listOf(Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt))) { xs =>
      val s = xs.map(_.toShort).toArray
      val e = Multimodal.Codecs.rms(s, 0, s.length)
      val maxAmp = if (s.isEmpty) 0.0 else xs.map(v => math.abs(v / 32768.0)).max
      e >= 0.0 && e <= maxAmp + 1e-12 &&
        ((e == 0.0) == s.forall(_ == 0))
    }

  property("blockResize: exact length, values within pixel range") =
    forAll(Gen.choose(1, 10), Gen.choose(1, 10), Gen.choose(1, 8)) { (w, h, res) =>
      forAll(Gen.listOfN(w * h, Gen.choose(0, 255))) { pixels =>
        val out = Multimodal.Codecs.blockResize(w, h, pixels.toArray, res)
        out.length == res * res && out.forall(v => v >= 0f && v <= 255f)
      }
    }

  property("frame container: pack∘unpack is the identity") =
    forAll(Gen.listOf(Gen.listOf(Gen.choose(-128, 127)))) { framesList =>
      val frames = framesList.map(_.map(_.toByte).toArray)
      val back = Multimodal.Codecs.unpackFrames(
        Multimodal.Codecs.packFrames(frames))
      back.length == frames.length &&
        back.zip(frames).forall { case (a, b) => a.sameElements(b) }
    }

  property("dHash: invariant under ANY strictly increasing tone map; aHash only affine") =
    forAll(Gen.listOfN(64, Gen.choose(0, 30)),
      Gen.choose(1, 4), Gen.choose(0, 50)) { (raw, a, b) =>
      // pixels on a ×8 lattice; strictly increasing integer maps stay
      // strict on it (slope ≥ 1 on the lattice spacing), so every
      // pairwise order — and therefore the dHash — is preserved; the
      // same holds for aHash ONLY because this map is affine (cell
      // means are exact here: 1-pixel cells, integer values < 2²⁴)
      val px = raw.map(_ * 8).toArray
      val affine = px.map(p => a * p + b) // ≤ 4·240+50, within Int
      Multimodal.dHash64(8, 8, px) == Multimodal.dHash64(8, 8, affine) &&
        Multimodal.aHash64(8, 8, px) == Multimodal.aHash64(8, 8, affine)
    }

  property("dHash: the convex tone curve preserves the hash on spaced pixels") =
    forAll(Gen.listOfN(64, Gen.choose(0, 31))) { raw =>
      // p·(p+255)/510 gains ≥ 4 per +8 input step (d(2p+263)/510 at
      // d = 8), so ×8-lattice pixels keep strict order through the
      // floor — the m06 invariance class, fuzzed
      val px = raw.map(_ * 8).toArray
      val toned = px.map(p => (p * (p + 255)) / 510)
      Multimodal.dHash64(8, 8, px) == Multimodal.dHash64(8, 8, toned)
    }
}
