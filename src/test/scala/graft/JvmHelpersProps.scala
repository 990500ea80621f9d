package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.functions.{TextFunctions, Transforms, VectorFunctions}
import graft.operators.Dedup
import graft.etl.CreditTypes

/** ScalaCheck properties for the pure-JVM halves of the function library
 * (plan-time constants, hash derivations, the credit-type expansion) —
 * no SparkSession needed, so these run wide and fast. */
object JvmHelpersProps extends Properties("JvmHelpers") {

  property("hash60Jvm is a total 60-bit non-negative hash") =
    Prop.forAll(Gen.asciiPrintableStr) { s =>
      val h = TextFunctions.hash60Jvm(s)
      h >= 0L && h < (1L << 60)
    }

  property("minhash coefficients: a odd and 30-bit, b 30-bit") =
    Prop.forAll(Gen.choose(0, 4096)) { i =>
      val a = Dedup.mhCoeffA(i); val b = Dedup.mhCoeffB(i)
      a % 2 == 1 && a > 0 && a < (1L << 30) && b >= 0 && b < (1L << 30)
    }

  property("minhash permutation values stay under 2^61 (oracle-safe int64)") =
    Prop.forAll(Gen.choose(0, 4096), Gen.choose(0L, Dedup.MhMask)) { (i, h) =>
      val v = Dedup.mhCoeffA(i) * h + Dedup.mhCoeffB(i)
      v >= 0 && v < (1L << 61)
    }

  property("hyperplane weights lie in [-1, 1] and are deterministic") =
    Prop.forAll(Gen.choose(0, 64), Gen.choose(0, 1024)) { (b, i) =>
      val w = VectorFunctions.planeWeight(b, i)
      w >= -1.0 && w <= 1.0 && w == VectorFunctions.planeWeight(b, i)
    }

  // The reference's recursive macro expansion (GcdStoryCredit.java:86-90),
  // restated independently; CreditTypes.expansion must equal its closure.
  private val parts: Map[Int, Seq[Int]] = Map(
    7 -> Seq(2, 3), 8 -> Seq(2, 3, 4), 10 -> Seq(1, 2, 3),
    11 -> Seq(1, 2, 3, 4), 12 -> Seq(1, 2, 3, 5), 13 -> Seq(1, 2, 3, 4, 5))
  private def recurse(id: Int): Seq[Int] =
    parts.get(id) match {
      case Some(ps) => ps.flatMap(recurse)
      case None => Seq(id)
    }

  property("credit-type expansion equals the recursive closure") =
    Prop.forAll(Gen.choose(1, 13)) { id =>
      CreditTypes.expansion(id) == recurse(id) &&
        CreditTypes.expansion(id).forall(CreditTypes.baseField.contains)
    }

  property("snapshot date helpers agree with java.time at GMT-06:00") =
    Prop.forAll(Gen.choose(1990, 2035), Gen.choose(1, 12), Gen.choose(1, 28)) {
      (y, m, d) =>
        val s = s"$y-$m-$d"
        val expectEpoch = java.time.ZonedDateTime
          .of(y, m, d, 0, 0, 0, 0, java.time.ZoneOffset.ofHours(-6))
          .toEpochSecond
        Transforms.snapshotEpoch(s) == expectEpoch &&
          Transforms.snapshotYmd(s) == y * 10000 + m * 100 + d
    }
}
