package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{RollingHash, Shingles}

/** Property-based coverage (ScalaCheck) for the pure expression kernels —
  * no Spark session needed, so these run the full generator budget fast. */
object KernelProps extends Properties("graft.kernels") {

  private def refHash(s: String): Long = {
    var h = 0L
    s.codePoints().toArray.foreach(cp => h = (h * 131 + cp) % 1000000007L)
    h
  }

  private val textGen: Gen[String] = Gen.chooseNum(0, 60).flatMap { n =>
    Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.const(' '), 1 -> Gen.oneOf('中', 'ß', 'é')
    )).map(_.mkString)
  }

  property("rollingHash equals the codepoint fold") =
    forAll(textGen) { s =>
      RollingHash.compute(UTF8String.fromString(s)) == refHash(s)
    }

  property("window hashes equal per-substring hashes at every offset") =
    forAll(textGen, Gen.chooseNum(1, 10)) { (s, w) =>
      val got = RollingHash.computeWindows(UTF8String.fromString(s), w)
        .toLongArray().toSeq
      // reference over code points (CJK chars are one code point)
      val cps = s.codePoints().toArray
      val want =
        if (cps.length < w) Seq.empty
        else (0 to cps.length - w).map { i =>
          refHash(new String(cps, i, w))
        }
      got == want
    }

  property("shingles equal the distinct sliding n-grams of the space-split") =
    forAll(textGen, Gen.chooseNum(1, 4)) { (s, n) =>
      val got = Shingles.compute(UTF8String.fromString(s), n)
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
      val words = s.split(" ", -1).toSeq
      val want =
        if (words.length < n) Seq.empty
        else words.sliding(n).map(_.mkString(" ")).toSeq.distinct
      got == want
    }

  property("progress line always carries two fixed-format numbers") =
    forAll(Gen.chooseNum(0L, 1000L), Gen.chooseNum(0L, 1000L),
      Gen.chooseNum(0.0, 1e6)) { (up, extra, rate) =>
      val total = up + extra
      val line = graft.sink.Reports.progressLine(up, total, rate)
      line.matches("""\d+\.\d{8}% Uploaded at \d+\.\d{2} uploads/second""")
    }
}
