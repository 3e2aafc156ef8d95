package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Structural pins on the CAVLC table transcriptions (no third-party
  * H.264 implementation exists in this sandbox, so conformance of the
  * deep rows cannot be differentially validated — see FIXTURES.md; these
  * pins catch the transcription-slip classes that CAN be caught
  * structurally, and the roundtrip fuzz in H264CodecSpec exercises every
  * wired row through the shared encoder/decoder). */
class H264TableShapeSpec extends AnyFunSuite {

  private def assertPrefixFree(name: String, codes: Seq[(Int, Int)]): Unit = {
    assert(codes.distinct.size == codes.size, s"$name: duplicate codewords")
    for (Seq((l1, b1), (l2, b2)) <- codes.combinations(2)) {
      val (shortL, shortB, longL, longB) =
        if (l1 <= l2) (l1, b1, l2, b2) else (l2, b2, l1, b1)
      assert(!(shortB == (longB >> (longL - shortL))),
        s"$name: ($shortL,$shortB) is a prefix of ($longL,$longB)")
    }
  }

  test("coeff_token columns: prefix-free, complete (tc,t1) keys, lens <= 16") {
    val cols = H264Codec.coeffTokenTableForTest
    assert(cols.length == 3)
    for ((col, ci) <- cols.zipWithIndex) {
      assertPrefixFree(s"coeff_token col $ci", col.map(e => (e._1, e._2)))
      assert(col.forall(e => e._1 >= 1 && e._1 <= 16))
      val keys = col.map(e => (e._3, e._4)).toSet
      val maxTc = Seq(16, 13, 12)(ci) // columns 1/2 wired through TC 13/12
      val expected = (for (tc <- 0 to maxTc; t1 <- 0 to math.min(3, tc)) yield (tc, t1)).toSet
      assert(keys == expected, s"col $ci (tc,t1) coverage")
    }
  }

  test("total_zeros columns: prefix-free AND complete codes (Kraft sum 1)") {
    val cols = H264Codec.totalZerosTableForTest
    assert(cols.length == 15)
    for ((col, i) <- cols.zipWithIndex) {
      val tc = i + 1
      assert(col.map(_._3).sorted == (0 to 16 - tc).toList, s"tc=$tc tz range")
      assertPrefixFree(s"total_zeros tc=$tc", col.map(e => (e._1, e._2)))
      // complete prefix codes, except the tc=1 column where the spec
      // leaves exactly one 9-bit code (000000000) unused
      val kraft = col.map(e => BigDecimal(1) / BigDecimal(1 << e._1)).sum
      val expected = if (tc == 1) BigDecimal(511) / BigDecimal(512) else BigDecimal(1)
      assert(kraft == expected, s"tc=$tc Kraft sum $kraft")
    }
  }

  test("coded_block_pattern intra mapping is a permutation of 0..47") {
    val t = H264Codec.cbpIntraTableForTest
    assert(t.length == 48)
    assert(t.sorted.toSeq == (0 until 48).toSeq)
    // the four corner entries every bitstream book prints: 0->47, 3->0,
    // and the cbp values the encoder emits (0 -> codeNum 3, 1 -> 29)
    assert(t(0) == 47 && t(3) == 0 && t(29) == 1)
  }

  test("run_before + total_zeros + levels: residual roundtrip fuzz over every nC class") {
    val rnd = new scala.util.Random(20260814)
    for (trial <- 0 until 4000) {
      val nC = Seq(0, 1, 2, 3, 4, 7, 8, 16)(rnd.nextInt(8))
      val maxCoeff = if (rnd.nextBoolean()) 16 else 15
      // the 2<=nC<4 / 4<=nC<8 columns are wired through TotalCoeff 13 / 12
      val tcCap = math.min(maxCoeff,
        if (nC >= 2 && nC < 4) 13 else if (nC >= 4 && nC < 8) 12 else 16)
      val tc = rnd.nextInt(tcCap + 1)
      val scan = new Array[Int](maxCoeff)
      val positions = rnd.shuffle((0 until maxCoeff).toList).take(tc)
      for (p <- positions) {
        val mag = 1 + (if (rnd.nextInt(4) == 0) rnd.nextInt(900) else rnd.nextInt(6))
        scan(p) = if (rnd.nextBoolean()) mag else -mag
      }
      val back = H264Codec.residualRoundtripForTest(scan, nC)
      assert(back.sameElements(scan),
        s"trial $trial nC=$nC max=$maxCoeff tc=$tc: ${scan.mkString(",")} -> ${back.mkString(",")}")
    }
  }
}
