package graft

import org.apache.spark.sql.functions._

/** ANN recall@10 scoreboard (`similarity_recall`): every approximate
  * probe family graded against the exact brute-force top-10 at
  * deliberately DEGRADED settings (nprobe=1, single LSH band, JL-reduced
  * ranking without rerank). The floors pin each method in its expected
  * recall band — a silent recall collapse (broken signature, wrong probe
  * cell, mis-scaled quantization) trips the lower bound, while the upper
  * bound (< 1) certifies the fixture actually measures the approximate
  * regime rather than degenerating to exact search. sf0.001 observed:
  * int8 .7531, ivf_nprobe1 .6156, rp16 .1906, lsh_band1 .1031. */
class RecallSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows: Map[String, (Long, Long, Long)] =
    SparkEntry.queries("similarity_recall")(spark, sfDir)
      .select(col("method"), col("hits"), col("total"), col("recall_bp"))
      .as[(String, Long, Long, Long)].collect()
      .map { case (m, h, t, bp) => m -> (h, t, bp) }.toMap

  test("scoreboard covers all four probe families over the full fixture") {
    assert(rows.keySet ===
      Set("ivf_nprobe1", "lsh_band1", "int8", "rp16"))
    rows.foreach { case (m, (_, total, _)) =>
      assert(total === 320L, s"$m graded against $total exact hits, not 320")
    }
  }

  test("recall_bp is consistent with hits/total") {
    rows.foreach { case (m, (hits, total, bp)) =>
      assert(bp === hits * 10000L / total, s"$m recall_bp inconsistent")
    }
  }

  test("every method stays above its recall floor") {
    // floors leave headroom below the observed values so parameter or
    // data tweaks don't flap the suite, but a collapse still fails
    val floors = Map(
      "int8" -> 6500L,        // near-exact: only quantization reorder
      "ivf_nprobe1" -> 5000L, // one probed cell out of ~√n
      "rp16" -> 1200L,        // 64→16 JL reduction, no rerank
      "lsh_band1" -> 500L)    // single 12-bit band, candidate-starved
    floors.foreach { case (m, floor) =>
      assert(rows(m)._3 >= floor,
        s"$m recall ${rows(m)._3}bp fell below floor ${floor}bp")
    }
  }

  test("the fixture measures the approximate regime: every recall < 1") {
    rows.foreach { case (m, (_, _, bp)) =>
      assert(bp < 10000L, s"$m at full recall — fixture degenerated to exact")
    }
  }

  test("methods order as expected: int8 > ivf > {rp, lsh}") {
    assert(rows("int8")._3 > rows("ivf_nprobe1")._3)
    assert(rows("ivf_nprobe1")._3 > rows("rp16")._3)
    assert(rows("ivf_nprobe1")._3 > rows("lsh_band1")._3)
  }

  test("recall sweep is monotone in nprobe and the curve actually rises") {
    val sw = SparkEntry.queries("similarity_recall_sweep")(spark, sfDir)
      .select(col("nprobe"), col("recall_bp"))
      .as[(Int, Long)].collect().sortBy(_._1).toSeq
    assert(sw.map(_._1) === Seq(1, 2, 4))
    // widening the probe set can only add candidates: recall is monotone
    sw.sliding(2).foreach { case Seq((_, lo), (_, hi)) => assert(lo <= hi) }
    assert(sw.last._2 > sw.head._2, s"flat curve: $sw")
    // nprobe=1 must agree with the scoreboard's ivf_nprobe1 row
    assert(sw.head._2 === rows("ivf_nprobe1")._3)
  }
}
