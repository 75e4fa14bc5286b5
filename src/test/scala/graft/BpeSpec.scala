package graft

/** Full BPE trainer vs a driver-side reference implementation of the
  * public construction (Sennrich et al. 2016): same tokenization, same
  * greedy left-to-right merge application, same (n desc, lhs, rhs)
  * tie-break. Fixtures deliberately include overlapping runs (`aaaaa`
  * → greedy gives [aa, aa, a], not [aa, a, aa]) and exact ties. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def referenceTrain(docs: Seq[String], k: Int): Seq[(Int, String, String, String, Long)] = {
    val words = scala.collection.mutable.Map.empty[List[String], Long]
    for (d <- docs; w <- d.trim.toLowerCase.split("\\s+") if w.length >= 2)
      words(w.map(_.toString).toList) = words.getOrElse(w.map(_.toString).toList, 0L) + 1L
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    for (step <- 1 to k) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- words; p <- syms.zip(syms.tail))
        counts(p) = counts.getOrElse(p, 0L) + f
      if (counts.nonEmpty) {
        val ((a, b), n) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((step, a, b, a + b, n))
        def mergeWord(syms: List[String]): List[String] = syms match {
          case x :: y :: rest if x == a && y == b => (a + b) :: mergeWord(rest)
          case x :: rest => x :: mergeWord(rest)
          case Nil => Nil
        }
        val next = scala.collection.mutable.Map.empty[List[String], Long]
        for ((syms, f) <- words) {
          val m = mergeWord(syms)
          next(m) = next.getOrElse(m, 0L) + f
        }
        words.clear(); words ++= next
      }
    }
    out.toSeq
  }

  private def check(docs: Seq[String], k: Int): Unit = {
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = graft.operators.Bpe.train(spark, df, k).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq.sortBy(_._1)
    assert(got == referenceTrain(docs, k),
      s"trained merges ${got} != reference ${referenceTrain(docs, k)}")
  }

  test("overlapping runs merge greedily left-to-right (aaaaa -> aa aa a)") {
    check(Seq("aaaaa aaaaa", "aaaaa aaa", "bb bb bb"), 4)
  }

  test("merged tokens participate in later merges (full vocab growth)") {
    // 'th' then 'the' should emerge from english-ish repetition
    check(Seq(
      "the cat sat on the mat", "the dog ate the food",
      "then there was the thing", "that is the theme",
      "she sells sea shells", "the the the"), 8)
  }

  test("exact ties break on (lhs, rhs) ordering") {
    // 'ab' and 'cd' tie at the first step: 'ab' must win (a < c)
    check(Seq("ab cd", "ab cd", "ab cd"), 3)
  }

  test("training is exhaustion-safe: stops early when no pairs remain") {
    val df = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val got = graft.operators.Bpe.train(spark, df, 10).collect()
    assert(got.length == 1) // only one pair exists; then every word is a single symbol
    assert(got(0).getString(3) == "ab")
  }

  /** Reference encode: replay merges in rank order over a word's symbol
    * list with the same greedy left-to-right application. */
  private def referenceEncode(w: String, merges: Seq[(String, String)]): Int =
    merges.foldLeft(w.map(_.toString).toList) { case (syms, (a, b)) =>
      def m(s: List[String]): List[String] = s match {
        case x :: y :: rest if x == a && y == b => (a + b) :: m(rest)
        case x :: rest => x :: m(rest)
        case Nil => Nil
      }
      m(syms)
    }.length

  test("encodeStats matches the reference encode per doc, with sane bounds") {
    val docs = Seq(
      "the cat sat on the mat", "the dog ate the food",
      "then there was the thing", "aaaaa aaaaa b",
      "x yz the then")
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val merges = referenceTrain(docs, 8).map(m => (m._2, m._3))
    val got = graft.operators.Bpe.encodeStats(df, merges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.keySet === docs.indices.map(_.toLong).toSet)
    docs.zipWithIndex.foreach { case (text, i) =>
      val words = text.trim.toLowerCase.split("\\s+").toSeq
      val (nTok, nChars, nSyms, ratio) = got(i.toLong)
      assert(nTok === words.length.toLong)
      assert(nChars === words.map(_.length).sum.toLong)
      assert(nSyms === words.map(referenceEncode(_, merges)).sum.toLong,
        s"doc $i symbol count")
      assert(nSyms >= nTok && nSyms <= nChars) // every token >= 1 symbol; merges only shrink
      assert(ratio === nChars * 10000L / nSyms)
    }
  }
}
