package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BpeExpressions
import graft.operators.Bpe

class BpeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def syms(s: String) = s.map(_.toString).toArray

  /** reference greedy: walk a cursor, merge at the first match, never
    * reuse a consumed position — the definitionally-correct O(n) form
    * the kernel must equal. */
  private def naiveGreedy(in: Array[String], l: String, r: String): Vector[String] = {
    var i = 0
    val out = Vector.newBuilder[String]
    while (i < in.length) {
      if (i + 1 < in.length && in(i) == l && in(i + 1) == r) { out += (l + r); i += 2 }
      else { out += in(i); i += 1 }
    }
    out.result()
  }

  test("applyMerge is greedy left-to-right, including self-pair runs") {
    assert(BpeExpressions.applyMerge(syms("abab"), "a", "b", "ab").toSeq ==
      Seq("ab", "ab"))
    // odd self-pair run: aaa → (aa)(a); even: aaaa → (aa)(aa)
    assert(BpeExpressions.applyMerge(syms("aaa"), "a", "a", "aa").toSeq ==
      Seq("aa", "a"))
    assert(BpeExpressions.applyMerge(syms("aaaa"), "a", "a", "aa").toSeq ==
      Seq("aa", "aa"))
    // merged positions are consumed: in "aab" the (a,a) merge eats both
    // a's, so no (a,b) adjacency is created for a LATER scan of the
    // same merge — but (aa,b) is
    assert(BpeExpressions.applyMerge(syms("aab"), "a", "b", "ab").toSeq ==
      Seq("a", "ab"))
  }

  test("applyMerge equals the naive greedy on random symbol strings") {
    val rnd = new scala.util.Random(19)
    val alphabet = Array("a", "b", "ab", "c")
    (1 to 500).foreach { _ =>
      val in = Array.fill(rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.length)))
      val (l, r) = (alphabet(rnd.nextInt(alphabet.length)),
        alphabet(rnd.nextInt(alphabet.length)))
      assert(BpeExpressions.applyMerge(in, l, r, l + r).toSeq ==
        naiveGreedy(in, l, r),
        s"in=${in.mkString("|")} merge=($l,$r)")
    }
  }

  test("trainMerges picks the frequency-weighted argmax with deterministic ties") {
    // (a,b): 2 occurrences x count 3 = 6; (b,a): 1x3 + 1x5 = 8 — the
    // count weighting flips the raw-occurrence winner
    val vocab = Seq(("abab", 3L), ("ba", 5L))
    val merges = Bpe.trainMerges(vocab)
    assert(merges.head.left == "b" && merges.head.right == "a")
    assert(merges.head.pairN == 8L, "1x3 from abab + 1x5 from ba")
    // ties break lexicographically: two pairs at equal weighted count
    val tied = Bpe.trainMerges(Seq(("xy", 2L), ("uv", 2L)))
    assert(tied.head.left == "u" && tied.head.right == "v",
      "(u,v) < (x,y) lexicographically")
  }

  test("trainMerges composes hierarchically and stops below MinPairCount") {
    val merges = Bpe.trainMerges(Seq(("merge", 10L), ("mercy", 10L)))
    // (e,r) then (m,er) or similar composition must appear: some merge
    // consumes a previously-merged symbol
    val syms = merges.map(m => m.left + m.right)
    assert(merges.exists(m => syms.take(m.rank - 1).contains(m.left) ||
      syms.take(m.rank - 1).contains(m.right)),
      s"expected a hierarchical merge in $merges")
    // a vocabulary with no repeated pair trains nothing
    assert(Bpe.trainMerges(Seq(("ab", 1L))).isEmpty,
      "single occurrence is below MinPairCount")
    assert(Bpe.trainMerges(Seq(("a", 100L), ("b", 50L))).isEmpty,
      "single-char words have no pairs")
  }

  test("tie-break compares UTF-8 bytes, not Java UTF-16 units") {
    // U+E000 is 3 UTF-8 bytes (EE 80 80), U+1F600 is 4 (F0 9F 98 80):
    // byte order puts E000 first; Java UTF-16 order would put the
    // surrogate pair (D83D DE00) first. The oracle and vocabulary()
    // both compare bytes, so trainMerges must too.
    val e000 = "\uE000"
    val smile = new String(Character.toChars(0x1F600))
    val merges = Bpe.trainMerges(Seq((smile * 2, 2L), (e000 * 2, 2L)))
    assert(merges.head.left == e000 && merges.head.right == e000,
      "UTF-8 byte order breaks the tie toward U+E000")
  }

  test("bpe_tokens returns the token array itself, equal to the driver tokenize") {
    val merges = Seq(("e", "r"), ("m", "er"))
    val words = Seq((1L, "merger"), (2L, "er"), (3L, ""), (4L, null.asInstanceOf[String]))
    val got = words.toDF("id", "w")
      .select($"id", BpeExpressions.bpe_tokens($"w", merges).as("tk"))
      .collect().map(r => r.getLong(0) ->
        Option(r.getSeq[String](1)).map(_.toList)).toMap
    words.foreach { case (id, w) =>
      if (w == null) assert(got(id).isEmpty, "null word -> null tokens")
      else {
        val want = BpeExpressions.tokenize(w, merges.toArray).toList
        assert(got(id).contains(want), s"word '$w'")
        assert(got(id).get.mkString == w, "tokens reconstruct the word")
      }
    }
  }

  test("tokenize applies merges in rank order") {
    val merges = Array(("e", "r"), ("m", "er"))
    assert(BpeExpressions.tokenize("merger", merges).toSeq ==
      Seq("mer", "g", "er"))
    assert(BpeExpressions.tokenize("", merges).isEmpty)
    assert(BpeExpressions.tokenize("x", merges).toSeq == Seq("x"))
  }

  test("bpe_stats counts words, initial code points, and merged tokens") {
    val merges = Seq(("e", "r"), ("m", "er"))
    val df = Seq((1L, "merger er"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = df.select($"doc_id", BpeExpressions.bpe_stats(
      operators.Dedup.tokens(org.apache.spark.sql.functions.coalesce(
        $"text", org.apache.spark.sql.functions.lit(""))), merges).as("st"))
      .select($"doc_id", $"st.n_words", $"st.n_syms", $"st.n_bpe")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((2L, 8L, 4L)), "merger=6cp->3tok [mer,g,er], er=2cp->1tok")
    // null text -> one '' word with zero code points
    assert(out(2L) == ((1L, 0L, 0L)))
  }

  test("tokenizeStats on testdata: totals consistent, model actually compresses") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Bpe.tokenizeStats(docs).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (ns, nb) = (r.getAs[Long]("n_syms"), r.getAs[Long]("n_bpe"))
      assert(nb <= ns, "merging can only shrink the symbol count")
      assert(nb >= r.getAs[Long]("n_words"), "every nonempty word yields >= 1 token")
    }
    val totalNs = out.map(_.getAs[Long]("n_syms")).sum
    val totalNb = out.map(_.getAs[Long]("n_bpe")).sum
    assert(totalNb < totalNs, "an induced vocabulary must compress its own corpus")
  }

  test("merge table rank order is the apply order and ranks are contiguous") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = Bpe.mergeTable(spark, docs).collect()
    assert(merges.map(_.getAs[Int]("rank")).toSeq == (1 to merges.length),
      "contiguous ranks from 1")
    merges.foreach { m =>
      assert(m.getAs[String]("merged") ==
        m.getAs[String]("left_sym") + m.getAs[String]("right_sym"))
      assert(m.getAs[Long]("pair_n") >= Bpe.MinPairCount)
    }
  }

  test("bpe fertility per language rolls up the per-doc stats exactly") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Bpe.bpeFertility(docs).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    // independent rollup from the per-doc frame (same frozen model)
    val stats = Bpe.tokenizeStats(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_syms"), r.getAs[Long]("n_bpe"))).toMap
    val langOf = docs.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byLang = stats.toSeq.filter(_._2._1 > 0)
      .groupBy { case (id, _) => langOf(id) }
    assert(out.keySet == byLang.keySet)
    byLang.foreach { case (lang, rows) =>
      val (w, s, b) = (rows.map(_._2._1).sum, rows.map(_._2._2).sum, rows.map(_._2._3).sum)
      val r = out(lang)
      assert(r.getAs[Long]("n_docs") == rows.size)
      assert(r.getAs[Long]("total_words") == w)
      assert(r.getAs[Long]("total_bpe") == b)
      assert(r.getAs[Long]("fertility_q20") == b * 1048576L / w)
      assert(r.getAs[Long]("compression_bp") == 10000L * b / s)
      // a trained tokenizer merges at least some pairs: bpe < codepoints
      assert(b < s, s"$lang: the trained model must compress the symbol stream")
    }
  }
}
