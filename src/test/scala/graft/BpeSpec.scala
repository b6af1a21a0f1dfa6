package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Bpe

/** Corpus-trained BPE (engine.Bpe): the graded keys are model-valued
  * (no SQL oracle — training is iterative), so this spec carries the
  * correctness burden: the public paper's worked example reproduces
  * merge-for-merge, encoding round-trips losslessly, more merges never
  * inflate a tokenization, training is deterministic, and the Spark
  * UDF path agrees with the driver-side encoder bit-for-bit.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freq(rows: (String, Long)*) = rows.toDF("word", "n")

  test("reproduces the Sennrich et al. worked example's first merges") {
    // {low:5, lower:2, newest:6, widest:3} (no </w> marker — see the
    // object scaladoc). Hand-derived: (e,s)=9 ties (s,t)=9 → lexicographic
    // → "es"; then (es,t)=9 → "est"; (l,o)=7 ties (o,w)=7 → "lo";
    // then (lo,w)=7 → "low".
    val m = Bpe.train(freq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)),
      numMerges = 4)
    assert(m.merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    assert(m.encodeWord("lowest") == List("low", "est"))
    assert(m.encodeWord("newest") == List("n", "e", "w", "est"))
    assert(m.encodeWord("slow") == List("s", "low"))
  }

  test("zero merges → character tokens; unknown chars pass through") {
    val m = Bpe.Model(Nil)
    assert(m.encodeWord("abc") == List("a", "b", "c"))
    assert(m.encodeWord("") == Nil)
    assert(Bpe.train(freq(("ab", 3L)), numMerges = 0).merges.isEmpty)
  }

  test("training saturates when no pair repeats (early stop)") {
    val m = Bpe.train(freq(("ab", 1L), ("cd", 1L)), numMerges = 100)
    assert(m.merges.isEmpty) // every pair count is 1 — nothing to compress
  }

  /** 300 deterministic pseudo-random words over {a..e}, length 1–12 —
    * the property-sample substitute (scalacheck's funsuite bridge isn't
    * in the offline cache; the fixed seed keeps failures replayable).
    */
  private val sampleWords: Seq[String] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(300)((0 until (1 + rnd.nextInt(12))).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString)
  }

  test("round trip: encoded tokens concatenate back to the word") {
    val corpus = Seq("abab", "abcde", "eddcba", "aabb", "ababab")
    val m = Bpe.train(freq(corpus.map(w => (w, 5L)): _*), numMerges = 20)
    sampleWords.foreach { w =>
      assert(m.encodeWord(w).mkString == w)
      assert(m.countWord(w) == m.encodeWord(w).size)
    }
  }

  test("more merges never inflate a word's token count") {
    val corpus = freq(("abab", 9L), ("babab", 7L), ("aabb", 5L), ("abba", 3L))
    val models = (0 to 10).map(k => Bpe.train(corpus, numMerges = k))
    sampleWords.foreach { w =>
      val counts = models.map(_.countWord(w))
      assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
        s"counts not monotone for '$w': $counts")
    }
  }

  test("training is deterministic (two runs, same model)") {
    val docs = Seq("the cat sat on the mat", "the bat and the cat",
      "mat and bat chat").toDF("text")
    val m1 = Bpe.trainOnCorpus(docs, "text", 16)
    val m2 = Bpe.trainOnCorpus(docs, "text", 16)
    assert(m1.merges == m2.merges)
    assert(m1.merges.nonEmpty)
  }

  test("maxVocab caps the training table deterministically") {
    // With only the two most frequent words retained, merges can only
    // come from them.
    val m = Bpe.train(
      freq(("aaaa", 10L), ("bbbb", 9L), ("cccc", 1L)), numMerges = 10, maxVocab = 2)
    assert(m.merges.forall { case (a, b) => (a + b).forall(c => c == 'a' || c == 'b') })
  }

  test("Spark tokenCount/tokenize UDFs agree with the driver-side encoder") {
    val texts = Seq(
      ("d1", "low lower newest"),
      ("d2", "widest  low"), // double space → empty token must drop
      ("d3", ""),
      ("d4", "slowest"))
    val df = texts.toDF("id", "text")
    val m = Bpe.trainOnCorpus(df, "text", 8)
    val got = df.select(col("id"), Bpe.tokenCount(m, col("text")).as("n"),
        Bpe.tokenize(m, col("text")).as("toks"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[String](2))).toList
    val want = texts.map { case (id, t) =>
      val toks = t.split(' ').filter(_.nonEmpty).toList.flatMap(m.encodeWord)
      (id, toks.size.toLong, toks)
    }
    assert(got.sortBy(_._1) == want.sortBy(_._1))
    // Tokens must concatenate back to the whitespace-normalized text.
    got.foreach { case (id, _, toks) =>
      val t = texts.toMap.apply(id)
      assert(toks.mkString == t.split(' ').filter(_.nonEmpty).mkString)
    }
  }

  test("id space: stable vocabulary order, lossless id round trip, UNK for unseen chars") {
    val m = Bpe.train(freq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)),
      numMerges = 4)
    // <unk>, then the sorted training alphabet, then merge products.
    assert(m.vocabulary.head == "<unk>")
    assert(m.vocabulary.tail.takeWhile(_.length == 1) ==
      Seq("d", "e", "i", "l", "n", "o", "r", "s", "t", "w"))
    assert(m.vocabulary.drop(11) == Seq("es", "est", "lo", "low"))
    // Ids decode back through the vocabulary to the original word.
    val ids = m.encodeWordIds("lowest")
    assert(ids.forall(_ > 0))
    assert(ids.map(m.vocabulary).mkString == "lowest")
    // Characters never seen in training hit UNK = 0.
    assert(m.encodeWordIds("laz").contains(0))
    // Spark-side ids agree with the driver-side encoder.
    val df = Seq(("a", "low lazy lowest")).toDF("k", "text")
    val got = df.select(Bpe.tokenIds(m, col("text"))).head().getSeq[Int](0)
    assert(got == "low lazy lowest".split(' ').toList.flatMap(m.encodeWordIds))
  }

  test("graded keys run on the fixture and stay internally consistent") {
    val d = "/root/testdata/sf0.001"
    val table = Bpe.qBpeTrain(spark, d).collect()
    assert(table.nonEmpty)
    assert(table.map(_.getLong(0)).toSeq == table.indices.map(_.toLong)) // dense ranks
    val tok = Bpe.qBpeTokenize(spark, d).collect()
    tok.foreach { r =>
      val (ws, bpe) = (r.getAs[Long]("ws_tokens"), r.getAs[Long]("bpe_tokens"))
      assert(bpe <= ws * 12, "BPE tokens bounded by chars")
      assert(bpe >= ws, "subwords can't be fewer than words")
    }
    val mix = Bpe.qBpeMixture(spark, d).collect()
    mix.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_orig"))
      assert(r.getAs[Long]("tok_kept") <= r.getAs[Long]("tok_orig"))
    }
    // Packing arithmetic: tokens = (chunks-1)·budget + tail, 0 < tail ≤ budget.
    Bpe.qBpePacking(spark, d).collect().foreach { r =>
      val (tok, chunks, tail) = (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_chunks"), r.getAs[Long]("tail_fill"))
      assert(tail > 0 && tail <= 512)
      assert(tok == (chunks - 1) * 512 + tail)
    }
  }

  // -------------------------------------------------------------------
  // Byte-level fallback + reserved specials (Bpe.ByteModel)
  // -------------------------------------------------------------------

  /** 400 deterministic pseudo-random valid-UTF-8 strings: code points
    * across ASCII, Latin-1, CJK, astral planes (surrogate range
    * excluded — unpaired surrogates aren't valid UTF-8 and can't
    * round-trip through any byte encoding), mixed with runs of spaces,
    * tabs and newlines to exercise the segment pre-tokenization.
    */
  private val utf8Samples: Seq[String] = {
    val rnd = new scala.util.Random(7)
    def cp(): Int = rnd.nextInt(5) match {
      case 0 => 1 + rnd.nextInt(0x7f)              // ASCII incl. controls
      case 1 => 0x80 + rnd.nextInt(0x780)          // Latin/Greek/Cyrillic
      case 2 => 0x4e00 + rnd.nextInt(0x2000)       // CJK
      case 3 => 0x1f300 + rnd.nextInt(0x200)       // astral (emoji block)
      case _ => ' '.toInt                          // force space runs
    }
    "" +: " " +: "   " +: "a  b\t c\nd" +: Seq.fill(396) {
      val sb = new java.lang.StringBuilder
      (0 until rnd.nextInt(24)).foreach(_ => sb.appendCodePoint(cp()))
      sb.toString
    }
  }

  private lazy val byteModel = Bpe.trainBytes(
    freq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L), ("日本語", 4L)),
    numMerges = 24)

  test("byte fallback: decode∘encode = identity on arbitrary valid UTF-8, no UNK") {
    utf8Samples.foreach { s =>
      val ids = byteModel.encodeIds(s)
      assert(byteModel.decodeIds(ids) == s, s"round trip failed for ${s.toList}")
      // total encode: every id in range, none special
      ids.foreach(id => assert(id >= byteModel.specials.size &&
        id < byteModel.vocabulary.size))
      assert(byteModel.countText(s) == ids.size)
    }
  }

  test("byte fallback: multi-byte characters compress via learned merges") {
    // 日本語 is in training with weight 4: its UTF-8 bytes (9) should
    // merge below 9 tokens; an untrained astral char stays 4 byte ids.
    assert(byteModel.encodeIds("日本語").size < 9)
    assert(byteModel.encodeIds("😀").size == 4) // U+1F600, unseen
  }

  test("special tokens: reserved leading ids, never emitted by encode") {
    assert(byteModel.specialId("<pad>") == 0)
    assert(byteModel.specialId("<bos>") == 1)
    assert(byteModel.specialId("<eos>") == 2)
    assert(byteModel.vocabulary.take(3) == Seq("<pad>", "<bos>", "<eos>"))
    intercept[IllegalArgumentException](byteModel.specialId("<nope>"))
    // wrapping with specials decodes back to the bare text
    val ids = byteModel.specialId("<bos>") +: byteModel.encodeIds("low  er") :+
      byteModel.specialId("<eos>")
    assert(byteModel.decodeIds(ids) == "low  er")
  }

  test("id stability: growing numMerges appends; growing maxVocab can't move specials/bytes") {
    val table = freq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val m16 = Bpe.trainBytes(table, numMerges = 8)
    val m64 = Bpe.trainBytes(table, numMerges = 24)
    assert(m64.merges.take(m16.merges.size) == m16.merges) // greedy prefix
    assert(m64.vocabulary.take(m16.vocabulary.size) == m16.vocabulary)
    // same ids for every token the smaller model knows
    utf8Samples.take(50).foreach { s =>
      assert(m16.decodeIds(m16.encodeIds(s)) == s)
    }
    val capped = Bpe.trainBytes(table, numMerges = 8, maxVocab = 2)
    // different merge tables are allowed; the reserved prefix is not
    assert(capped.vocabulary.take(3 + 256) == m64.vocabulary.take(3 + 256))
  }

  test("Spark byteTokenIds/byteDecode/byteTokenCount agree with the driver-side model") {
    val docs = graft.engine.Tables.documents(spark, TestSpark.sfDir).limit(40)
    val rows = docs.select(col("doc_id"), col("text"),
        Bpe.byteTokenIds(byteModel, col("text")).as("ids"),
        Bpe.byteTokenCount(byteModel, col("text")).as("n"),
        Bpe.byteDecode(byteModel, Bpe.byteTokenIds(byteModel, col("text"))).as("rt"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val text = r.getAs[String]("text")
      assert(r.getAs[scala.collection.Seq[Int]]("ids").toList == byteModel.encodeIds(text))
      assert(r.getAs[Long]("n") == byteModel.countText(text))
      assert(r.getAs[String]("rt") == text)
    }
  }

  test("graded key q_bpe_bytes: every doc round-trips exactly") {
    Bpe.qBpeBytes(spark, "/root/testdata/sf0.001").collect().foreach { r =>
      assert(r.getAs[Long]("n_roundtrip_exact") == r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("byte_bpe_tokens") > 0)
    }
  }
}
