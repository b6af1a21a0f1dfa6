package graft.engine

import scala.collection.mutable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-trained byte-pair encoding — subword tokenization (Sennrich
  * et al. 2016, the public BPE algorithm every modern LLM tokenizer
  * descends from), making the engine's token-denominated budgets
  * (mixture rates, packing chunks, per-doc token stats) real
  * model-tokenizer units instead of whitespace-token approximations.
  *
  * Split of labor — the 100 TB shape:
  *
  *  - TRAINING reduces the corpus to its word-frequency table first
  *    (one shuffle with map-side partials; distinct words ≪ corpus
  *    size by Zipf), caps it to the `maxVocab` most frequent words
  *    (bounded-collect contract, same class as the IVF centroid pulls:
  *    the driver artifact is O(maxVocab · word-length), never corpus-
  *    sized — subword-nmt and every production tokenizer trains on
  *    exactly this capped table), then runs the sequential merge loop
  *    driver-side. The loop is inherently sequential (merge i+1's pair
  *    counts depend on merge i), so distributing it would serialize
  *    through a barrier per merge anyway; on the capped table it is
  *    CPU-trivial.
  *  - The MODEL is the ranked merge list — ≤ `numMerges` string pairs,
  *    a few KB — shipped to executors inside the task closure (the
  *    broadcast-small-artifact pattern).
  *  - ENCODING is embarrassingly parallel map-only work: no shuffle,
  *    no state, one pass over the text. It rides a Scala UDF because
  *    greedy rank-ordered merging is an iterative per-word algorithm
  *    no built-in or codegen Expression can express (the documented
  *    UDF exception class, like the simhash showcase); each task's
  *    deserialized closure keeps a word→tokens memo, so the Zipfian
  *    word distribution makes amortized per-token cost ~a hash lookup.
  *
  * Determinism (the cross-engine/cross-run contract every other graft
  * operator honors): pair-count ties during training break on the
  * lexicographically smallest pair, the word table is capped by
  * (count DESC, word ASC), and greedy encoding always merges the
  * lowest-ranked pair left-to-right — so the same corpus yields the
  * same model and the same tokenization on any engine, any run.
  *
  * No end-of-word marker: the public algorithm appends `</w>` so that
  * decoding can re-find word boundaries in a flat token stream; graft
  * pre-tokenizes on whitespace and keeps per-word token lists, so
  * boundaries are structural and the marker would only pollute the
  * merge table. Documented deviation, not an accident.
  */
object Bpe {
  import Tables._
  type Q = (SparkSession, String) => DataFrame

  /** A trained BPE model: `merges` in rank order (rank = index) plus
    * the training corpus' base `alphabet` (sorted distinct characters
    * of the capped word table). Together they define the id space a
    * model consumes: id 0 is reserved for UNK (a character never seen
    * in training), then the alphabet in order, then one token per
    * merge in rank order — so ids are stable across runs because both
    * components are deterministic.
    */
  final case class Model(merges: Seq[(String, String)],
      alphabet: Seq[String] = Nil) extends Serializable {
    @transient private lazy val rank: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    /** UNK +: alphabet +: merge products — every token [[encodeWord]]
      * can emit (plus UNK), in stable id order.
      */
    @transient lazy val vocabulary: Seq[String] =
      "<unk>" +: (alphabet ++ merges.map { case (a, b) => a + b })

    // First occurrence wins on surface-form collisions (two merge
    // chains can yield the same string, e.g. (a,bc) and (ab,c)).
    @transient private lazy val tokenId: Map[String, Int] =
      vocabulary.zipWithIndex
        .groupBy(_._1).map { case (t, xs) => (t, xs.map(_._2).min) }

    /** Token ids for one word; characters outside the training
      * alphabet map to UNK = 0.
      */
    def encodeWordIds(word: String): List[Int] =
      encodeWord(word).map(t => tokenId.getOrElse(t, 0))

    /** Greedy encode: repeatedly merge the lowest-ranked adjacent pair
      * (all its occurrences, left to right) until none applies.
      */
    def encodeWord(word: String): List[String] = {
      if (word.isEmpty) return Nil
      var syms: List[String] = word.map(_.toString).toList
      var done = syms.lengthCompare(2) < 0
      while (!done) {
        // Lowest-ranked pair present in the current symbol sequence.
        var best: (String, String) = null
        var bestRank = Int.MaxValue
        var it = syms
        while (it.lengthCompare(2) >= 0) {
          val p = (it.head, it.tail.head)
          val r = rank.getOrElse(p, Int.MaxValue)
          if (r < bestRank) { bestRank = r; best = p }
          it = it.tail
        }
        if (best == null) done = true
        else {
          val out = mutable.ListBuffer.empty[String]
          var rest = syms
          while (rest.nonEmpty) {
            if (rest.lengthCompare(2) >= 0 &&
                rest.head == best._1 && rest.tail.head == best._2) {
              out += rest.head + rest.tail.head
              rest = rest.tail.tail
            } else {
              out += rest.head
              rest = rest.tail
            }
          }
          syms = out.toList
          done = syms.lengthCompare(2) < 0
        }
      }
      syms
    }

    def countWord(word: String): Int = encodeWord(word).size
  }

  /** Corpus word-frequency table (word, n) — the ONE distributed pass
    * training needs: explode on whitespace, hash-aggregate with
    * map-side partials. Blank tokens (leading/double spaces) drop.
    */
  def wordFrequencies(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Train on a (word, n) frequency table. Caps to the `maxVocab` most
    * frequent words (count DESC, word ASC — deterministic cut), then
    * runs the sequential merge loop on the driver. Stops early when no
    * adjacent pair repeats (merge table saturated — the 31-word
    * fixture does this long before a production `numMerges`).
    */
  def train(wordFreq: DataFrame, numMerges: Int, maxVocab: Int = 50000): Model = {
    val top = cappedWordTable(wordFreq, numMerges, maxVocab)
    val alphabet = top.iterator.flatMap(_._1.toSeq).distinct.toIndexedSeq
      .sorted.map(_.toString)
    Model(mergeLoop(top, numMerges), alphabet)
  }

  /** Bounded collect: ≤ maxVocab (word, count) rows by (count DESC,
    * word ASC) — the documented driver-artifact contract (O(vocab),
    * never O(corpus)).
    */
  private def cappedWordTable(wordFreq: DataFrame, numMerges: Int,
      maxVocab: Int): Array[(String, Long)] = {
    require(numMerges >= 0 && maxVocab > 0, "numMerges/maxVocab must be positive")
    wordFreq.orderBy(col("n").desc, col("word").asc)
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1)))
  }

  /** The sequential merge loop shared by char-level [[train]] and
    * byte-level [[trainBytes]]: each input word is a sequence of base
    * symbols, ONE CHARACTER per symbol (byte-level inputs arrive
    * pre-mapped through [[byteMapped]], so that invariant holds there
    * too). Inherently sequential — see the object scaladoc.
    */
  private def mergeLoop(top: Array[(String, Long)], numMerges: Int): List[(String, String)] = {
    val vocab: Array[(mutable.ArrayBuffer[String], Long)] =
      top.map { case (w, n) =>
        (mutable.ArrayBuffer(w.map(_.toString): _*), n)
      }
    val merges = mutable.ListBuffer.empty[(String, String)]
    var continue = numMerges > 0
    while (continue && merges.size < numMerges) {
      // Weighted adjacent-pair counts over the capped vocab.
      val pairs = mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairs.update(p, pairs.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      // A pair seen once can't compress anything on this corpus.
      val candidates = pairs.filter(_._2 >= 2)
      if (candidates.isEmpty) continue = false
      else {
        // Max count; ties break on the lexicographically smallest pair
        // so training is deterministic across runs and engines.
        val best = candidates.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        vocab.foreach { case (syms, _) =>
          var i = 0
          while (i < syms.length - 1) {
            if (syms(i) == best._1 && syms(i + 1) == best._2) {
              syms.update(i, joined)
              syms.remove(i + 1)
            } else i += 1
          }
        }
      }
    }
    merges.toList
  }

  /** Train directly on a corpus text column. */
  def trainOnCorpus(df: DataFrame, textCol: String, numMerges: Int,
      maxVocab: Int = 50000): Model =
    train(wordFrequencies(df, textCol), numMerges, maxVocab)

  // ---------------------------------------------------------------------
  // Byte-level fallback + reserved specials — the production tokenizer
  // contract (GPT-2's byte-level BPE, Radford et al. 2019, public):
  // every input round-trips losslessly (no UNK — a character outside the
  // training corpus decomposes into its UTF-8 bytes, each of which has
  // an id by construction) and special tokens hold RESERVED ids that
  // cannot move when the vocabulary grows.
  // ---------------------------------------------------------------------

  /** Bijective byte→symbol-char map: byte b ↦ char (0x100 + b). Keeps
    * every base symbol exactly one char (the [[mergeLoop]] invariant),
    * makes merge products plain strings of mapped chars, and can never
    * collide with a special-token name (specials are ASCII-range).
    * GPT-2 uses an equivalent printable-unicode table; any fixed
    * bijection works — this one is its own documentation.
    */
  private[graft] def byteMapped(word: String): String = {
    val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    bytes.foreach(b => sb.append((0x100 + (b & 0xff)).toChar))
    sb.toString
  }

  private val ByteAlphabet: IndexedSeq[String] =
    (0 until 256).map(b => (0x100 + b).toChar.toString)

  /** A byte-level BPE model. Id space, in order:
    *
    *   ids [0, specials.size):        reserved special tokens
    *   ids [S, S+256):                the 256 byte symbols
    *   ids [S+256, S+256+numMerges):  merge products in rank order
    *
    * Specials sit FIRST (Llama-style), not last (GPT-2 appends them,
    * which re-numbers every special when merges are added): growing
    * `numMerges` APPENDS ids, so special and byte ids are fixed by
    * construction and merge ids are stable whenever the new merge list
    * extends the old one — which greedy training guarantees for a
    * larger `numMerges` on the same word table (merge i never depends
    * on merges > i). Growing `maxVocab` can change WHICH merges are
    * learned (the capped word table changes), but specials and bytes
    * still cannot move — BpeSpec pins both stability claims.
    *
    * No UNK anywhere: encode is total (any input decomposes to bytes)
    * and decode · encode = identity on every valid-UTF-8 string.
    */
  final case class ByteModel(merges: Seq[(String, String)],
      specials: Seq[String] = ByteModel.DefaultSpecials) extends Serializable {
    require(specials.distinct.size == specials.size, "duplicate special tokens")

    /** Greedy merging delegated to the char-level machinery over the
      * mapped byte alphabet — one algorithm, both models.
      */
    @transient private lazy val core = Model(merges, ByteAlphabet)

    /** specials ++ byte symbols ++ merge products, in id order. Merge
      * products are strings of mapped chars, so they cannot collide
      * with specials or with each other's byte symbols.
      */
    @transient lazy val vocabulary: Seq[String] =
      specials ++ ByteAlphabet ++ merges.map { case (a, b) => a + b }

    @transient private lazy val tokenId: Map[String, Int] =
      vocabulary.zipWithIndex
        .groupBy(_._1).map { case (t, xs) => (t, xs.map(_._2).min) }

    /** Reserved id of a special token (throws on unknown name — a typo
      * here is a model-contract bug, not data).
      */
    def specialId(name: String): Int = {
      val i = specials.indexOf(name)
      require(i >= 0, s"unknown special token: $name")
      i
    }

    /** Token ids of arbitrary text. Pre-tokenization splits at every
      * space/non-space boundary KEEPING both sides (unlike the
      * char-level model's drop-the-spaces split), so decode can
      * reassemble the exact input — runs of spaces, tabs, newlines and
      * all. Never emits a special id.
      */
    /** Ids of ONE pre-tokenized segment — no re-segmentation; the
      * ByteEncoder memo path calls this per cached-miss segment.
      */
    private[engine] def encodeSegmentIds(seg: String): List[Int] =
      core.encodeWord(byteMapped(seg)).map(tokenId)

    def encodeIds(text: String): List[Int] =
      if (text == null || text.isEmpty) Nil
      else segments(text).flatMap(encodeSegmentIds).toList

    /** Inverse of [[encodeIds]] on valid-UTF-8 input: concatenate the
      * mapped-char surfaces of non-special ids, unmap to bytes, decode
      * once (segment boundaries always fall on character boundaries,
      * but decoding the whole byte run at once makes that irrelevant).
      */
    def decodeIds(ids: Seq[Int]): String = {
      val sb = new java.lang.StringBuilder
      ids.foreach { id =>
        require(id >= 0 && id < vocabulary.size, s"id out of range: $id")
        if (id >= specials.size) sb.append(vocabulary(id))
      }
      val s = sb.toString
      val bytes = new Array[Byte](s.length)
      var i = 0
      while (i < s.length) { bytes(i) = (s.charAt(i) - 0x100).toByte; i += 1 }
      new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    }

    def countText(text: String): Long = encodeIds(text).size.toLong
  }

  object ByteModel {
    val DefaultSpecials: Seq[String] = Seq("<pad>", "<bos>", "<eos>")
  }

  /** Split at every space/non-space boundary, keeping both sides:
    * "a  b" → ["a", "  ", "b"]; concatenation reproduces the input
    * exactly. Zero-width lookaround split — no characters consumed.
    */
  private def segments(text: String): Array[String] =
    text.split("(?<= )(?=[^ ])|(?<=[^ ])(?= )", -1)

  /** Byte-level training: the SAME capped word table as [[train]]
    * (cap order is over raw words — mapping after the cap keeps the
    * cut identical to the char-level model's), words mapped to byte
    * symbols, same sequential merge loop. Space runs never enter the
    * word table (wordFrequencies drops them), so merges never span a
    * space — the segment pre-tokenization matches.
    */
  def trainBytes(wordFreq: DataFrame, numMerges: Int, maxVocab: Int = 50000,
      specials: Seq[String] = ByteModel.DefaultSpecials): ByteModel = {
    val top = cappedWordTable(wordFreq, numMerges, maxVocab)
      .map { case (w, n) => (byteMapped(w), n) }
    ByteModel(mergeLoop(top, numMerges), specials)
  }

  /** Train a byte-level model directly on a corpus text column. */
  def trainBytesOnCorpus(df: DataFrame, textCol: String, numMerges: Int,
      maxVocab: Int = 50000): ByteModel =
    trainBytes(wordFrequencies(df, textCol), numMerges, maxVocab)

  /** Per-task memoized byte-level encoder — same justification and
    * shape as [[Encoder]]; memo key is the segment.
    */
  private final class ByteEncoder(model: ByteModel) extends Serializable {
    @transient private lazy val memo = new java.util.HashMap[String, List[Int]]()
    private val MemoCap = 1 << 17

    def ids(text: String): Seq[Int] =
      if (text == null || text.isEmpty) Nil
      else segments(text).toIndexedSeq.flatMap(encode)

    def count(text: String): Long =
      if (text == null || text.isEmpty) 0L
      else segments(text).foldLeft(0L)((acc, seg) => acc + encode(seg).size)

    private def encode(seg: String): List[Int] = {
      val hit = memo.get(seg)
      if (hit != null) hit
      else {
        val out = model.encodeSegmentIds(seg)
        if (memo.size < MemoCap) memo.put(seg, out)
        out
      }
    }
  }

  /** Byte-BPE token ids of `textCol` (array<int>) — map-only, model in
    * the task closure, no UNK by construction.
    */
  def byteTokenIds(model: ByteModel, textCol: Column): Column = {
    val enc = new ByteEncoder(model)
    udf((text: String) => enc.ids(text)).apply(textCol)
  }

  /** Byte-BPE token count of `textCol`. */
  def byteTokenCount(model: ByteModel, textCol: Column): Column = {
    val enc = new ByteEncoder(model)
    udf((text: String) => enc.count(text)).apply(textCol)
  }

  /** Decode an id-array column back to text — the inverse surface the
    * round-trip contract is stated through.
    */
  def byteDecode(model: ByteModel, idsCol: Column): Column =
    udf((ids: Seq[Int]) => model.decodeIds(ids)).apply(idsCol)

  /** Per-task memoized encoder closure. The UDF object deserializes
    * once per task, so the transient memo is task-local (thread-safe
    * without locks) and re-warms per partition — on a Zipfian word
    * distribution nearly every lookup hits. Capped so a pathological
    * all-unique-words partition can't grow it unboundedly.
    */
  private final class Encoder(model: Model) extends Serializable {
    @transient private lazy val memo = new java.util.HashMap[String, List[String]]()
    private val MemoCap = 1 << 17

    def tokens(text: String): Seq[String] =
      if (text == null) Nil
      else splitWords(text).flatMap(encode)

    def ids(text: String): Seq[Int] =
      if (text == null) Nil
      else splitWords(text).flatMap(w => encode(w).map(t => idOf(t)))

    private def idOf(t: String): Int = ids0.getOrElse(t, 0)
    // Rebuilt per task from the model (a few KB) — nothing extra rides
    // serialization. First occurrence wins, matching Model.encodeWordIds.
    @transient private lazy val ids0: Map[String, Int] =
      model.vocabulary.zipWithIndex
        .groupBy(_._1).map { case (t, xs) => (t, xs.map(_._2).min) }

    def count(text: String): Long =
      if (text == null) 0L
      else splitWords(text).foldLeft(0L)((acc, w) => acc + encode(w).size)

    private def splitWords(text: String): Seq[String] =
      text.split(' ').toIndexedSeq.filter(_.nonEmpty)

    private def encode(w: String): List[String] = {
      val hit = memo.get(w)
      if (hit != null) hit
      else {
        val toks = model.encodeWord(w)
        if (memo.size < MemoCap) memo.put(w, toks)
        toks
      }
    }
  }

  /** BPE token count of `textCol` as a Column — map-only, no shuffle;
    * the model rides the task closure. See [[Encoder]] for the UDF
    * justification (iterative per-word algorithm, memoized per task).
    */
  def tokenCount(model: Model, textCol: Column): Column = {
    val enc = new Encoder(model)
    udf((text: String) => enc.count(text)).apply(textCol)
  }

  /** Full BPE tokenization of `textCol` as an array column. */
  def tokenize(model: Model, textCol: Column): Column = {
    val enc = new Encoder(model)
    udf((text: String) => enc.tokens(text)).apply(textCol)
  }

  /** Token IDS of `textCol` (array<int>) — the sequence a model
    * actually consumes; ids per [[Model.vocabulary]], UNK = 0.
    */
  def tokenIds(model: Model, textCol: Column): Column = {
    val enc = new Encoder(model)
    udf((text: String) => enc.ids(text)).apply(textCol)
  }

  // ---------------------------------------------------------------------
  // Graded keys — hash/model-valued (no SQL oracle: training is an
  // iterative algorithm DuckDB can't express); property-tested in
  // BpeSpec (paper-example merges, round-trip, monotonicity, parity
  // with a driver-side reference encoder).
  // ---------------------------------------------------------------------

  private val GradedMerges = 64
  private val GradedVocab = 20000

  /** The trained merge table itself (rank, left, right) — the bounded
    * model artifact, fully deterministic for a given corpus.
    */
  val qBpeTrain: Q = (s, d) => {
    val model = trainOnCorpus(documents(s, d), "text", GradedMerges, GradedVocab)
    import s.implicits._
    model.merges.zipWithIndex
      .map { case ((a, b), r) => (r.toLong, a, b) }
      .toDF("rank", "left", "right")
      .orderBy("rank")
  }

  /** Per-language BPE vs whitespace token accounting over documents:
    * the compression a subword vocabulary buys per language, plus a
    * doc_id·tokens checksum pinning every per-doc count exactly.
    */
  val qBpeTokenize: Q = (s, d) => {
    val docs = Dedup.fanOut(documents(s, d))
    val model = trainOnCorpus(docs, "text", GradedMerges, GradedVocab)
    docs
      .select(col("doc_id"), col("lang"),
        tokenCount(model, col("text")).as("__bpe"),
        size(split(col("text"), " ")).cast("long").as("__ws"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__ws")).as("ws_tokens"),
        sum(col("__bpe")).as("bpe_tokens"),
        sum(col("doc_id") * col("__bpe")).as("bpe_checksum"))
      .orderBy("lang")
  }

  /** Token-weighted mixture rebalance in BPE units — the assembly
    * budget the whitespace approximation stood in for: rates from
    * [[Assembly.rebalanceByWeight]]'s algebra with weights =
    * model-tokenizer counts. Model trains on the same frame it
    * weighs; the rebalance itself stays a broadcast rate table +
    * map-side filter (zero corpus shuffles beyond the counting agg).
    */
  val qBpeMixture: Q = (s, d) => {
    val docs = Dedup.fanOut(documents(s, d))
    val model = trainOnCorpus(docs, "text", GradedMerges, GradedVocab)
    val weighted = docs.select(col("doc_id"), col("lang"),
      tokenCount(model, col("text")).as("n_tokens"))
    Assembly.auditMixtureByWeight(weighted, "n_tokens")
  }

  /** ORACLE-GRADED check twin for [[qBpeMixture]] (whose token counts
    * are model-tokenizer values → rows-only): per language, `n_orig` —
    * which DuckDB recomputes independently as count(*), a real
    * cross-engine check that no document is lost or duplicated anywhere
    * in the train → weigh → rebalance path — plus the conservation
    * booleans the oracle expects TRUE: kept counts within [0, n_orig],
    * kept tokens within [0, tok_orig], and keep-all coherence
    * (n_kept = n_orig ⇔ tok_kept = tok_orig — sound because every
    * fixture document is non-empty, so its BPE weight is ≥ 1 and a
    * dropped doc always shows in the token sum).
    */
  val qBpeMixtureCheck: Q = (s, d) => {
    val docs = Dedup.fanOut(documents(s, d))
    val model = trainOnCorpus(docs, "text", GradedMerges, GradedVocab)
    val weighted = docs.select(col("doc_id"), col("lang"),
      tokenCount(model, col("text")).as("n_tokens"))
    Assembly.auditMixtureByWeight(weighted, "n_tokens")
      .select(col("lang"), col("n_orig"),
        col("n_kept").between(0, col("n_orig")).as("kept_bounds_ok"),
        col("tok_kept").between(0, col("tok_orig")).as("tok_bounds_ok"),
        ((col("n_kept") === col("n_orig")) ===
          (col("tok_kept") === col("tok_orig"))).as("keep_all_coherent"))
      .orderBy("lang")
  }

  /** Sequence packing in BPE units — [[Assembly.packChunks]]'s algebra
    * with `budget` measured in model-tokenizer tokens, the unit a
    * training run's context window actually enforces (whitespace
    * packing over- or under-fills chunks whenever subword rates differ
    * across languages). Same per-shard running-sum plan; only the
    * token accounting changes.
    */
  val qBpePacking: Q = (s, d) => {
    val docs = Dedup.fanOut(documents(s, d))
    val model = trainOnCorpus(docs, "text", GradedMerges, GradedVocab)
    Assembly.auditPacking(
      docs.select(col("doc_id"), tokenCount(model, col("text")).as("n_tokens")),
      "n_tokens", 512L, 8)
  }

  /** Byte-level BPE accounting over documents, SELF-VERIFYING: per
    * language, docs / byte-BPE tokens / a doc_id·tokens checksum, plus
    * `n_roundtrip_exact` — the count of docs whose decode(encode(text))
    * equals the original text byte-for-byte, which the no-UNK contract
    * says must equal `n_docs` in every row. Model-valued (training is
    * iterative), so rows-only graded; the round-trip column carries the
    * correctness burden in-query and BpeSpec carries it on arbitrary
    * UTF-8.
    */
  val qBpeBytes: Q = (s, d) => {
    val docs = Dedup.fanOut(documents(s, d))
    val model = trainBytesOnCorpus(docs, "text", GradedMerges, GradedVocab)
    docs
      .select(col("doc_id"), col("lang"), col("text"),
        byteTokenIds(model, col("text")).as("__ids"))
      .select(col("doc_id"), col("lang"),
        size(col("__ids")).cast("long").as("__n"),
        (byteDecode(model, col("__ids")) === col("text")).cast("long").as("__rt"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__n")).as("byte_bpe_tokens"),
        sum(col("doc_id") * col("__n")).as("byte_bpe_checksum"),
        sum(col("__rt")).as("n_roundtrip_exact"))
      .orderBy("lang")
  }

  /** ORACLE-GRADED check frame for the byte-BPE stack (whose id/merge
    * artifacts are model-valued, so those keys are rows-only): per doc,
    * the utf8 byte length — recomputed independently by DuckDB
    * (`octet_length`), a real cross-engine value pinning that the text
    * survives the UDF encode path intact — plus two booleans the oracle
    * expects TRUE: `ids_le_bytes` (byte-BPE starts from byte symbols and
    * merges only shrink, so |ids| ≤ |bytes| always) and `roundtrip_ok`
    * (decode(encode(text)) is byte-identical — the no-UNK losslessness
    * contract). A tokenizer that dropped, reordered, or mismapped a
    * single byte anywhere in the corpus flips a boolean and fails the
    * hash gate; BpeSpec carries the same contract on arbitrary UTF-8.
    */
  val qBpeRoundtripCheck: Q = (s, d) => {
    val docs = Dedup.fanOut(documents(s, d))
    val model = trainBytesOnCorpus(docs, "text", GradedMerges, GradedVocab)
    docs
      .select(col("doc_id"), col("text"), byteTokenIds(model, col("text")).as("__ids"))
      .select(col("doc_id"),
        expr("octet_length(text)").cast("long").as("n_bytes"),
        (size(col("__ids")).cast("long") <= expr("octet_length(text)").cast("long"))
          .as("ids_le_bytes"),
        (byteDecode(model, col("__ids")) === col("text")).as("roundtrip_ok"))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "q_bpe_train" -> qBpeTrain,
    "q_bpe_roundtrip_check" -> qBpeRoundtripCheck,
    "q_bpe_tokenize" -> qBpeTokenize,
    "q_bpe_mixture" -> qBpeMixture,
    "q_bpe_mixture_check" -> qBpeMixtureCheck,
    "q_bpe_packing" -> qBpePacking,
    "q_bpe_bytes" -> qBpeBytes)
}
