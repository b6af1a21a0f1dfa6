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
    require(numMerges >= 0 && maxVocab > 0, "numMerges/maxVocab must be positive")
    // Bounded collect: ≤ maxVocab (word, count) rows — the documented
    // driver-artifact contract (O(vocab), never O(corpus)).
    val top = wordFreq.orderBy(col("n").desc, col("word").asc)
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val vocab: Array[(mutable.ArrayBuffer[String], Long)] =
      top.map { case (w, n) =>
        (mutable.ArrayBuffer(w.map(_.toString): _*), n)
      }
    val alphabet = top.iterator.flatMap(_._1.toSeq).distinct.toIndexedSeq
      .sorted.map(_.toString)
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
    Model(merges.toList, alphabet)
  }

  /** Train directly on a corpus text column. */
  def trainOnCorpus(df: DataFrame, textCol: String, numMerges: Int,
      maxVocab: Int = 50000): Model =
    train(wordFrequencies(df, textCol), numMerges, maxVocab)

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

  val queries: Map[String, Q] = Map(
    "q_bpe_train" -> qBpeTrain,
    "q_bpe_tokenize" -> qBpeTokenize,
    "q_bpe_mixture" -> qBpeMixture,
    "q_bpe_packing" -> qBpePacking)
}
