package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.{TextFunctions => TF}

/**
 * BPE TOKENIZER TRAINING — the Sennrich byte-pair-encoding merge loop
 * a training-data pipeline runs to fit its own subword vocabulary on
 * the corpus it curated (the step upstream of every token count the
 * engine's t-family approximates with a fixed regex). The algorithm
 * is inherently iterative (each merge changes the pair statistics the
 * next argmax reads), but its SCALE shape is Spark-friendly because
 * the iteration never touches the corpus:
 *
 *  - ONE corpus-scale pass builds the word-frequency table (the
 *    classic BPE decomposition: merges apply within words, so the
 *    corpus collapses to (distinct word, count) — at 100 TB that is
 *    ~10⁸ rows against ~10¹¹ corpus tokens, a 1000× reduction the
 *    rest of the loop rides);
 *  - each round is one shuffle over the vocab (adjacent-pair counts
 *    weighted by word frequency), an argmax collected as a BOUNDED
 *    driver scalar (one row: the winning pair), and a map-only merge
 *    application — no corpus rescans, no driver-side vocabulary.
 *
 * Merge application is greedy left-to-right non-overlapping, computed
 * as ONE literal string replacement over the symbol string with
 * DOUBLED separators: naive single-space replacement tile-skips on
 * runs of a self-pair (the scan consumes the trailing boundary space,
 * so " a a a a " merges pairs 1-2 and 4-5 — NOT canonical greedy's
 * 1-2 and 3-4); with tokens joined by two spaces a match consumes
 * exactly ONE space of each flanking separator, the scan resumes at
 * the next token boundary, and a single pass IS the canonical greedy
 * tiling (verified on runs of every length in BpeSpec, which pins the
 * round whose argmax a tile-skip segmentation would change). Both
 * Spark's `replace` and DuckDB's share the scan-resume semantics, so
 * the oracle restates the whole loop with plain non-recursive CTEs.
 *
 * Determinism: the argmax tiebreak is (count DESC, pair string ASC)
 * — pure integer counts and string order, nothing floating-point in
 * the entire loop.
 *
 * ITERATION BOUND (r15 verdict #3): the loop is O(rounds) SEQUENTIAL
 * Spark jobs — one vocab-sized shuffle + one one-row argmax collect +
 * one localCheckpoint per merge. Data scale is a non-issue (the vocab
 * frame is corpus-independent after the first pass), but a production
 * 32k-merge vocabulary means 32k driver round-trips at ~100 ms floor
 * each — roughly an hour of pure scheduling, which is why real BPE
 * trainers batch merges. The gated surface (8 rounds) is far inside
 * the bound. The Spark-shaped fix, when a large vocab is needed: per
 * round take the TOP-K pairs whose symbol sets are mutually disjoint
 * (greedy scan of the sorted pair list on the driver — K bounded,
 * still a bounded collect) and apply all K merges in one map pass;
 * disjointness makes the batched application ORDER-INDEPENDENT and
 * equal to K sequential rounds except where a later argmax would have
 * been changed by an earlier merge's new symbol — the standard
 * approximation every batched trainer (e.g. the HuggingFace tokenizer
 * bucket variant) documents, so it must land behind an explicit
 * `batchK` opt-in, never silently replace the exact loop. */
object Bpe {

  /** One trained merge: `step` is 1-based rank order. */
  final case class Merge(step: Int, lhs: String, rhs: String, n: Long)

  /** Train `rounds` merges on the corpus behind `textCol`. Returns
   * the ranked merge table — the artifact a tokenizer ships. */
  def train(docs: DataFrame, textCol: String, rounds: Int): Seq[Merge] = {
    require(rounds >= 1, s"Bpe.train: rounds $rounds")
    val ss = docs.sparkSession
    // corpus -> (distinct word, freq), then word -> spaced symbol
    // string "c h a r s </w>" (the end-of-word sentinel makes
    // word-final merges distinct from word-internal ones)
    var vocab = docs
      .select(explode(TF.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .select(concat(array_join(
        regexp_extract_all(col("w"), lit("."), lit(0)), " "),
        lit(" </w>")).as("s"), col("f"))
      .localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    for (step <- 1 to rounds) {
      val best = vocab
        .select(col("f"), split(col("s"), " ").as("y"))
        // a fully-merged word (one symbol left) has no pairs; without
        // the guard sequence(0, -1) DESCENDS and element_at throws
        .filter(size(col("y")) >= 2)
        .select(col("f"), explode(
          transform(sequence(lit(0), size(col("y")) - 2),
            i => concat(element_at(col("y"), i + 1), lit(" "),
              element_at(col("y"), i + 2)))).as("p"))
        .groupBy(col("p")).agg(sum(col("f")).as("n"))
        .orderBy(col("n").desc, col("p"))
        .limit(1).collect() // bounded driver scalar: the one winner
      require(best.nonEmpty, s"Bpe.train: vocab exhausted at step $step")
      val (pair, n) = (best(0).getString(0), best(0).getLong(1))
      val Array(lhs, rhs) = pair.split(" ", 2)
      merges += Merge(step, lhs, rhs, n)
      // canonical greedy in ONE pass (class doc): doubled separators,
      // replace " lhs  rhs " with " lhsrhs ", collapse back
      vocab = vocab.select(
        trim(replace(replace(
          concat(lit(" "),
            replace(col("s"), lit(" "), lit("  ")), lit(" ")),
          lit(s" $lhs  $rhs "), lit(s" $lhs$rhs ")),
          lit("  "), lit(" "))).as("s"), col("f"))
        .localCheckpoint()
    }
    merges.result()
  }

  /** [[train]] as a gate-shaped frame: (step, lhs, rhs, n). */
  def trainDf(ss: SparkSession, docs: DataFrame, textCol: String,
      rounds: Int): DataFrame = {
    import ss.implicits._
    train(docs, textCol, rounds).toDF()
      .select(col("step").cast(LongType).as("step"), col("lhs"),
        col("rhs"), col("n"))
  }

  /** The symbol string a WORD encodes to under `merges` applied in
   * rank order — the single-pass canonical replace (class doc)
   * composed per merge into ONE column expression: encoding is pure
   * scan-stage work, no loop, no action. */
  def encodeExpr(word: org.apache.spark.sql.Column,
      merges: Seq[Merge]): org.apache.spark.sql.Column = {
    val init = concat(array_join(
      regexp_extract_all(word, lit("."), lit(0)), " "), lit(" </w>"))
    merges.foldLeft(init) { (s, m) =>
      trim(replace(replace(
        concat(lit(" "), replace(s, lit(" "), lit("  ")), lit(" ")),
        lit(s" ${m.lhs}  ${m.rhs} "), lit(s" ${m.lhs}${m.rhs} ")),
        lit("  "), lit(" ")))
    }
  }

  /** ENCODE the corpus with a trained merge table — the tokenizer's
   * runtime half: per doc, the subword count under the trained vocab.
   * The merge chain runs once per DISTINCT WORD (the same 1000×
   * corpus→vocab collapse training rides), and documents join their
   * words' subword lengths back by word — one shuffle on the word.
   * Returns (idCol, n_subwords). */
  def encodeCounts(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val words = docs
      .select(col(idCol), explode(TF.tokens(col(textCol))).as("w"))
    val enc = words.select(col("w")).distinct()
      .select(col("w"),
        size(split(encodeExpr(col("w"), merges), " "))
          .cast(LongType).as("n"))
    words.join(enc, Seq("w"))
      .groupBy(col(idCol))
      .agg(sum(col("n")).as("n_subwords"))
  }
}
