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
 * as literal string replacement over the space-joined symbol string
 * iterated to a FIXPOINT: one `replace` pass merges alternate
 * occurrences inside a run of the same pair (the scan resumes after
 * each replacement), so a run of k collapses in O(log k) passes;
 * both Spark's `replace` and DuckDB's scan left-to-right and resume
 * after the replacement, so the per-pass strings — and therefore the
 * fixpoint — are engine-identical, which is what lets the t18 oracle
 * restate the whole loop (verified against a hand-written canonical
 * BPE on the overlapping-run corpus in BpeSpec).
 *
 * Determinism: the argmax tiebreak is (count DESC, pair string ASC)
 * — pure integer counts and string order, nothing floating-point in
 * the entire loop.
 */
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
      // greedy merge to fixpoint: replace " lhs rhs " with " lhsrhs "
      // over the padded symbol string until a pass changes nothing
      val pat = lit(s" $pair ")
      val rep = lit(s" $lhs$rhs ")
      var cur = vocab
        .select(concat(lit(" "), col("s"), lit(" ")).as("ps"), col("f"))
        .localCheckpoint()
      var remaining = 64 // log-convergence backstop, never binds
      while (!cur.filter(replace(col("ps"), pat, rep) =!= col("ps"))
          .isEmpty) {
        cur = cur.select(replace(col("ps"), pat, rep).as("ps"),
          col("f")).localCheckpoint()
        remaining -= 1
        require(remaining > 0, "Bpe.train: merge fixpoint diverged")
      }
      vocab = cur.select(trim(col("ps")).as("s"), col("f"))
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
}
