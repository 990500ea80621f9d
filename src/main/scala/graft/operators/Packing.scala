package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * SEQUENCE PACKING and token-budget selection for training pipelines —
 * both built on one primitive: an exact DISTRIBUTED PREFIX SUM over a
 * total document order.
 *
 * The naive formulation — `sum(tokens) OVER (ORDER BY …)` with no
 * partitioning — collapses the whole relation into a single partition
 * and is the canonical 100 TB failure shape. [[withCumulative]] is the
 * two-phase exact form:
 *
 *   1. range-shuffle the rows into ORDER-CONTIGUOUS shards
 *      (`repartitionByRange` on the order key — shard i holds keys
 *      strictly before shard i+1's);
 *   2. per-shard token totals — a map-side-combined aggregate whose
 *      result is a bounded driver list (≤ nShards longs, the same
 *      driver-scalar shape as the stores' touched-bucket lists);
 *   3. the exclusive prefix of those totals (driver arithmetic) is
 *      broadcast back and added to each shard's within-shard running
 *      sum (a windowed cumsum PARTITIONED by shard — never global).
 *
 * Every row's `cum` equals the single-partition window's answer
 * exactly (prefix sums are associative), so the DuckDB oracle can
 * restate the whole operator with the naive window. Cost: two passes
 * over the ranged relation (totals, then cumsum) — the honest price
 * of an exact global prefix sum; a production pipeline materializes
 * the ranged relation once and amortizes it.
 *
 * On top of it:
 *   - [[pack]] — GPT-style "concatenate and chunk" packing: the corpus
 *     token stream is cut into fixed-`budget` training sequences and
 *     each document learns which sequence(s) it lands in and at what
 *     offset (documents may straddle a boundary — the standard
 *     pretraining packing; samples are documents, sequences are just
 *     windows over the stream).
 *   - [[selectToBudget]] — "take documents in priority order until the
 *     token budget is spent": keep every document whose STARTING
 *     offset is inside the budget (the first overflowing document is
 *     kept, truncated at training time — deterministic and
 *     restatable; flip to `cum <= budget` semantics by filtering the
 *     output).
 *
 * The order columns MUST form a total order (include a unique
 * tiebreak like doc_id): a running sum under ties is
 * order-dependent and would not be reproducible.
 */
object Packing {

  /** `df` plus `cum` — the exact running total of `valueCol` over the
   * global `orderCols` order, cum INCLUSIVE of the row's own value
   * (the row's starting offset is `cum - value`). See class doc for
   * the two-phase plan. `valueCol` must be non-negative. */
  def withCumulative(df: DataFrame, valueCol: String,
      orderCols: Seq[Column], nShards: Int = 32): DataFrame =
    withCumulativeAndTotal(df, valueCol, orderCols, nShards)._1

  /** [[withCumulative]] plus the grand total — already known from the
   * per-shard partials, so incremental callers ([[PackState.append]])
   * never pay (or risk the inconsistency of) a second source scan. */
  private def withCumulativeAndTotal(df: DataFrame, valueCol: String,
      orderCols: Seq[Column], nShards: Int): (DataFrame, Long) = {
    // MATERIALIZED once (localCheckpoint): range boundaries come from
    // the partitioner's SAMPLE, whose seed differs per job — without
    // pinning the physical shards, the totals job and the cumsum job
    // would disagree on which rows a shard holds and the offsets would
    // be silently wrong. This is also the "materialize the ranged
    // relation once" cost the class doc prices in.
    val ranged = df.repartitionByRange(nShards, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    // bounded driver list: one (shard, total, null-count) row per shard
    val partRows = ranged.groupBy(col("__pid"))
      .agg(sum(col(valueCol)).as("__t"),
        sum(when(col(valueCol).isNull, 1L).otherwise(0L)).as("__n"))
      .collect()
    // FAIL LOUD on NULL values: sum() would silently skip them (a NULL
    // row's cum then goes NULL and every chunk column with it), and an
    // all-NULL shard would NPE the offset arithmetic below
    partRows.foreach { r =>
      require(r.getLong(2) == 0,
        s"withCumulative: $valueCol contains NULLs (shard " +
          s"${r.getInt(0)}: ${r.getLong(2)} rows) — coalesce or filter " +
          "them before packing")
    }
    val partials = partRows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until nShards)
      .scanLeft(0L)((acc, p) => acc + partials.getOrElse(p, 0L))
    import df.sparkSession.implicits._
    val offDf = (0 until nShards).map(p => (p, offsets(p)))
      .toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumDf = ranged
      .withColumn("__local", sum(col(valueCol)).over(w))
      .join(broadcast(offDf), Seq("__pid"))
      .withColumn("cum", col("__local") + col("__off"))
      .drop("__pid", "__local", "__off")
    (cumDf, offsets.last)
  }

  /** Concat-and-chunk packing: adds `start_seq` (the fixed-`budget`
   * training sequence this document's first token lands in),
   * `start_off` (its offset inside that sequence) and `end_seq` (the
   * sequence holding its last token — > start_seq when the document
   * straddles boundaries). Zero-token documents pin `end_seq` to
   * `start_seq`. All integer arithmetic — hash-exact. */
  def pack(df: DataFrame, valueCol: String, budget: Long,
      orderCols: Seq[Column], nShards: Int = 32): DataFrame = {
    require(budget > 0, "pack: budget must be positive")
    chunk(withCumulative(df, valueCol, orderCols, nShards),
      valueCol, budget)
  }

  /** The chunk arithmetic over a `cum`-carrying frame. `div` (integral
   * division), never `/`: the double division would lose exactness
   * past 2^53 total tokens — a realistic corpus size. */
  private def chunk(cumDf: DataFrame, valueCol: String,
      budget: Long): DataFrame =
    cumDf
      .withColumn("start_seq",
        expr(s"(cum - `$valueCol`) div ${budget}L"))
      .withColumn("start_off",
        pmod(col("cum") - col(valueCol), lit(budget)))
      .withColumn("end_seq",
        when(col(valueCol) === 0, col("start_seq"))
          .otherwise(expr(s"(cum - 1L) div ${budget}L")))

  /** Priority-ordered selection under a global token budget: keeps
   * every document whose starting offset (`cum - value`) is inside
   * `budget`; the `cum` column rides along as the selection evidence. */
  def selectToBudget(df: DataFrame, valueCol: String, budget: Long,
      orderCols: Seq[Column], nShards: Int = 32): DataFrame = {
    require(budget > 0, "selectToBudget: budget must be positive")
    withCumulative(df, valueCol, orderCols, nShards)
      .filter(col("cum") - col(valueCol) < budget)
  }

  /** INCREMENTAL packing state: the token stream's running total. An
   * arriving batch of documents extends the packed sequence stream
   * WITHOUT re-packing history — its prefix sum starts at the carried
   * total, so each append costs O(batch), never O(corpus): the
   * maintain-side economics every persisted artifact here carries,
   * applied to training-sequence assignment. The state is ONE long —
   * trivially durable (callers persist it next to their corpus
   * manifest; p03's as-of view + this total reproduce any epoch's
   * packing exactly). */
  final case class PackState(tokensSoFar: Long) {
    /** Pack one arriving batch as the continuation of the stream:
     * returns (packed batch, advanced state). Batch rows are ordered
     * by `orderCols` within the batch; sequence numbers continue from
     * the carried total, so the concatenation of all batches' outputs
     * equals [[Packing.pack]] over the concatenated corpus in arrival
     * order (spec-pinned). */
    def append(batch: DataFrame, valueCol: String, budget: Long,
        orderCols: Seq[Column], nShards: Int = 32)
        : (DataFrame, PackState) = {
      require(budget > 0, "append: budget must be positive")
      // the batch total comes from the SAME checkpointed partials the
      // packed rows were computed from — a second scan of the source
      // could see different data (a file landing mid-ingest) and
      // silently desynchronize the carried total from the emitted rows
      val (cumDf, total) = Packing.withCumulativeAndTotal(
        batch, valueCol, orderCols, nShards)
      val packed = chunk(
        cumDf.withColumn("cum", col("cum") + tokensSoFar),
        valueCol, budget)
      (packed, PackState(tokensSoFar + total))
    }
  }
}
