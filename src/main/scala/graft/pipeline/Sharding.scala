package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Training-shard assembly operators: pack an ordered corpus into
  * fixed-token-budget shards, and draw deterministic mixture samples
  * per domain/language for dataset re-weighting.
  *
  * Both are pre-tokenization steps of an LLM data pipeline (after dedup +
  * quality gating, before sequence packing proper): shard packing decides
  * which documents land in which output file so each file carries ~budget
  * tokens; mixture sampling implements "keep X% of language L" reweighting
  * reproducibly — the same row set is kept on every run, on any cluster.
  */
object Sharding {

  /** Assign each row a `shard_id` so consecutive rows (in `idCol` order)
    * accumulate into shards of ~`budget` tokens: shard_id = (exclusive
    * running sum of `tokensCol`) / budget. A document straddling a budget
    * boundary belongs to the shard its first token falls in, so every
    * shard except the last spans at least `budget` tokens.
    *
    * 100 TB shape: the naive formulation — a global-order window sum — is a
    * scale-killer (Spark executes an un-partitioned `Window` on ONE task).
    * This is instead the classic two-pass distributed prefix sum:
    *   1. one range-shuffle on `idCol` (+ in-partition sort),
    *   2. per-partition token totals (a `spark_partition_id` groupBy whose
    *      partial aggregation ships one row per partition to the driver),
    *   3. a second pass over the materialized partitions adds each
    *      partition's exclusive offset to its local running sum.
    * Driver state is one Long per partition — bounded. The result is
    * IDENTICAL for any partition count (offsets make the prefix sum exact,
    * wherever the range boundaries land), which the spec asserts.
    *
    * The per-partition scan is genuine imperative per-partition logic
    * (running state across rows), the one place `mapPartitions` beats a
    * window: no second shuffle, no single-task collapse.
    */
  def packShards(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      budget: Long,
      numPartitions: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = df.sparkSession
    val p =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    // one shuffle; localCheckpoint materializes so the offset pass and the
    // output pass both read the shuffled blocks instead of re-shuffling
    val ranged = df
      .repartitionByRange(p, col(idCol))
      .sortWithinPartitions(col(idCol))
      .localCheckpoint()
    val schema = ranged.schema
    val tIdx = schema.fieldIndex(tokensCol)
    // per-partition totals: partial agg ships p rows, collect is O(p)
    val totals = ranged
      .select(spark_partition_id().as("pid"), col(tokensCol))
      .groupBy("pid")
      .agg(sum(col(tokensCol)).as("t"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    val offsets = new Array[Long](p)
    var acc = 0L
    var i = 0
    while (i < p) {
      offsets(i) = acc
      acc += totals.getOrElse(i, 0L)
      i += 1
    }
    val bOffsets = spark.sparkContext.broadcast(offsets)
    val outSchema = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField("shard_id", LongType, nullable = false))
    val bBudget = budget
    val outRdd = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var running = bOffsets.value(pid)
      it.map { row =>
        val t = row.get(tIdx).asInstanceOf[Number].longValue()
        val shard = running / bBudget
        running += t
        Row.fromSeq(row.toSeq :+ shard)
      }
    }
    spark.createDataFrame(outRdd, outSchema)
  }

  /** Chunk each document's token stream into fixed-size training sequences:
    * windows of `chunkTokens` tokens starting every `stride` tokens (stride
    * < chunk ⇒ overlapping context windows; tail windows may be short).
    * Output: one row per (doc, chunk_idx) with the chunk's token count and
    * re-joined text. With [[packShards]] and [[mixtureSample]] this
    * completes the shard-assembly chain: chunk → pack → mix.
    *
    * 100 TB shape: a per-row explode over an index sequence — narrow, no
    * shuffle, no state; output row count is Σ ceil(n_tokens/stride), known
    * up front. The token array is built once per row and sliced per chunk
    * (codegen'd built-ins: split/sequence/slice/array_join, no UDF). */
  def chunkSequences(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int,
      stride: Int,
      keepCols: Seq[String] = Nil): DataFrame = {
    require(chunkTokens > 0 && stride > 0,
      s"chunkTokens/stride must be positive, got $chunkTokens/$stride")
    val toks = split(col(textCol), " ")
    val chunk =
      slice(col("_t"), col("chunk_idx") * stride + 1, lit(chunkTokens))
    val carried = col(idCol) +: keepCols.map(col)
    df.select(carried :+ toks.as("_t"): _*)
      .withColumn("chunk_idx",
        explode(sequence(lit(0L), floor((size(col("_t")) - 1) / stride))))
      .select(carried ++ Seq(col("chunk_idx"),
        size(chunk).cast("long").as("n_chunk_tokens"),
        array_join(chunk, " ").as("chunk_text")): _*)
  }

  /** Deterministic mixture sampling: keep each row of group `g` (the value
    * of `groupCol`) with probability `rates(g)`, decided by a content hash
    * of (group, id) — not an RNG — so the kept set is a pure function of
    * the data: stable across runs, executors, partitionings, and engines
    * (the DuckDB oracle recomputes the identical predicate). Groups absent
    * from `rates` keep `defaultRate`.
    *
    * The decision is `md5(group ":" id)[0,4) < rate · 16⁴` compared as
    * fixed-width hex strings (lexicographic == numeric for equal-width
    * lowercase hex). 16-bit granularity ⇒ rates quantize to 1/65536.
    * Thresholds are monotone: the rate-0.3 sample is a SUBSET of the
    * rate-0.6 sample — raising a group's weight only ADDS documents, which
    * is what you want when re-mixing a corpus between training runs.
    *
    * 100 TB shape: a narrow per-row predicate over codegen'd built-ins
    * (md5 + substring + CASE) — no shuffle, no state, prunes at the scan.
    */
  def mixtureSample(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 0.0): DataFrame = {
    def thr(rate: Double): String =
      f"${math.max(0L, math.min(65536L, math.round(rate * 65536.0)))}%05x"
    val hash = substring(
      md5(concat_ws(":", col(groupCol), col(idCol).cast("string"))), 1, 4)
    val cutoff = rates.foldLeft(lit(thr(defaultRate))) { case (acc, (g, r)) =>
      when(col(groupCol) === g, lit(thr(r))).otherwise(acc)
    }
    // 4-char hash < 5-char threshold: "0xxxx" prefix keeps lexicographic
    // order aligned with numeric order; rate 1.0 → "10000" > every hash
    df.filter(concat(lit("0"), hash) < cutoff)
  }
}
