package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions

/** Large-scale deduplication operators for training-data pipelines.
  *
  * Scale shape: every variant is one shuffle on a compact key (hash, band
  * key, or shingle), never an all-pairs join — candidate pairs are generated
  * by co-grouping on keys, then verified. This is the plan that survives
  * 100 TB: the wide text column is dropped before any shuffle; only
  * (id, key) pairs move.
  */
object Dedup {

  /** Exact dedup groups by content hash. Output: one row per distinct
    * content (hash, cnt, keeper = min id). */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(md5(col(textCol)).as("fp"), col(idCol))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("cnt"), min(col(idCol)).as("keeper"))
      .orderBy(col("fp"))

  /** Exact dedup: keep the lowest id per identical content. */
  def exactKeepFirst(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol).asc)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** Exact n-gram Jaccard similarity for all candidate pairs sharing ≥ 1
    * shingle (optionally blocked by `blockCol` to bound the join). Output:
    * (id_a, id_b, jaccard) with id_a < id_b.
    *
    * Distributed shape: explode distinct shingles → self-equi-join on
    * shingle (+ block) → count common per pair → join per-doc set sizes.
    * No pair ever forms without a shared shingle, so skew is bounded by
    * shingle document-frequency; hot shingles can be dropped upstream like
    * stopwords. */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      blockCol: Option[String] = None,
      minJaccard: Double = 0.0): DataFrame = {
    val blockCols = blockCol.toSeq
    val base = df.select(
      (Seq(col(idCol), shingleSet(tokensWs(col(textCol)), k).as("sh")) ++
        blockCols.map(col)): _*)
    val sizes = base.select(col(idCol).as("_sid"), size(col("sh")).as("_n"))
    val ex = base.select(
      (Seq(col(idCol), explode(col("sh")).as("s")) ++ blockCols.map(col)): _*)
    val a = ex.select((Seq(col(idCol).as("id_a"), col("s")) ++
      blockCols.map(c => col(c).as(s"_ba_$c"))): _*)
    val b = ex.select((Seq(col(idCol).as("id_b"), col("s")) ++
      blockCols.map(c => col(c).as(s"_bb_$c"))): _*)
    val joinCond = (col("id_a") < col("id_b")) +: blockCols.map(c =>
      col(s"_ba_$c") === col(s"_bb_$c"))
    val common = a.join(b, Seq("s"))
      .filter(joinCond.reduce(_ && _))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
    common
      .join(sizes.withColumnRenamed("_sid", "id_a").withColumnRenamed("_n", "na"), "id_a")
      .join(sizes.withColumnRenamed("_sid", "id_b").withColumnRenamed("_n", "nb"), "id_b")
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double"), 6))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** MinHash+LSH near-dup candidates, verified with exact Jaccard.
    * shingle → minhash(numHashes) → band buckets → co-group join →
    * verify ≥ threshold. Ref technique: Broder '97 resemblance sketches
    * (standard MinHash/LSH construction). */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val sets = df
      .select(col(idCol), shingleSet(tokensWs(col(textCol)), k).as("sh"))
    // Build band keys in ONE projection, each minhash slot referenced exactly
    // once: materializing `sig` then hashing slices lets CollapseProject
    // inline the 64-hash signature into every band expression (16× blowup —
    // measured 400s → 3s at sf0.1). xxhash64 is variadic, so each band hashes
    // its r slots directly.
    val slots = (0 until bands * rowsPerBand).map { seed =>
      coalesce(array_min(transform(col("sh"), s => xxhash64(lit(seed), s))),
        lit(Long.MaxValue))
    }
    val bandKeys = (0 until bands).map { b =>
      xxhash64((lit(b) +: slots.slice(b * rowsPerBand, (b + 1) * rowsPerBand)): _*)
    }
    val exploded = sets.select(col(idCol),
      posexplode(array(bandKeys: _*)).as(Seq("band", "bkey")))
    val cand = exploded.as("x").join(exploded.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .distinct()
    cand
      .join(sets.select(col(idCol).as("id_a"), col("sh").as("sha")), "id_a")
      .join(sets.select(col(idCol).as("id_b"), col("sh").as("shb")), "id_b")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (size(col("sha")) + size(col("shb")) - col("inter")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** SimHash near-dup: 64-bit fingerprints, pairs within `maxHamming`.
    * Candidate generation by 4×16-bit band equality (any pair within
    * hamming ≤ 3 shares at least one exact 16-bit band — pigeonhole). */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val fp = df.select(col(idCol), simhash64(tokensWs(col(textCol))).as("fp"))
    val banded = fp.select(col(idCol), col("fp"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("fp"), b * 16).bitwiseAND(0xFFFFL).as("key"))): _*)).as("bk"))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.bk") === col("y.bk") && col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col("x.fp").as("fpa"),
        col(s"y.$idCol").as("id_b"), col("y.fp").as("fpb"))
      .distinct()
    cand.withColumn("hamming", hamming64(col("fpa"), col("fpb")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Embedding cosine near-dup pairs above threshold. Exact all-pairs within
    * `blockCol` blocks (pass an IVF/cluster assignment for the 100 TB path —
    * pairs then only form within blocks). */
  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      blockCol: Option[String] = None): DataFrame = {
    // precompute ‖v‖ once per row (not once per pair): same arithmetic as
    // cosine = dot/(‖a‖·‖b‖), 3× fewer kernel evaluations in the pair loop
    val sel = Seq(col(idCol), col(vecCol),
      VectorFunctions.norm(col(vecCol)).as("_nrm")) ++ blockCol.map(col)
    val base = df.select(sel: _*)
    val joinCond = (col(s"x.$idCol") < col(s"y.$idCol")) +:
      blockCol.map(c => col(s"x.$c") === col(s"y.$c")).toSeq
    base.as("x").join(base.as("y"), joinCond.reduce(_ && _))
      .withColumn("score",
        round(VectorFunctions.dot(col(s"x.$vecCol"), col(s"y.$vecCol")) /
          (col("x._nrm") * col("y._nrm")), 6))
      .filter(col("score") >= threshold)
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"), col("score"))
      .orderBy(col("id_a"), col("id_b"))
  }
}
