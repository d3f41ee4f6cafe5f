package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.index.IvfIndex
import graft.model.Dot
import graft.ops.Search

/** IVF recall/latency curve at the reference's own ANN bench scale.
  *
  * Reproduces the fixture shape of qdrant's HNSW graph bench
  * (`lib/segment/benches/hnsw_search_graph.rs:15-20`: 1M vectors, dim 64,
  * cosine, top 10, seeded random queries) against OUR scale substitute for
  * HNSW — the IVF partition-pruned exact search (SURVEY.md §2.6/§7.1.9) —
  * and records, per nprobe setting:
  *
  *   - recall@10 against the exact scan (mean over the query set),
  *   - warm single-query latency (the reference bench's regime: one query
  *     per iteration — for us one Spark job over nprobe/k of the
  *     partitioned table, with parquet directory pruning),
  *   - the 100-query batch wall time (the Spark-native bulk regime: one
  *     broadcast join, big side streamed once),
  *
  * plus the plain exact-scan numbers (the reference's "plain" baseline) in
  * both regimes. Cosine is served the way qdrant serves it — vectors are
  * L2-normalized at ingest (`spaces/simple.rs:169-207`) and scored by dot.
  *
  * Artifacts (generated table, centroid model, partitioned layout, ground
  * truth) persist under SPARK_GRAFT_IVF_DIR (default
  * /tmp/graft_runtime/ivf1m) so repeated runs — and the bench headline
  * entry — pay generation/training exactly once, mirroring the reference's
  * cached graph fixture (`fixture::make_cached_graph`).
  *
  * Output: one JSON line, also written to target/ivf_recall_1m.json.
  */
object IvfRecallProbe {

  val Dim = 64
  val Top = 10

  /** Deterministic unit vectors: dim uniform values in [-0.5, 0.5) from
    * xxhash64(id, salt, i), then L2-normalized (cosine-at-ingest).
    *
    * Two regimes, both seeded and reproducible:
    *   - `clusters = 0`: i.i.d. uniform — the reference bench's own data
    *     (`random_vector`) and the ADVERSARIAL case for any
    *     clustering-based ANN: with no structure, cell membership carries
    *     little information about the top-10, so recall tracks the scanned
    *     fraction. HNSW tolerates this; IVF degrades by design.
    *   - `clusters > 0`: mixture model — each point = its cluster's center
    *     + uniform noise (spread σ≈0.35 of the center scale), the shape of
    *     real embedding corpora, where IVF recall concentrates. Queries
    *     draw from the same mixture.
    */
  def genVectors(spark: SparkSession, n: Long, salt: String, clusters: Int): DataFrame = {
    def u(seed: Column, i: Column): Column =
      pmod(xxhash64(seed, lit(salt), i), lit(1000000)).cast("double") /
        lit(1000000.0d) - lit(0.5d)
    val raw =
      if (clusters <= 0)
        transform(sequence(lit(1), lit(Dim)), i => u(col("id"), i))
      else {
        // center from the cluster id (shared salt "ctr" so queries drawn
        // with a different point salt still hit the same mixture)
        val cid = pmod(xxhash64(col("id"), lit(salt), lit("cl")), lit(clusters))
        transform(sequence(lit(1), lit(Dim)), i =>
          pmod(xxhash64(cid, lit("ctr"), i), lit(1000000)).cast("double") /
            lit(1000000.0d) - lit(0.5d) + lit(0.35d) * u(col("id"), i))
      }
    spark.range(n).toDF("id")
      .withColumn("_raw", raw)
      .withColumn("_norm",
        sqrt(aggregate(col("_raw"), lit(0.0d), (a, x) => a + x * x)))
      .withColumn("vec",
        transform(col("_raw"), x => (x / col("_norm")).cast("float")))
      .select("id", "vec")
  }

  /** Build-once artifacts: generated base table, trained centroids, and the
    * centroid-partitioned physical layout (parquet dir per cell — a probe
    * filter becomes directory pruning, the 100 TB shape). */
  def ensureArtifacts(spark: SparkSession, dir: String, n: Long, kCells: Int,
      clusters: Int): IvfIndex.Model = {
    val partedPath = s"$dir/assigned_parted"
    val modelPath = s"$dir/centroids_k$kCells.txt"
    val done = new java.io.File(s"$dir/_ARTIFACTS_OK")
    if (done.exists()) {
      IvfIndex.loadCached(modelPath).getOrElse(
        sys.error(s"artifact marker present but no model at $modelPath"))
    } else {
      val base = genVectors(spark, n, "base", clusters)
      // sample-bounded driver-side training (64/centroid at k=1024 = 65536
      // points; the driver-merge of the deterministic sample stays ~1 GB)
      val model = IvfIndex.buildOrLoad(base, "vec", kCells, modelPath,
        samplePerCentroid = 64)
      val assigned = IvfIndex.assign(base, "vec", model)
      // one file per cell: repartition BY the partition column first
      IvfIndex.writePartitioned(assigned.repartition(col("centroid_id")), partedPath)
      done.getParentFile.mkdirs()
      java.nio.file.Files.write(done.toPath, "ok".getBytes("UTF-8"))
      model
    }
  }

  def assignedTable(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/assigned_parted")

  /** The seeded query set, driver-side (tiny: nq × dim doubles). */
  def queryVectors(spark: SparkSession, nq: Int, clusters: Int): Seq[Seq[Double]] =
    genVectors(spark, nq.toLong, "query", clusters)
      .orderBy("id").select(col("vec").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toSeq).toSeq

  /** Batch IVF search: per-query probed cells resolved driver-side
    * (nq × k centroid distances), then ONE broadcast equi-join on the cell
    * id — the big side streams once; the per-query top-k reduction is
    * map-side bounded (Search.batchRank: heap-aggregator partial combine). */
  def ivfBatch(
      assigned: DataFrame,
      queries: Seq[Seq[Double]],
      model: IvfIndex.Model,
      nprobe: Int,
      k: Int = Top): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val probes = queries.zipWithIndex.flatMap { case (q, qi) =>
      model.probe(q, nprobe).map(c => (qi, c, q))
    }
    val qdf = probes.toDF("qid", "cell", "qvec")
      .withColumn("qvec", col("qvec").cast("array<float>"))
    // static isin on the UNION of probed cells: a literal predicate on the
    // partition column, so unprobed cell directories are pruned at the scan
    // (the broadcast-join key alone cannot prune partitions)
    val allCells = probes.map(_._2).distinct
    assigned.filter(col("centroid_id").isin(allCells: _*))
      .join(broadcast(qdf), col("centroid_id") === col("cell"))
      .withColumn("score", round(Search.scoreExpr(Dot, col("vec"), col("qvec")), 6))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("score").desc, col("id").asc)))
      .filter(col("_rn") <= k)
      .select(col("qid"), col("id"), col("score"))
  }

  /** Exact batch ground truth over the full table (the "plain" baseline). */
  def exactBatch(assigned: DataFrame, queries: Seq[Seq[Double]], k: Int = Top): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val qdf = queries.zipWithIndex.map { case (q, qi) => (qi, q) }
      .toDF("qid", "qvec")
      .withColumn("qvec", col("qvec").cast("array<float>"))
    Search.knnBatch(assigned, "id", "vec", qdf, "qid", "qvec", Dot, k)
      .select(col("qid"), col("id"), col("score"))
  }

  def topIdsByQuery(df: DataFrame): Map[Int, Set[Long]] =
    df.select("qid", "id").collect()
      .groupBy(_.getInt(0)).map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }

  def recallAt(result: DataFrame, truth: Map[Int, Set[Long]]): Double = {
    val got = topIdsByQuery(result)
    val per = truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }
    per.sum / per.size
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_IVF_N", "1000000").toLong
    val kCells = sys.env.getOrElse("SPARK_GRAFT_IVF_CELLS", "1024").toInt
    val nq = sys.env.getOrElse("SPARK_GRAFT_IVF_QUERIES", "100").toInt
    val clusters = sys.env.getOrElse("SPARK_GRAFT_IVF_CLUSTERS", "0").toInt
    val defaultDir =
      if (clusters > 0) s"/tmp/graft_runtime/ivf1m_c$clusters"
      else "/tmp/graft_runtime/ivf1m"
    val dir = sys.env.getOrElse("SPARK_GRAFT_IVF_DIR", defaultDir)
    val probeSettings = sys.env.getOrElse("SPARK_GRAFT_IVF_PROBES", "1,2,4,8,16,32,64")
      .split(",").map(_.trim.toInt).toSeq
    val singleReps = sys.env.getOrElse("SPARK_GRAFT_IVF_SINGLE_REPS", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    val model = ensureArtifacts(spark, dir, n, kCells, clusters)
    val buildSec = (System.nanoTime() - t0) / 1e9
    val assigned = assignedTable(spark, dir)
    val queries = queryVectors(spark, nq, clusters)

    def time(fn: () => Unit): Double = {
      val t = System.nanoTime(); fn(); (System.nanoTime() - t) / 1e9
    }
    // median of 3 timed runs after one warm-up — heavy neighbors (the
    // plain batch churns the heap) otherwise bleed GC into the next setting
    def timedMedian(fn: () => Unit): Double = {
      fn()
      Seq(time(fn), time(fn), time(fn)).sorted.apply(1)
    }

    // ground truth (cached as parquet next to the table)
    val gtPath = s"$dir/ground_truth_q$nq"
    if (!new java.io.File(gtPath).exists())
      exactBatch(assigned, queries).write.mode("overwrite").parquet(gtPath)
    val truth = topIdsByQuery(spark.read.parquet(gtPath))

    // plain baselines
    def plainSingle(q: Seq[Double]): Unit = {
      Search.knn(assigned, "id", "vec", q, Dot, k = Top).collect(): Unit
    }
    plainSingle(queries.head)
    val plainSingleSec =
      queries.take(singleReps).map(q => time(() => plainSingle(q))).sorted
        .apply(singleReps / 2)
    val plainBatchSec = timedMedian(() => { exactBatch(assigned, queries).count(): Unit })

    val perProbe = probeSettings.map { np =>
      // single-query latency: median over `singleReps` distinct queries,
      // after one warm-up (the reference bench's per-iteration regime)
      def one(q: Seq[Double]): Unit = {
        IvfIndex.search(assigned, "id", "vec", model, q, Dot, np, Top).collect(): Unit
      }
      one(queries.head)
      val singles = queries.take(singleReps).map(q => time(() => one(q))).sorted
      val singleSec = singles(singles.length / 2)
      val batchSec = timedMedian(() => { ivfBatch(assigned, queries, model, np).count(): Unit })
      val recall = recallAt(ivfBatch(assigned, queries, model, np), truth)
      (np, recall, singleSec, batchSec)
    }

    val probeJson = perProbe.map { case (np, r, s, b) =>
      s""""$np":{"recall":${f"$r%.4f"},"single_sec":${f"$s%.3f"},"batch${nq}_sec":${f"$b%.3f"}}"""
    }.mkString("{", ",", "}")
    val json =
      s"""{"n":$n,"dim":$Dim,"top":$Top,"k_cells":$kCells,"queries":$nq,""" +
        s""""clusters":$clusters,""" +
        s""""build_sec":${f"$buildSec%.1f"},""" +
        s""""plain_single_sec":${f"$plainSingleSec%.3f"},""" +
        s""""plain_batch${nq}_sec":${f"$plainBatchSec%.3f"},""" +
        s""""probe":$probeJson}"""
    val suffix = if (clusters > 0) s"_c$clusters" else ""
    val p = java.nio.file.Paths.get(s"target/ivf_recall_1m$suffix.json")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, json.getBytes("UTF-8"))
    spark.stop()
    println(json)
  }
}
