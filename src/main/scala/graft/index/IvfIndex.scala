package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model._
import graft.ops.Search

/** IVF (inverted-file) approximate nearest neighbor: KMeans centroids as a
  * partition column, query-time probe pruning as a plain filter, exact
  * scoring within probed cells.
  *
  * This replaces qdrant's HNSW for the bulk/batch regime (SURVEY.md §2.6,
  * §7.1 step 9): at 100 TB the assignment column becomes the table's
  * physical partitioning, so an nprobe query prunes to nprobe/k of the data
  * at the parquet-scan level — no graph, no custom SparkStrategy, and
  * `exact = true` (nprobe = k) degrades gracefully to the full scan.
  * Recall/latency knob = nprobe, mirroring hnsw `ef`.
  */
object IvfIndex {

  final case class Model(centroids: Seq[Seq[Double]]) {
    def k: Int = centroids.length

    /** Nearest-centroid ids for a query vector (driver-side, k is small). */
    def probe(query: Seq[Double], nprobe: Int): Seq[Int] =
      centroids.zipWithIndex
        .map { case (c, i) =>
          (i, c.zip(query).map { case (a, b) => (a - b) * (a - b) }.sum)
        }
        .sortBy { case (i, d) => (d, i) }
        .take(nprobe).map(_._1)
  }

  /** Fit centroids on a bounded sample with driver-side Lloyd's iterations
    * (the standard IVF training regime — e.g. faiss trains on ~256·k
    * sampled points). One Spark job (the sample collect) regardless of
    * table size; deterministic under `seed`. The alternative distributed
    * fit (MLlib KMeans) costs ~maxIter cluster jobs and buys nothing:
    * centroid quality is set by the sample, not by scanning every row. */
  def build(df: DataFrame, vecCol: String, k: Int, maxIter: Int = 20,
      seed: Long = 42L, samplePerCentroid: Int = 256): Model = {
    buildCount.incrementAndGet()
    val target = k * samplePerCentroid
    // deterministic pseudo-random sample without a count(): order by a hash
    // of the vector bytes and take the first `target`
    val sample = df
      .select(col(vecCol).cast("array<double>").as("v"))
      .filter(col("v").isNotNull) // optional-vector rows don't train cells
      .orderBy(xxhash64(col("v")), monotonically_increasing_id())
      .limit(target)
      .collect()
      .map(_.getSeq[Double](0).toArray)
    Model(lloyd(sample, k, maxIter, seed).map(_.toSeq))
  }

  /** Train-once-persist (the real deployment shape): centroids are an
    * artifact of index BUILD time, reused by every query — the reference
    * likewise builds its vector index once and serves reads from it, it
    * never re-trains per query. `buildOrLoad` memoizes the model in-process
    * and persists it as a tiny text artifact (k × dim doubles) at
    * `cachePath`, so repeated invocations — and separate JVMs over the same
    * collection — pay training exactly once. Delete the file to re-train. */
  def buildOrLoad(df: DataFrame, vecCol: String, k: Int, cachePath: String,
      maxIter: Int = 20, seed: Long = 42L, samplePerCentroid: Int = 256): Model =
    memo.computeIfAbsent(cachePath, { _ =>
      val p = java.nio.file.Paths.get(cachePath)
      readModel(p).getOrElse {
        val m = build(df, vecCol, k, maxIter, seed, samplePerCentroid)
        try {
          if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
          val body = m.centroids.map(_.mkString(",")).mkString("\n")
          java.nio.file.Files.write(p, body.getBytes("UTF-8"))
        } catch { case _: java.io.IOException => () } // cache is best-effort
        m
      }
    })

  /** Train NOW and overwrite any existing artifact + memo entry — the
    * collection-create path (a create replaces the corpus, so a stale
    * model from a previous collection at the same path must not leak in;
    * `buildOrLoad` is for read-side callers that want train-once reuse). */
  def buildAndPersist(df: DataFrame, vecCol: String, k: Int, cachePath: String,
      maxIter: Int = 20, seed: Long = 42L, samplePerCentroid: Int = 256): Model = {
    val m = build(df, vecCol, k, maxIter, seed, samplePerCentroid)
    val p = java.nio.file.Paths.get(cachePath)
    try {
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      val body = m.centroids.map(_.mkString(",")).mkString("\n")
      java.nio.file.Files.write(p, body.getBytes("UTF-8"))
    } catch { case _: java.io.IOException => () }
    memo.put(cachePath, m)
    m
  }

  private val memo = new java.util.concurrent.ConcurrentHashMap[String, Model]()

  /** Cached model lookup WITHOUT a build fallback: in-process memo first,
    * then the persisted artifact. Lets a caller that derives k from a
    * data-dependent law (e.g. auto-sized near-dup cells) skip the N-count
    * job entirely when the model is already trained — k is implicit in the
    * artifact. */
  def loadCached(cachePath: String): Option[Model] = {
    val hit = memo.get(cachePath)
    if (hit != null) Some(hit)
    else readModel(java.nio.file.Paths.get(cachePath)).map { m =>
      memo.putIfAbsent(cachePath, m); m
    }
  }

  /** Training invocations this JVM — observability hook for tests asserting
    * train-once behavior. */
  private[graft] val buildCount = new java.util.concurrent.atomic.AtomicLong()

  private def readModel(p: java.nio.file.Path): Option[Model] =
    if (!java.nio.file.Files.isRegularFile(p)) None
    else try {
      val lines = new String(
        java.nio.file.Files.readAllBytes(p), "UTF-8").split("\n").toSeq
      Some(Model(lines.filter(_.nonEmpty).map(_.split(",").toSeq.map(_.toDouble))))
    } catch { case _: Exception => None }

  /** Plain Lloyd's k-means with k-means++ seeding, driver-side. */
  private[graft] def lloyd(
      points: Array[Array[Double]], k: Int, maxIter: Int, seed: Long): Seq[Array[Double]] = {
    require(points.nonEmpty, "cannot train IVF on an empty table")
    val dim = points.head.length
    val rng = new scala.util.Random(seed)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // k-means++ seeding. The per-new-center minD refresh is embarrassingly
    // parallel over points (each slot updated independently) — parallelism
    // changes no result, only wall time, which matters once k reaches the
    // IVF-at-scale regime (k=1024, 256k samples: ~4e9 flops of seeding).
    val centers = scala.collection.mutable.ArrayBuffer(points(rng.nextInt(points.length)))
    val minD = points.map(p => d2(p, centers.head))
    while (centers.length < math.min(k, points.length)) {
      val total = minD.sum
      val target = if (total > 0) rng.nextDouble() * total else 0.0
      var acc = 0.0; var pick = 0
      var i = 0
      while (i < points.length && acc <= target) { acc += minD(i); pick = i; i += 1 }
      centers += points(pick)
      val last = centers.last
      java.util.stream.IntStream.range(0, points.length).parallel().forEach { j =>
        val d = d2(points(j), last)
        if (d < minD(j)) minD(j) = d
      }
    }
    val cs = centers.toArray
    val assign = new Array[Int](points.length)
    var it = 0
    var moved = true
    val movedFlag = new java.util.concurrent.atomic.AtomicBoolean()
    while (it < maxIter && moved) {
      movedFlag.set(false)
      // assignment step: independent per point, deterministic (first-min
      // ties, same sequential d2 per point) — safe to parallelize
      java.util.stream.IntStream.range(0, points.length).parallel().forEach { i =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < cs.length) {
          val d = d2(points(i), cs(c))
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        if (assign(i) != best) { assign(i) = best; movedFlag.set(true) }
      }
      moved = movedFlag.get()
      val sums = Array.fill(cs.length)(new Array[Double](dim))
      val counts = new Array[Int](cs.length)
      var p = 0
      while (p < points.length) {
        val c = assign(p); counts(c) += 1
        var j = 0
        while (j < dim) { sums(c)(j) += points(p)(j); j += 1 }
        p += 1
      }
      var c = 0
      while (c < cs.length) {
        if (counts(c) > 0) {
          var j = 0
          while (j < dim) { cs(c)(j) = sums(c)(j) / counts(c); j += 1 }
        }
        c += 1
      }
      it += 1
    }
    cs.toSeq
  }

  /** Argmin-centroid assignment as a pure column expression (no UDF):
    * the column to partition/Z-order the table by at scale. A single
    * loop-based Expression over the centroid matrix — the unrolled
    * array-of-k-distances form blows whole-stage codegen's 64 KB method
    * limit once k reaches a few hundred (auto-sized near-dup, large IVF)
    * and silently degrades to interpretation; this stays codegen'd at any
    * k with bit-identical assignments (same sequential-double L2,
    * first-min ties). */
  def assignExpr(vecCol: Column, model: Model): Column =
    graft.functions.VecKernels.centroidArgmin(vecCol, model.centroids)

  def assign(df: DataFrame, vecCol: String, model: Model): DataFrame =
    df.withColumn("centroid_id", assignExpr(col(vecCol), model))

  /** Materialize the assigned table partitioned BY the centroid column —
    * the physical 100 TB layout: each cell is a parquet partition
    * directory, so a probe filter becomes PartitionFilters (directory
    * pruning — unprobed cells are never listed, let alone read). */
  def writePartitioned(
      assigned: DataFrame, path: String,
      mode: org.apache.spark.sql.SaveMode = org.apache.spark.sql.SaveMode.Overwrite): Unit =
    assigned.write.mode(mode).partitionBy("centroid_id").parquet(path)

  /** Probe-pruned exact search: filter to nprobe nearest cells, then the
    * standard exact top-k. With nprobe = model.k this IS the exact search.
    * `pred` is the payload filter of a FILTERED ANN request — it ANDs into
    * the same scan as the cell prune (partition prune + data filter on one
    * parquet scan; the reference serves this online via `payload_m`
    * filtered subgraphs / ACORN, `types.rs:622`). */
  def search(
      assigned: DataFrame,
      idCol: String,
      vecCol: String,
      model: Model,
      query: Seq[Double],
      metric: Metric,
      nprobe: Int,
      k: Int = 10,
      pred: Option[Column] = None): DataFrame = {
    val cells = model.probe(query, nprobe)
    val cellPred = col("centroid_id").isin(cells: _*)
    val pruned = assigned.filter(pred.fold(cellPred)(cellPred && _))
    Search.scoredTopK(pruned, idCol,
      Search.scoreExpr(metric, col(vecCol), typedLit(query)), metric.largerBetter,
      k = k)
  }
}
