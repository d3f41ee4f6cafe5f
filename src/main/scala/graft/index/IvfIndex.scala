package graft.index

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
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

  /** Fit centroids with MLlib KMeans (deterministic under `seed`). */
  def build(df: DataFrame, vecCol: String, k: Int, maxIter: Int = 20,
      seed: Long = 42L): Model = {
    val feats = df.select(array_to_vector(col(vecCol).cast("array<double>"))
      .as("features"))
    val km = new KMeans().setK(k).setMaxIter(maxIter).setSeed(seed)
    val model = km.fit(feats)
    Model(model.clusterCenters.toSeq.map(_.toArray.toSeq))
  }

  /** Argmin-centroid assignment as a pure column expression (no UDF):
    * the column to partition/Z-order the table by at scale. */
  def assignExpr(vecCol: Column, model: Model): Column = {
    val dists = model.centroids.map { c =>
      graft.functions.VecKernels.l2sq(vecCol, typedLit(c))
    }
    val arr = array(dists: _*)
    (array_position(arr, array_min(arr)) - 1).cast("int")
  }

  def assign(df: DataFrame, vecCol: String, model: Model): DataFrame =
    df.withColumn("centroid_id", assignExpr(col(vecCol), model))

  /** Probe-pruned exact search: filter to nprobe nearest cells, then the
    * standard exact top-k. With nprobe = model.k this IS the exact search. */
  def search(
      assigned: DataFrame,
      idCol: String,
      vecCol: String,
      model: Model,
      query: Seq[Double],
      metric: Metric,
      nprobe: Int,
      k: Int = 10): DataFrame = {
    val cells = model.probe(query, nprobe)
    val pruned = assigned.filter(col("centroid_id").isin(cells: _*))
    Search.scoredTopK(pruned, idCol,
      Search.scoreExpr(metric, col(vecCol), typedLit(query)), metric.largerBetter,
      k = k)
  }
}
