package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.model._

/** Dense-vector similarity as Catalyst column expressions.
  *
  * All scores are computed in DOUBLE precision with a strict sequential
  * left-to-right fold (matching DuckDB's list_dot_product/list_distance
  * evaluation order), so results are reproducible bit-for-bit across engines.
  *
  * Formula parity with qdrant `lib/segment/src/spaces/simple.rs`:
  *  - Dot:       Σ aᵢbᵢ                      (larger better)
  *  - Cosine:    dot(a,b)/(‖a‖·‖b‖)          (qdrant L2-normalizes at ingest
  *               then dots — same value; simple.rs:169-207)
  *  - Euclid:    internal −Σ(aᵢ−bᵢ)², postprocessed |s|.sqrt() → we expose
  *               the user-visible sqrt(Σd²), smaller better (simple.rs:74-78)
  *  - Manhattan: Σ|aᵢ−bᵢ|, smaller better (simple.rs:119-121)
  */
object VectorFunctions {

  private def d(x: Column): Column = x.cast("double")

  /** Sequential fold Σ aᵢ·bᵢ over two array<float|double> columns
    * (codegen'd scalar loop, see [[VecKernels]]). */
  def dot(a: Column, b: Column): Column = VecKernels.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  def euclidDist(a: Column, b: Column): Column = sqrt(VecKernels.l2sq(a, b))

  def manhattanDist(a: Column, b: Column): Column = VecKernels.l1(a, b)

  /** Score column for a metric; order direction per [[Metric.largerBetter]]. */
  def score(metric: Metric, v: Column, q: Column): Column = metric match {
    case Dot       => dot(v, q)
    case Cosine    => cosine(v, q)
    case Euclid    => euclidDist(v, q)
    case Manhattan => manhattanDist(v, q)
  }

  /** x/(1+|x|), range (−1,1). Ref `lib/common/common/src/math.rs:7-10`. */
  def fastSigmoid(x: Column): Column = x / (lit(1.0d) + abs(x))

  /** 0.5·(fastSigmoid(x)+1), range (0,1). Ref `math.rs:14-18`. */
  def scaledFastSigmoid(x: Column): Column = lit(0.5d) * (fastSigmoid(x) + lit(1.0d))

  /** SIMILARITY orientation of a metric — larger-better for EVERY metric,
    * matching the reference's internal `Metric::similarity`: Dot/Cosine
    * as-is, Euclid −Σ(a−b)² (negated squared L2, NO sqrt —
    * `euclid_similarity`, `lib/segment/src/spaces/simple.rs:214-218`),
    * Manhattan −Σ|a−b| (`manhattan_similarity`, `simple.rs:222-227`).
    * Distinct from [[score]], which returns the USER-VISIBLE score
    * (distances positive, sqrt applied) used for thresholds/output. */
  def similarity(metric: Metric, a: Column, b: Column): Column = metric match {
    case Dot       => dot(a, b)
    case Cosine    => cosine(a, b)
    case Euclid    => -VecKernels.l2sq(a, b)
    case Manhattan => -VecKernels.l1(a, b)
  }

  /** MaxSim multivector comparator: Σ_{a∈query} max_{b∈stored} sim(a,b).
    * Ref `lib/segment/src/vector_storage/query_scorer/mod.rs:77-108`;
    * comparator is MaxSim-only for multivectors (`types.rs:2080-2082`).
    * `stored` is array<array<float>>, `queryVecs` likewise.
    *
    * The inner max runs over [[similarity]], NOT [[score]]: for
    * distance metrics the best token pair is the SMALLEST distance, and
    * the reference deliberately skips the sqrt postprocess inside MaxSim
    * ("ranking will be the same", `query_scorer/mod.rs:71-76`), so the
    * result is a larger-better similarity for every metric.
    */
  def maxSim(metric: Metric, stored: Column, queryVecs: Column): Column =
    aggregate(
      queryVecs,
      lit(0.0d),
      (acc, qv) => acc + array_max(transform(stored, sv => similarity(metric, sv, qv))))

  /** Literal-query MaxSim through the fused kernel ([[MaxSimExpr]]): one
    * nested loop per row, no per-token sims array — bit-identical to the
    * HOF above (IndexSpec pins fused == HOF on every metric). Use this
    * overload whenever the query matrix is known at plan time (every
    * request-shaped call); the Column overload remains for dynamic
    * query-matrix columns (e.g. batch joins). */
  def maxSim(metric: Metric, stored: Column, queryVecs: Seq[Seq[Double]]): Column =
    VecKernels.maxSimLit(stored, queryVecs, metric match {
      case Dot => 0
      case Euclid => 1
      case Manhattan => 2
      case Cosine => 3
    })

  /** Sparse dot product over intersecting indices. Both operands are
    * struct<indices: array<int>, values: array<float>> with sorted unique
    * indices. Ref `lib/sparse/src/common/sparse_vector.rs:17-22` (format),
    * scoring `lib/sparse/src/index/search_context.rs`. One codegen'd
    * merge-intersect loop, O(|stored| + |query|) per row
    * ([[SparseDotExpr]] — measured 8× over the array_position chain at
    * 200k×dim-64, SCALEPROBE_r09.md); the bulk path can alternatively
    * explode to an inverted postings join ([[graft.index.SparseIndex]]). */
  def sparseDot(indices: Column, values: Column, qIndices: Seq[Long], qValues: Seq[Double]): Column =
    org.apache.spark.sql.GraftShim.column(
      graft.functions.SparseDotExpr(
        org.apache.spark.sql.GraftShim.expression(indices),
        org.apache.spark.sql.GraftShim.expression(values),
        qIndices.toArray, qValues.toArray))

  /** Haversine distance in meters between two lon/lat points (degrees).
    *
    * Earth radius: the reference's filter checks go through the geo
    * crate's `Haversine.distance` (`types.rs:23,3446`, geo 0.33), whose
    * `MEAN_EARTH_RADIUS` is the IUGG mean radius 6 371 008.8 m — the
    * reference's own unit test pins the resulting distance
    * ((0,0)→(0.5,0.5) = 78626.29627999048 m, `types.rs:5248`), which this
    * constant reproduces to the last digit (IndexSpec). The coarser
    * 6 371 000.0 appears in the reference only inside the geohash REGION
    * estimator (`geo_hash.rs:538`) where the cover is a recall-safe
    * superset either way.
    */
  val EarthRadiusMeters = 6371008.8
  /** Strict bounding-box predicate (`GeoBoundingBox::check_point`,
    * `types.rs:3407-3420`): EXCLUSIVE on every edge, with the antimeridian
    * arm when `tlLon > brLon`. The ONE definition shared by the filter
    * compiler and the geo index so the two gates cannot diverge. */
  def inBboxStrict(lon: Column, lat: Column,
      tlLon: Double, tlLat: Double, brLon: Double, brLat: Double): Column = {
    val lonOk =
      if (tlLon > brLon) lon > lit(tlLon) || lon < lit(brLon) // antimeridian
      else lon > lit(tlLon) && lon < lit(brLon)
    lonOk && lat < lit(tlLat) && lat > lit(brLat)
  }

  def haversineMeters(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column = {
    val toRad = math.Pi / 180.0
    val dLat = (lat2 - lat1) * toRad
    val dLon = (lon2 - lon1) * toRad
    val a = pow(sin(dLat / 2), 2) +
      cos(lat1 * toRad) * cos(lat2 * toRad) * pow(sin(dLon / 2), 2)
    lit(2.0 * EarthRadiusMeters) * asin(sqrt(a))
  }
}
