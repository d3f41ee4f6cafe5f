package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.filters.{FieldResolver, FilterCompiler}
import graft.model._

/** Group-by search: keep the best `groupSize` hits per distinct value of a
  * payload key, return the best `groups` groups ordered by their top hit.
  *
  * Ref `lib/collection/src/grouping/group_by.rs:262-340`. qdrant's serving
  * loop re-queries with exclusion filters until groups fill; as a batch
  * engine we compute the full grouped ranking in one pass — two windows, one
  * shuffle on the group key. A multi-valued group field puts the point in
  * every matching group (`lib/api/src/rest/schema.rs:1136-1140`); points
  * missing the field are skipped.
  */
object GroupBy {

  def groupBySearch(
      points: DataFrame,
      idCol: String,
      scoreExpr: Column,
      largerBetter: Boolean,
      groupByField: String,
      resolver: FieldResolver,
      filter: Option[Filter] = None,
      groupSize: Int = 3,
      groups: Int = 10,
      keepGroupRank: Boolean = false): DataFrame = {
    val pred = filter.filterNot(_.isEmpty)
      .map(f => new FilterCompiler(resolver).compile(f))
    val base = pred.fold(points)(points.filter)

    val scored = base
      .withColumn("score", round(scoreExpr, 6))
      .select(col(idCol), explode(resolver.groupKeys(groupByField)).as("group_value"),
        col("score"))

    val dir = (c: Column) => if (largerBetter) c.desc else c.asc
    val perGroup = Window.partitionBy(col("group_value"))
      .orderBy(dir(col("score")), col(idCol).asc)
    val hits = scored
      .withColumn("rank", row_number().over(perGroup))
      .filter(col("rank") <= groupSize)

    // Order groups by their best hit, take top `groups`. The rank-1 row per
    // group IS the group's best, so the global selection is a plain
    // orderBy+limit — TakeOrderedAndProject, a per-partition top-k merged on
    // the driver, not a row_number window that funnels every distinct group
    // through one partition (the high-cardinality-group-key scale hazard).
    // The grp_rank window then runs over ≤ `groups` rows (bounded by the
    // request parameter, not the data).
    val topGroups = hits.filter(col("rank") === 1)
      .select(col("group_value").as("gv"), col("score").as("best"))
      .orderBy(dir(col("best")), col("gv").asc)
      .limit(groups)
      .withColumn("grp_rank",
        row_number().over(Window.orderBy(dir(col("best")), col("gv").asc)))
      .select(col("gv"), col("grp_rank"))
    hits.join(broadcast(topGroups), col("group_value") === col("gv"))
      .orderBy(col("grp_rank").asc, col("rank").asc)
      .select((col("group_value") +: col(idCol) +: col("score") +: col("rank") +:
        (if (keepGroupRank) Seq(col("grp_rank")) else Nil)): _*)
  }

  /** Attach a looked-up row from another collection per group
    * (`with_lookup`, ref `lib/collection/src/lookup/mod.rs:22-60`): the group
    * value is interpreted as a point id in `lookup`. */
  def withLookup(
      grouped: DataFrame,
      lookup: DataFrame,
      lookupIdCol: String,
      lookupCols: Seq[String]): DataFrame = {
    val l = lookup.select((lookupIdCol +: lookupCols).distinct.map(col): _*)
    grouped.join(broadcast(l), grouped("group_value") === l(lookupIdCol), "left")
      .drop(lookupIdCol)
  }
}
