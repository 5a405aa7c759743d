package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-bucketed SPATIAL NEAR-NEIGHBOR self-join — the fixed-grid
  * spatial-join shape (the GIS standard; also the 2-D instance of the
  * LSH bucket discipline used across the near-dup family): points
  * bucket into square cells of width `radius`, so every pair within
  * `radius` lives in the same or one of the 8 neighboring cells;
  * candidates come from a 9-way cell-offset equi-join, the verify is
  * EXACT integer `dist² ≤ r²`. Never all-pairs — cost ∝ points per
  * 3×3 neighborhood, never corpus².
  *
  * Deliberately trig-free: coordinates are integer grid units (project
  * lat/lon upstream) and the verify is exact long arithmetic, so the
  * result is engine-portable with no libm agreement needed anywhere.
  *
  * Skew contract (the [[EntityResolution]] `maxBlockSize` discipline):
  * a cell holding more than `maxCellSize` points is dropped WHOLE from
  * both sides — a degenerate coordinate (every point at the origin,
  * null-island pileups) must not go quadratic; dropped-cell pairs are
  * lost, by documented design. Sized so the 3×3 neighborhood of a full
  * cell stays bounded.
  */
object Spatial {

  /** All unordered pairs (idA < idB) within `radius` (Euclidean, exact
    * integer verify). `xCol`/`yCol` must be non-negative integer
    * coordinates. Returns (idA, idB, dist2).
    *
    * Scale shape: one cell partial-agg count + anti-join for the cap
    * (8-byte cell keys), then one 9-way expanded equi-join on cell —
    * the left side emits 9 probe rows per point, the right side never
    * expands; each unordered pair is found exactly once per orientation
    * and `idA < idB` keeps one.
    */
  def nearbyPairs(points: DataFrame, idCol: String, xCol: String,
      yCol: String, radius: Long, maxCellSize: Int = 10000): DataFrame = {
    require(radius >= 1, s"radius must be >= 1, got $radius")
    require(maxCellSize >= 2, s"maxCellSize must be >= 2, got $maxCellSize")
    val base = Parallelism.ensureCompute(points)
      .select(col(idCol).cast("long").as("id"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .withColumn("cx", expr(s"x div ${radius}L"))
      .withColumn("cy", expr(s"y div ${radius}L"))
    val crowded = base.groupBy(col("cx"), col("cy"))
      .agg(count(lit(1)).as("__n")).where(col("__n") > maxCellSize)
      .select(col("cx"), col("cy"))
    val kept = base.join(crowded, Seq("cx", "cy"), "left_anti")
    val offsets = for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))
    val probes = kept.select(col("id"), col("x"), col("y"),
        col("cx"), col("cy"), explode(array(offsets: _*)).as("o"))
      .select(col("id"), col("x"), col("y"),
        (col("cx") + col("o.dx")).as("pcx"), (col("cy") + col("o.dy")).as("pcy"))
    val home = kept.select(col("id").as("idB"), col("x").as("xb"),
      col("y").as("yb"), col("cx").as("pcx"), col("cy").as("pcy"))
    val dx = col("x") - col("xb")
    val dy = col("y") - col("yb")
    probes.join(home, Seq("pcx", "pcy"))
      .where(col("id") < col("idB"))
      .withColumn("dist2", dx * dx + dy * dy)
      .where(col("dist2") <= radius * radius)
      .select(col("id").as("idA"), col("idB"), col("dist2"))
  }
}
