package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 2-D spatial ε-distance self-join — the planar companion to
  * [[RangeJoin]]'s 1-D interval grid: all point pairs within Euclidean
  * distance r, found via GRID-CELL bucketing instead of the O(N²) cross
  * join (the geo-join primitive: store proximity, sensor co-location,
  * spatial dedup).
  *
  * Scheme: integer coordinates quantize to cells of side `cell ≥ r`; one
  * side replicates to its 3×3 cell NEIGHBORHOOD, the other stays in its
  * home cell, so every qualifying pair (|Δ| ≤ r ⇒ cell distance ≤ 1) meets
  * in EXACTLY ONE (cell, home) combination — no post-dedup pass at all
  * (each candidate pair appears once because the home side has one home
  * cell). Survivors verify with the exact integer test Δx²+Δy² ≤ r².
  *
  * Scale shape: one (cx, cy)-keyed shuffle whose fan-in is cell occupancy
  * (data-density bounded, never corpus-squared); the 9× replication
  * multiplies only the probe side pre-shuffle. Degenerate hot cells are
  * ordinary skewed keys — AQE skew-split or salting apply as with any
  * keyed join.
  */
object SpatialJoin {

  /** @param points (id: long, x: long, y: long) — integer plane coords,
    *   NON-NEGATIVE (shift upstream if needed: the cell quantization uses
    *   truncating division, which equals floor division only at x ≥ 0).
    * @param r2   squared distance threshold (inclusive).
    * @param cell grid side; must satisfy cell ≥ ⌈√r2⌉ so adjacent cells
    *             cover the radius.
    * @return (id_a, id_b, d2) with id_a < id_b, d2 = Δx²+Δy² ≤ r2. */
  def withinDistance(points: DataFrame, r2: Long, cell: Long): DataFrame = {
    require(cell > 0 && cell * cell >= r2,
      s"cell side $cell must cover the radius (cell^2 >= $r2)")
    val p = points.select(col("id").cast("long").as("id"),
      col("x").cast("long").as("x"), col("y").cast("long").as("y"))
    import graft.core.idiv
    def cellOf(c: org.apache.spark.sql.Column) = idiv(c, lit(cell))
    val home = p.select(col("id").as("id_b"), col("x").as("bx"), col("y").as("by"),
      cellOf(col("x")).as("cx"), cellOf(col("y")).as("cy"))
    val offsets = for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))
    val probe = p.select(col("id").as("id_a"), col("x").as("ax"), col("y").as("ay"),
        cellOf(col("x")).as("hcx"), cellOf(col("y")).as("hcy"),
        explode(array(offsets: _*)).as("o"))
      .select(col("id_a"), col("ax"), col("ay"),
        (col("hcx") + col("o.dx")).as("cx"), (col("hcy") + col("o.dy")).as("cy"))
    probe.join(home, Seq("cx", "cy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("d2", (col("ax") - col("bx")) * (col("ax") - col("bx"))
        + (col("ay") - col("by")) * (col("ay") - col("by")))
      .filter(col("d2") <= r2)
      .select(col("id_a"), col("id_b"), col("d2"))
  }
}
