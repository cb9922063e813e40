package graft.operators

import graft.functions.z_order
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order (space-filling-curve) clustering rewrite — the layout operator
  * behind multi-column data skipping (Delta/Iceberg OPTIMIZE ZORDER).
  *
  * Both cluster keys are min-max normalized onto a COMMON 16-bit scale
  * before the Morton interleave: interleaving raw keys of different
  * magnitudes degenerates to single-column clustering, because the wider
  * key's high bits occupy all the top interleave positions and every range
  * cut lands on that key alone (caught by the PlanAuditSpec locality
  * check). After normalization the top bits alternate between the two
  * dimensions, so range-partitioning by z-value tightens per-file min/max
  * ranges on BOTH columns at once.
  *
  * Cost: one tiny min/max agg + one range repartition (a sample-based
  * exchange) + a partition-local sort — the same shape as any clustered
  * rewrite, linear at 100 TB.
  */
object ZOrderLayout {

  def cluster(df: DataFrame, colA: String, colB: String, numFiles: Int): DataFrame = {
    val r = df.agg(
      min(col(colA).cast("long")), max(col(colA).cast("long")),
      min(col(colB).cast("long")), max(col(colB).cast("long"))).head()
    require(!r.isNullAt(0) && !r.isNullAt(2),
      s"z-order cluster: $colA/$colB must be non-null on a non-empty input")
    val (aLo, aHi, bLo, bHi) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val aSpan = math.max(aHi - aLo, 1L)
    val bSpan = math.max(bHi - bLo, 1L)
    df.withColumn("__zv", z_order(
        expr(s"(($colA - $aLo) * 65535) DIV $aSpan"),
        expr(s"(($colB - $bLo) * 65535) DIV $bSpan")))
      .repartitionByRange(numFiles, col("__zv"))
      .sortWithinPartitions(col("__zv"))
      .drop("__zv")
  }
}
