package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys: the fact side gets a deterministic salt
  * in [0, n), the dimension side is replicated n× (one row per salt), and the
  * join key becomes (key, salt) — a single hot key now spreads over n
  * reducers instead of melting one. Result set is provably identical to the
  * unsalted join (every fact row meets exactly one replica of its dim row).
  *
  * AQE's skew-join handles this adaptively for sort-merge joins; explicit
  * salting remains the tool for deterministic layouts, streaming state, and
  * aggregations after the join. The salt is derived by hashing the fact's
  * whole key tuple — deterministic across retries (no rand(), which would
  * break task-retry idempotency at scale).
  */
object SkewJoin {

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, numSalts: Int = 8): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col).toSeq: _*), lit(numSalts.toLong)))
    val replicated = dim
      .withColumn("__salt", explode(sequence(lit(0L), lit(numSalts.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
