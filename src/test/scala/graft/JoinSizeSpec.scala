package graft

import graft.core._
import org.apache.spark.sql.functions._

/** The frequency-vector join-size identities the `join_size_estimate` query
  * reports must equal the size of the ACTUALLY EXECUTED join — they are
  * exact identities, not estimates, so an off-by-anything means the
  * aggregation is wrong (null keys, missing groups, overflow).
  */
class JoinSizeSpec extends SparkSpec {
  import spark.implicits._

  test("sum(fA*fB) equals the executed equi-join count; sum(f^2) equals the executed self-join") {
    val dir = sf("sf0.001")
    val li = table(spark, dir, "lineitem").select($"l_partkey")
    val p = table(spark, dir, "part").select($"p_partkey")

    val fa = li.groupBy($"l_partkey").agg(count(lit(1)).as("fa"))
    val fb = p.groupBy($"p_partkey").agg(count(lit(1)).as("fb"))
    val est = fa.join(fb, $"l_partkey" === $"p_partkey")
      .agg(sum($"fa" * $"fb")).as[Long].head()
    val real = li.join(p, $"l_partkey" === $"p_partkey").count()
    assert(est == real, s"sum(fA*fB)=$est but executed join has $real rows")

    val estF2 = fa.agg(sum($"fa" * $"fa")).as[Long].head()
    val realSelf = li.as("a").join(li.as("b"), $"a.l_partkey" === $"b.l_partkey").count()
    assert(estF2 == realSelf, s"F2=$estF2 but executed self-join has $realSelf rows")
  }
}
