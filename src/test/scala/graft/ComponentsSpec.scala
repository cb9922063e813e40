package graft

import graft.operators.NearDup

/** Hand-built graph cases for the connected-components dedup grouping. */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("min-label propagation finds components of chains, stars and isolated pairs") {
    // chain 1-2-3-4, star 10-{11,12,13}, pair 20-21
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L),
      (20L, 21L)).toDF("id_a", "id_b")
    val got = NearDup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    val expected = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L)
    assert(got == expected)
  }

  test("a long path still converges (diameter > iteration-1)") {
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = NearDup.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    assert(got == (1L to 12L).map(_ -> 1L).toMap)
  }
}
