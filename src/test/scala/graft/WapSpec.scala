package graft

import graft.sinks.{GraftTableWriter, VersionedTable}

/** Write-audit-publish semantics ([[VersionedTable.publish]]): a rejected
  * branch never touches main, a green publish equals the direct write,
  * publish is metadata-only (no data files land under main), and the
  * optimistic version check refuses to clobber a concurrent main writer.
  */
class WapSpec extends SparkSpec {
  import spark.implicits._

  private def dataDirs(path: String): Set[String] =
    Option(new java.io.File(path).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("d-"))
      .map(_.getName).toSet

  private def rows(path: String): Set[(Long, String)] =
    VersionedTable.read(spark, path).as[(Long, String)].collect().toSet

  test("rejected audit drops the branch; main is untouched") {
    val main = "/tmp/graft_tables/spec_wap_main1"
    val br = "/tmp/graft_tables/spec_wap_br1"
    GraftTableWriter.drop(spark, main); GraftTableWriter.drop(spark, br)
    val v1 = VersionedTable.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), main)
    VersionedTable.cloneAt(spark, main, br, v1)
    VersionedTable.append(Seq((3L, "BAD")).toDF("id", "v"), br)
    // audit: no value may be upper-case -> red -> branch dies
    assert(VersionedTable.read(spark, br).filter($"v" === "BAD").count() == 1)
    GraftTableWriter.drop(spark, br)
    assert(rows(main) == Set((1L, "a"), (2L, "b")))
    assert(VersionedTable.versions(spark, main) == Seq(1))
  }

  test("green publish fast-forwards main, metadata-only, and equals the direct write") {
    val main = "/tmp/graft_tables/spec_wap_main2"
    val br = "/tmp/graft_tables/spec_wap_br2"
    val direct = "/tmp/graft_tables/spec_wap_direct"
    Seq(main, br, direct).foreach(GraftTableWriter.drop(spark, _))
    val base = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val batch = Seq((3L, "c"), (4L, "d")).toDF("id", "v")
    val v1 = VersionedTable.overwrite(base, main)
    val mainDirsBefore = dataDirs(main)

    VersionedTable.cloneAt(spark, main, br, v1)
    VersionedTable.append(batch, br)
    val v2 = VersionedTable.publish(spark, br, main, expectedMainVersion = v1)
    assert(v2 == 2)

    VersionedTable.overwrite(base, direct)
    VersionedTable.append(batch, direct)
    assert(rows(main) == rows(direct))
    // zero-copy: publish committed a manifest, not data — no new dir under main
    assert(dataDirs(main) == mainDirsBefore)
    // time travel still works across the publish boundary
    assert(VersionedTable.readVersion(spark, main, 1).as[(Long, String)]
      .collect().toSet == Set((1L, "a"), (2L, "b")))
  }

  test("publish refuses when main advanced past the branch cut (optimistic check)") {
    val main = "/tmp/graft_tables/spec_wap_main3"
    val br = "/tmp/graft_tables/spec_wap_br3"
    GraftTableWriter.drop(spark, main); GraftTableWriter.drop(spark, br)
    val v1 = VersionedTable.overwrite(Seq((1L, "a")).toDF("id", "v"), main)
    VersionedTable.cloneAt(spark, main, br, v1)
    VersionedTable.append(Seq((2L, "branch")).toDF("id", "v"), br)
    // concurrent writer lands on main after the branch was cut
    VersionedTable.append(Seq((9L, "concurrent")).toDF("id", "v"), main)
    val e = intercept[IllegalStateException] {
      VersionedTable.publish(spark, br, main, expectedMainVersion = v1)
    }
    assert(e.getMessage.contains("publish conflict"))
    // the concurrent row survived; the branch row never landed
    assert(rows(main) == Set((1L, "a"), (9L, "concurrent")))
  }
}
