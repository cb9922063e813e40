package graft

import graft.sinks.{GraftTableWriter, VersionedTable}
import org.apache.spark.sql.functions._

/** Snapshot semantics of the versioned table format: immutable data dirs,
  * rename-as-commit manifests, time travel, isolation of pinned readers,
  * append-without-rewrite, schema evolution, snapshot expiry, and optimistic
  * concurrency between racing committers.
  */
class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def fileBytes(dir: String): Map[String, Seq[Byte]] = {
    val root = java.nio.file.Paths.get(dir)
    val out = scala.collection.mutable.Map[String, Seq[Byte]]()
    java.nio.file.Files.walk(root).forEach { p =>
      if (java.nio.file.Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
        out(root.relativize(p).toString) = java.nio.file.Files.readAllBytes(p).toSeq
    }
    out.toMap
  }

  test("overwrite/append/upsert produce time-travelable snapshots; append never rewrites") {
    val path = "/tmp/graft_tables/spec_vt"
    GraftTableWriter.drop(spark, path)
    val v1 = VersionedTable.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), path)
    val dirsAfterV1 = fileBytes(path)
    val v2 = VersionedTable.append(Seq((3L, "c")).toDF("id", "v"), path)
    val v3 = VersionedTable.upsert(Seq((2L, "B2"), (4L, "d")).toDF("id", "v"), path, Seq("id"))
    assert((v1, v2, v3) == (1, 2, 3))
    assert(VersionedTable.versions(spark, path) == Seq(1, 2, 3))

    // append added a dir; every v1 data file is still byte-identical
    val afterAll = fileBytes(path)
    dirsAfterV1.foreach { case (rel, bytes) =>
      assert(afterAll.get(rel).contains(bytes), s"append/upsert mutated v1 file $rel")
    }

    def rows(v: Int) = VersionedTable.readVersion(spark, path, v)
      .as[(Long, String)].collect().toSet
    assert(rows(1) == Set((1L, "a"), (2L, "b")))
    assert(rows(2) == Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(rows(3) == Set((1L, "a"), (2L, "B2"), (3L, "c"), (4L, "d")))
    assert(VersionedTable.read(spark, path).as[(Long, String)].collect().toSet == rows(3))
  }

  test("a pinned reader is isolated from later commits") {
    val path = "/tmp/graft_tables/spec_vt_iso"
    GraftTableWriter.drop(spark, path)
    VersionedTable.overwrite(Seq((1L, "x")).toDF("id", "v"), path)
    val pinned = VersionedTable.readVersion(spark, path, 1) // resolve dirs NOW
    VersionedTable.upsert(Seq((1L, "y")).toDF("id", "v"), path, Seq("id"))
    VersionedTable.append(Seq((9L, "z")).toDF("id", "v"), path)
    // the pinned plan still reads only v1's immutable dirs
    assert(pinned.as[(Long, String)].collect().toSet == Set((1L, "x")))
    assert(VersionedTable.read(spark, path).as[(Long, String)].collect().toSet ==
      Set((1L, "y"), (9L, "z")))
  }

  test("schema evolves across snapshots at read time") {
    val path = "/tmp/graft_tables/spec_vt_schema"
    GraftTableWriter.drop(spark, path)
    VersionedTable.overwrite(Seq((1L, "a")).toDF("id", "v"), path)
    VersionedTable.append(Seq((2L, "b", 7.5)).toDF("id", "v", "score"), path)
    val got = VersionedTable.read(spark, path)
      .select($"id", $"v", $"score").as[(Long, String, Option[Double])]
      .collect().toSet
    assert(got == Set((1L, "a", None), (2L, "b", Some(7.5))))
  }

  test("expire drops old snapshots and their unreferenced data dirs only") {
    val path = "/tmp/graft_tables/spec_vt_expire"
    GraftTableWriter.drop(spark, path)
    VersionedTable.overwrite(Seq((1L, "a")).toDF("id", "v"), path)   // v1: dir A
    VersionedTable.append(Seq((2L, "b")).toDF("id", "v"), path)      // v2: dirs A,B
    VersionedTable.overwrite(Seq((3L, "c")).toDF("id", "v"), path)   // v3: dir C
    VersionedTable.expire(spark, path, keep = 1)
    assert(VersionedTable.versions(spark, path) == Seq(3))
    // dirs A and B are gone, C survives
    val dataDirs = new java.io.File(path).listFiles.filter(_.getName.startsWith("d-"))
    assert(dataDirs.length == 1)
    assert(VersionedTable.read(spark, path).as[(Long, String)].collect().toSet ==
      Set((3L, "c")))
    intercept[IllegalArgumentException](VersionedTable.readVersion(spark, path, 1))
  }

  test("removeOrphans deletes uncommitted data dirs only; every snapshot stays byte-intact") {
    val path = "/tmp/graft_tables/spec_vt_orphans"
    GraftTableWriter.drop(spark, path)
    VersionedTable.overwrite(Seq((1L, "a")).toDF("id", "v"), path)
    VersionedTable.append(Seq((2L, "b")).toDF("id", "v"), path)
    // debris of a writer that died between data write and manifest commit:
    // a d-* dir no manifest references
    Seq((99L, "zz")).toDF("id", "v")
      .write.parquet(s"$path/d-000orphan-1")
    // a NON d-* foreign dir must never be touched
    Seq((98L, "yy")).toDF("id", "v")
      .write.parquet(s"$path/user_export")
    val before = fileBytes(path)
    // a fresh uncommitted dir is INSIDE the grace window: default-arg GC
    // must leave it (it may be a live writer mid-commit)
    assert(VersionedTable.removeOrphans(spark, path).isEmpty,
      "grace window must protect recent uncommitted dirs")
    val removed = VersionedTable.removeOrphans(spark, path, olderThanMs = 0)
    assert(removed == Seq("d-000orphan-1"), removed)
    // second pass is a no-op
    assert(VersionedTable.removeOrphans(spark, path, olderThanMs = 0).isEmpty)
    // both snapshots still read exactly; surviving files byte-identical
    assert(VersionedTable.readVersion(spark, path, 1).as[(Long, String)]
      .collect().toSet == Set((1L, "a")))
    assert(VersionedTable.readVersion(spark, path, 2).as[(Long, String)]
      .collect().toSet == Set((1L, "a"), (2L, "b")))
    val after = fileBytes(path)
    assert(after == before.filter { case (f, _) => !f.startsWith("d-000orphan-1") })
    assert(after.keys.exists(_.startsWith("user_export")), "foreign dir must survive")
  }

  test("shallow clone: zero-copy branch, two-way divergence isolation, expire never touches borrowed dirs") {
    val src = "/tmp/graft_tables/spec_vt_clone_src"
    val dst = "/tmp/graft_tables/spec_vt_clone_dst"
    GraftTableWriter.drop(spark, src); GraftTableWriter.drop(spark, dst)
    VersionedTable.overwrite(Seq((1L, "a")).toDF("id", "v"), src)  // src v1
    VersionedTable.append(Seq((2L, "b")).toDF("id", "v"), src)     // src v2
    def rows(p: String, v: Int) = VersionedTable.readVersion(spark, p, v)
      .as[(Long, String)].collect().toSet

    // branch from HISTORY (src v1), not just the head
    val cv = VersionedTable.cloneAt(spark, src, dst, version = 1)
    assert(cv == 1)
    assert(rows(dst, 1) == Set((1L, "a")))
    // zero-copy: the clone dir holds NO data dirs of its own yet
    assert(!new java.io.File(dst).listFiles.exists(_.getName.startsWith("d-")))

    // divergence: clone writes never reach the source, and vice versa
    VersionedTable.append(Seq((10L, "clone-only")).toDF("id", "v"), dst)
    VersionedTable.append(Seq((3L, "src-only")).toDF("id", "v"), src)
    assert(VersionedTable.read(spark, dst).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (10L, "clone-only")))
    assert(VersionedTable.read(spark, src).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "src-only")))

    // the clone's expire must never delete borrowed source dirs
    VersionedTable.overwrite(Seq((99L, "z")).toDF("id", "v"), dst) // dst v3 drops refs
    VersionedTable.expire(spark, dst, keep = 1)
    assert(rows(src, 1) == Set((1L, "a")), "clone expire deleted borrowed source data")
    assert(VersionedTable.read(spark, src).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "src-only")))
  }

  test("rollback restores an old snapshot as a new commit; history stays; roll-forward works") {
    val path = "/tmp/graft_tables/spec_vt_rollback"
    GraftTableWriter.drop(spark, path)
    VersionedTable.overwrite(Seq((1L, "good")).toDF("id", "v"), path)   // v1
    VersionedTable.overwrite(Seq((2L, "bad")).toDF("id", "v"), path)    // v2: bad batch
    def now() = VersionedTable.read(spark, path).as[(Long, String)].collect().toSet
    val v3 = VersionedTable.rollback(spark, path, toVersion = 1)
    assert(v3 == 3 && now() == Set((1L, "good")))
    // the bad snapshot is still auditable, not erased
    assert(VersionedTable.readVersion(spark, path, 2)
      .as[(Long, String)].collect().toSet == Set((2L, "bad")))
    // roll-forward = rollback to the later version
    VersionedTable.rollback(spark, path, toVersion = 2)
    assert(now() == Set((2L, "bad")))
    // rollback of a MOR snapshot carries its delete state intact
    VersionedTable.upsertMor(Seq((2L, "fixed")).toDF("id", "v"), path, Seq("id")) // v5
    VersionedTable.overwrite(Seq((9L, "z")).toDF("id", "v"), path)               // v6
    VersionedTable.rollback(spark, path, toVersion = 5)
    assert(now() == Set((2L, "fixed")))
  }

  test("merge-on-read upsert: O(batch) writes, Iceberg delete-sequence semantics, compact reclaims") {
    val mor = "/tmp/graft_tables/spec_vt_mor"
    val cow = "/tmp/graft_tables/spec_vt_cow"
    GraftTableWriter.drop(spark, mor); GraftTableWriter.drop(spark, cow)
    val base = (1L to 1000L).map(i => (i, s"v$i")).toDF("id", "v")
    val batch1 = Seq((1L, "up1"), (2L, "up2"), (2000L, "new")).toDF("id", "v")
    val batch2 = Seq((1L, "up1b"), (3L, "up3")).toDF("id", "v")
    def rows(p: String) = VersionedTable.read(spark, p)
      .as[(Long, String)].collect().toSet

    VersionedTable.overwrite(base, mor); VersionedTable.overwrite(base, cow)
    VersionedTable.upsertMor(batch1, mor, Seq("id"))
    VersionedTable.upsert(batch1, cow, Seq("id"))
    VersionedTable.upsertMor(batch2, mor, Seq("id"))
    VersionedTable.upsert(batch2, cow, Seq("id"))
    assert(rows(mor) == rows(cow), "MOR must equal the COW merge")

    // write amplification: every MOR dir after the base holds O(batch) rows,
    // never the table (the COW path rewrites all ~1001 rows each time)
    val snap = VersionedTable.readManifestForTest(spark, mor,
      VersionedTable.versions(spark, mor).last)
    val batchDirs = snap.dirs.filter(d => snap.dataSeq.getOrElse(d, 0) > 1)
    assert(batchDirs.nonEmpty)
    batchDirs.foreach { d =>
      val n = spark.read.parquet(s"$mor/$d").count()
      assert(n <= 3, s"MOR data dir $d holds $n rows — table-sized rewrite leaked in")
    }

    // equality DELETE, then a LATER append of the same key must survive
    // (delete sequence covers only earlier data — the Iceberg rule)
    VersionedTable.deleteWhereKeys(Seq(Tuple1(5L)).toDF("id"), mor, Seq("id"))
    assert(!rows(mor).exists(_._1 == 5L), "deleted key still visible")
    VersionedTable.append(Seq((5L, "reborn")).toDF("id", "v"), mor)
    assert(rows(mor).contains((5L, "reborn")), "post-delete append must survive")

    // mixed equality fields fail loudly WHILE deletes are outstanding
    // (after compact clears them, re-keying is legitimately allowed)
    intercept[IllegalArgumentException] {
      VersionedTable.upsertMor(Seq((1L, "x")).toDF("id", "v"), mor, Seq("v"))
    }

    // compact materializes the merge: same rows, zero delete dirs, and the
    // pre-compact MOR snapshot still time-travels correctly
    val before = rows(mor)
    val vPre = VersionedTable.versions(spark, mor).last
    VersionedTable.compact(spark, mor, targetRowsPerFile = 10000)
    assert(rows(mor) == before)
    val compacted = VersionedTable.readManifestForTest(spark, mor,
      VersionedTable.versions(spark, mor).last)
    assert(compacted.deletes.isEmpty, "compact must clear the delete list")
    assert(VersionedTable.readVersion(spark, mor, vPre)
      .as[(Long, String)].collect().toSet == before)
  }

  test("compaction collapses small files, keeps data identical, leaves old snapshots intact") {
    val path = "/tmp/graft_tables/spec_vt_compact"
    GraftTableWriter.drop(spark, path)
    val df = spark.range(1000).select(col("id"), (col("id") % 7).as("v"))
    for (i <- 0L until 5L) VersionedTable.append(df.filter(col("id") % 5 === i), path)
    val before = fileBytes(path)
    val vPre = VersionedTable.versions(spark, path).max
    val preRows = VersionedTable.read(spark, path).orderBy("id").collect().toSeq
    VersionedTable.compact(spark, path, targetRowsPerFile = 1000000L)
    // data unchanged
    assert(VersionedTable.read(spark, path).orderBy("id").collect().toSeq == preRows)
    // fewer data files in the compacted snapshot than across the appends
    val after = fileBytes(path)
    val newFiles = after.keySet -- before.keySet
    assert(newFiles.nonEmpty && newFiles.size < 5, s"expected 1 compacted file, got $newFiles")
    // pre-compaction snapshot still time-travelable, its files untouched
    assert(VersionedTable.readVersion(spark, path, vPre).count() == 1000)
    assert(before.forall { case (k, bytes) => after.get(k).contains(bytes) })
  }

  test("manifest column metrics prune non-overlapping data dirs from the scan") {
    val path = "/tmp/graft_tables/spec_vt_prune"
    GraftTableWriter.drop(spark, path)
    val df = spark.range(400).select(col("id"), (col("id") * 2).as("v"))
    // 4 range-disjoint batches with stats + 1 stats-less append
    for (i <- 0L until 4L)
      VersionedTable.appendWithStats(
        df.filter(col("id") >= i * 100 && col("id") < (i + 1) * 100), path, "id")
    // a stats-less append: never prunable, must always be scanned
    VersionedTable.append(
      spark.range(1000, 1010).select(col("id"), (col("id") * 2).as("v")), path)
    val pruned = VersionedTable.readPruned(spark, path, 150, 180)
    // scan opens only batch-1's dir (the overlap) and the stats-less dir
    val dirsTouched = pruned.inputFiles.map(_.split("/").takeRight(2).head).distinct
    assert(dirsTouched.length <= 2, s"expected <=2 dirs, scanned ${dirsTouched.mkString(",")}")
    // superset guarantee: the residual filter gives exactly the range
    val got = pruned.filter(col("id").between(150, 180)).orderBy("id")
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(got == (150L to 180L))
    // stats survived the plain append; the full read still sees every dir
    assert(VersionedTable.read(spark, path).count() == 410)
  }

  test("multi-column metrics: a 2-predicate scan opens only dirs overlapping BOTH bounds") {
    import VersionedTable.{LongRange, StringRange}
    val path = "/tmp/graft_tables/spec_vt_prune_multi"
    GraftTableWriter.drop(spark, path)
    // 4 dirs = 2 id-ranges × 2 name-ranges, both columns tracked per dir
    val df = spark.range(400).select(col("id"),
      concat(lit("n"), lpad((col("id") % 20).cast("string"), 2, "0")).as("name"))
    for (i <- 0L until 2L; lowNames <- Seq(true, false))
      VersionedTable.appendWithStats(
        df.filter(col("id") >= i * 200 && col("id") < (i + 1) * 200
          && (if (lowNames) col("name") < "n10" else col("name") >= "n10")),
        path, Seq("id", "name"))
    val ranges = Seq(LongRange("id", 50, 120), StringRange("name", "n00", "n05"))
    // ground truth from the manifest: exactly 1 of 4 dirs overlaps both
    val snap = VersionedTable.versions(spark, path).last
    val manifest = VersionedTable.readManifestForTest(spark, path, snap)
    val overlapping = VersionedTable.prunedDirs(manifest, ranges)
    assert(overlapping.size == 1, s"expected 1 overlapping dir, got $overlapping")
    // a long-only predicate alone would keep 2 dirs — the string bound is
    // what cuts the scan to 1, i.e. the second column genuinely prunes
    assert(VersionedTable.prunedDirs(manifest, ranges.take(1)).size == 2)
    val pruned = VersionedTable.readPruned(spark, path, ranges)
    val dirsTouched = pruned.inputFiles.map(_.split("/").takeRight(2).head).distinct
    assert(dirsTouched.toSet.subsetOf(overlapping.toSet),
      s"scan touched ${dirsTouched.mkString(",")} beyond overlapping $overlapping")
    // superset guarantee: residual filter gives exactly the predicate rows
    val got = pruned.filter(col("id").between(50, 120)
        && col("name") >= "n00" && col("name") <= "n05")
      .select("id").collect().map(_.getLong(0)).toSet
    val want = (50L to 120L).filter(i => i % 20 <= 5).toSet
    assert(got == want)
  }

  test("all-NULL stats column records no bounds: the dir is never pruned on it") {
    import VersionedTable.{LongRange, StringRange}
    val path = "/tmp/graft_tables/spec_vt_prune_null"
    GraftTableWriter.drop(spark, path)
    VersionedTable.appendWithStats(
      spark.range(10).select(col("id"), lit(null).cast("string").as("name")), path,
      Seq("id", "name"))
    // name has no bounds -> any name range keeps the dir; id bounds still prune
    assert(VersionedTable.readPruned(spark, path,
      Seq(StringRange("name", "zzz", "zzzz"))).count() == 10)
    assert(VersionedTable.readPruned(spark, path,
      Seq(LongRange("id", 5000, 6000))).count() == 0)
  }

  test("a pruned range overlapping no dir returns empty, not an error") {
    val path = "/tmp/graft_tables/spec_vt_prune_empty"
    GraftTableWriter.drop(spark, path)
    VersionedTable.appendWithStats(
      spark.range(100).select(col("id"), (col("id") * 2).as("v")), path, "id")
    val out = VersionedTable.readPruned(spark, path, 5000, 6000)
    assert(out.count() == 0 && out.columns.toSeq == Seq("id", "v"))
  }

  test("changes() emits exact I/U/D rows and is empty between identical snapshots") {
    val path = "/tmp/graft_tables/spec_vt_changes"
    GraftTableWriter.drop(spark, path)
    val v1 = spark.range(10).select(col("id"), (col("id") * 10).as("v"))
    VersionedTable.overwrite(v1, path)
    // v2: drop id 3, update id 5, insert id 100
    val v2 = v1.filter(col("id") =!= 3)
      .withColumn("v", org.apache.spark.sql.functions.when(col("id") === 5, 999L).otherwise(col("v")))
      .unionByName(spark.range(100, 101).select(col("id"), (col("id") * 10).as("v")))
    VersionedTable.overwrite(v2, path)
    VersionedTable.overwrite(v2, path) // v3 == v2
    val diff = VersionedTable.changes(spark, path, 1, 2, Seq("id"))
      .orderBy("op", "id").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(diff == Seq(("D", 3L, 30L), ("I", 100L, 1000L), ("U", 5L, 999L)))
    assert(VersionedTable.changes(spark, path, 2, 3, Seq("id")).count() == 0)
  }

  test("property: random append/upsert/overwrite sequences match a reference model; every version stays time-travelable") {
    import org.scalacheck.{Gen => G}
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val bGen = G.chooseNum(1, 6)
      .flatMap(n => G.listOfN(n, G.zip(G.chooseNum(0L, 9L), G.chooseNum(0L, 99L))))
      .map(_.groupBy(_._1).map(_._2.head).toSeq) // unique keys per batch
    val opGen = G.zip(G.chooseNum(0, 2), bGen)
    for (round <- 1 to 2) {
      val path = s"/tmp/graft_tables/spec_vt_model_$round"
      GraftTableWriter.drop(spark, path)
      val ops = G.listOfN(6, opGen).pureApply(G.Parameters.default, Seed(round * 31L))
      var model = Vector.empty[(Long, Long)]
      var history = Vector.empty[Vector[(Long, Long)]]
      for ((kind, batch) <- ops) {
        val df = batch.toDF("k", "v")
        kind match {
          case 0 => VersionedTable.append(df, path); model = model ++ batch
          case 1 => VersionedTable.overwrite(df, path); model = batch.toVector
          case _ =>
            VersionedTable.upsert(df, path, Seq("k"))
            model = model.filterNot(r => batch.exists(_._1 == r._1)) ++ batch
        }
        history :+= model
        val got = VersionedTable.read(spark, path).as[(Long, Long)].collect().toVector
        assert(got.sorted == model.sorted, s"round=$round after $kind")
      }
      // every intermediate version reads exactly as it was committed
      val vs = VersionedTable.versions(spark, path)
      assert(vs.size == ops.size)
      for ((v, snap) <- vs.zip(history)) {
        val got = VersionedTable.readVersion(spark, path, v).as[(Long, Long)].collect().toVector
        assert(got.sorted == snap.sorted, s"round=$round v=$v")
      }
    }
  }

  test("appendOnce is idempotent under batch replay; lastBatch survives maintenance") {
    val path = "/tmp/graft_tables/spec_append_once"
    GraftTableWriter.drop(spark, path)
    assert(VersionedTable.appendOnce(Seq((1L, "a")).toDF("id", "v"), path, batchId = 0))
    assert(VersionedTable.appendOnce(Seq((2L, "b")).toDF("id", "v"), path, batchId = 1))
    // the at-least-once redelivery: same batch id again — must be a no-op
    assert(!VersionedTable.appendOnce(Seq((2L, "b")).toDF("id", "v"), path, batchId = 1))
    assert(!VersionedTable.appendOnce(Seq((9L, "x")).toDF("id", "v"), path, batchId = 0))
    assert(VersionedTable.read(spark, path).collect().map(_.getLong(0)).sorted
      .sameElements(Array(1L, 2L)))
    // a replay skip commits nothing: no new snapshot, no orphan data dir
    val versionsBefore = VersionedTable.versions(spark, path)
    assert(versionsBefore.size == 2, versionsBefore.toString)
    // maintenance (plain append, compaction) must not forget the watermark
    VersionedTable.append(Seq((3L, "c")).toDF("id", "v"), path)
    VersionedTable.compact(spark, path, targetRowsPerFile = 100)
    assert(!VersionedTable.appendOnce(Seq((2L, "b")).toDF("id", "v"), path, batchId = 1))
    assert(VersionedTable.appendOnce(Seq((4L, "d")).toDF("id", "v"), path, batchId = 2))
    assert(VersionedTable.read(spark, path).collect().map(_.getLong(0)).sorted
      .sameElements(Array(1L, 2L, 3L, 4L)))
  }

  test("upsertMorOnce skips a replayed batch; the applied batch merges by sequence") {
    val path = "/tmp/graft_tables/spec_vt_moronce"
    GraftTableWriter.drop(spark, path)
    VersionedTable.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), path)
    val batch = Seq((2L, "b2"), (3L, "c")).toDF("id", "v")
    assert(VersionedTable.upsertMorOnce(batch, path, Seq("id"), batchId = 0))
    // at-least-once redelivery of the same batch: recognized, skipped
    assert(!VersionedTable.upsertMorOnce(batch, path, Seq("id"), batchId = 0))
    val rows = VersionedTable.read(spark, path).as[(Long, String)].collect().toSet
    assert(rows == Set((1L, "a"), (2L, "b2"), (3L, "c")), rows)
    // and the replay really wrote nothing: still exactly one delete dir
    val snap = VersionedTable.readManifestForTest(spark, path,
      VersionedTable.versions(spark, path).last)
    assert(snap.deletes.size == 1, snap.deletes)
  }

  test("upsertOnce merges by key exactly once under replay") {
    val path = "/tmp/graft_tables/spec_upsert_once"
    GraftTableWriter.drop(spark, path)
    assert(VersionedTable.upsertOnce(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), path, Seq("id"), 0))
    assert(VersionedTable.upsertOnce(Seq((2L, "B"), (3L, "c")).toDF("id", "v"), path, Seq("id"), 1))
    assert(!VersionedTable.upsertOnce(Seq((2L, "B"), (3L, "c")).toDF("id", "v"), path, Seq("id"), 1))
    val got = VersionedTable.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    assert(got.sameElements(Array((1L, "a"), (2L, "B"), (3L, "c"))))
  }

  test("applyCdcOnce: upserts + deletes land as ONE atomic batch, replay refused (r15)") {
    val path = "/tmp/graft_tables/spec_apply_cdc_once"
    GraftTableWriter.drop(spark, path)
    assert(VersionedTable.appendOnce(
      (1L to 6L).map(i => (i, s"v$i")).toDF("id", "v"), path, 0))
    // one batch: update 2 and 4, delete 5 and 6 — a SINGLE commit
    assert(VersionedTable.applyCdcOnce(
      Seq((2L, "V2"), (4L, "V4")).toDF("id", "v"),
      Seq(Tuple1(5L), Tuple1(6L)).toDF("id"), path, Seq("id"), 1))
    assert(VersionedTable.versions(spark, path) == Seq(1, 2),
      "the mixed batch must be exactly one snapshot")
    val got = VersionedTable.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got == Seq((1L, "v1"), (2L, "V2"), (3L, "v3"), (4L, "V4")))
    // replay (same and lower ids): refused, nothing changes
    assert(!VersionedTable.applyCdcOnce(
      Seq((2L, "V2"), (4L, "V4")).toDF("id", "v"),
      Seq(Tuple1(5L)).toDF("id"), path, Seq("id"), 1))
    assert(!VersionedTable.applyCdcOnce(
      Seq((1L, "XX")).toDF("id", "v"), Seq.empty[Tuple1[Long]].toDF("id"),
      path, Seq("id"), 0))
    assert(VersionedTable.versions(spark, path) == Seq(1, 2))
    // a key both upserted and deleted IN THE SAME BATCH: the upsert image
    // survives (it sits at the delete's own sequence — callers wanting
    // delete-wins fold per key FIRST, the streaming_debezium_apply shape)
    assert(VersionedTable.applyCdcOnce(
      Seq((3L, "V3")).toDF("id", "v"), Seq(Tuple1(3L)).toDF("id"),
      path, Seq("id"), 2))
    assert(VersionedTable.read(spark, path).filter($"id" === 3L).count() == 1)
  }

  test("racing committers both land via optimistic retry") {
    val path = "/tmp/graft_tables/spec_vt_race"
    GraftTableWriter.drop(spark, path)
    VersionedTable.overwrite(Seq((0L, "base")).toDF("id", "v"), path)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = (1 to 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = VersionedTable.append(Seq((i.toLong, s"r$i")).toDF("id", "v"), path)
        })
      }
      val versions = futures.map(_.get())
      assert(versions.toSet.size == 8, s"committers collided on a version: $versions")
    } finally pool.shutdown()
    assert(VersionedTable.versions(spark, path).size == 9)
    assert(VersionedTable.read(spark, path).count() == 9)
  }

  // ---- metadata-only COUNT(*) + files metadata ---------------------------

  test("countFromMetadata answers without opening any data file (dirs physically removed)") {
    val path = "/tmp/graft_tables/spec_meta_count"
    GraftTableWriter.drop(spark, path)
    val df = (1L to 100L).toDF("id")
    VersionedTable.overwrite(df.filter($"id" <= 40), path)
    VersionedTable.append(df.filter($"id" > 40), path)
    assert(VersionedTable.countFromMetadata(spark, path) == Some(100L))
    assert(VersionedTable.countFromMetadata(spark, path, Some(1)) == Some(40L),
      "time-traveled metadata count must see only v1's dirs")
    // THE no-data-read proof: move every parquet file away; the sidecars
    // stay; the metadata count still answers while a scan would now fail
    val root = java.nio.file.Paths.get(path)
    java.nio.file.Files.walk(root).forEach { p =>
      if (java.nio.file.Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
        java.nio.file.Files.move(p, p.resolveSibling(p.getFileName.toString + ".hidden"))
    }
    assert(VersionedTable.countFromMetadata(spark, path) == Some(100L),
      "count must come from sidecars alone, not from data files")
  }

  test("countFromMetadata refuses while MOR deletes are outstanding, answers after compact") {
    val path = "/tmp/graft_tables/spec_meta_count_mor"
    GraftTableWriter.drop(spark, path)
    val df = (1L to 50L).map(i => (i, i * 10)).toDF("k", "v")
    VersionedTable.overwrite(df, path)
    VersionedTable.upsertMor(Seq((7L, 999L)).toDF("k", "v"), path, Seq("k"))
    assert(VersionedTable.countFromMetadata(spark, path).isEmpty,
      "equality deletes outstanding: row liveness depends on data, metadata must refuse")
    VersionedTable.compact(spark, path, 1000000L)
    assert(VersionedTable.countFromMetadata(spark, path) == Some(50L))
    assert(VersionedTable.read(spark, path).count() == 50L)
  }

  test("countFromMetadata degrades to None when a dir lacks its sidecar") {
    val path = "/tmp/graft_tables/spec_meta_count_nosc"
    GraftTableWriter.drop(spark, path)
    VersionedTable.overwrite((1L to 30L).toDF("id"), path)
    val root = java.nio.file.Paths.get(path)
    java.nio.file.Files.walk(root).forEach { p =>
      if (p.getFileName.toString == "_rowcount") java.nio.file.Files.delete(p)
    }
    assert(VersionedTable.countFromMetadata(spark, path).isEmpty,
      "a sidecar-less dir (older build) must fall off the metadata path, not guess")
  }

  test("minMaxFromMetadata folds manifest bounds; refuses on stats-less dirs and MOR deletes") {
    val path = "/tmp/graft_tables/spec_meta_minmax"
    GraftTableWriter.drop(spark, path)
    val df = Seq((5L, "m"), (17L, "a"), (9L, "z")).toDF("k", "s")
    val df2 = Seq((2L, "q"), (30L, "b")).toDF("k", "s")
    VersionedTable.appendWithStats(df, path, Seq("k", "s"))
    VersionedTable.appendWithStats(df2, path, Seq("k", "s"))
    val k = VersionedTable.minMaxFromMetadata(spark, path, "k").get
    assert((k.lo.toLong, k.hi.toLong) == (2L, 30L))
    val s2 = VersionedTable.minMaxFromMetadata(spark, path, "s").get
    assert((s2.lo, s2.hi) == ("a", "z"))
    // version-pinned: v1 saw only the first batch
    val k1 = VersionedTable.minMaxFromMetadata(spark, path, "k", Some(1)).get
    assert((k1.lo.toLong, k1.hi.toLong) == (5L, 17L))
    // no-data-read proof: remove the parquet files, bounds still answer
    val root = java.nio.file.Paths.get(path)
    java.nio.file.Files.walk(root).forEach { p =>
      if (java.nio.file.Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
        java.nio.file.Files.delete(p)
    }
    assert(VersionedTable.minMaxFromMetadata(spark, path, "k").isDefined)
    // a dir WITHOUT stats poisons the metadata path (could hold the extreme)
    val path2 = "/tmp/graft_tables/spec_meta_minmax_nostats"
    GraftTableWriter.drop(spark, path2)
    VersionedTable.appendWithStats(df, path2, Seq("k"))
    VersionedTable.append(df2, path2)
    assert(VersionedTable.minMaxFromMetadata(spark, path2, "k").isEmpty,
      "a stats-less dir must refuse the metadata answer, not guess")
    // outstanding MOR deletes: the extreme row may be dead, refuse
    val path3 = "/tmp/graft_tables/spec_meta_minmax_mor"
    GraftTableWriter.drop(spark, path3)
    VersionedTable.appendWithStats(df, path3, Seq("k"))
    VersionedTable.upsertMor(Seq((17L, "gone")).toDF("k", "s"), path3, Seq("k"))
    assert(VersionedTable.minMaxFromMetadata(spark, path3, "k").isEmpty)
  }

  test("minMaxFromMetadata folds string bounds in UTF-8 byte order, matching the data path") {
    // "�" (REPLACEMENT CHARACTER, UTF-16 code unit 0xFFFD) sorts ABOVE
    // "😀" (emoji, surrogate pair starting 0xD83D) under Java
    // String order, but BELOW it under the UTF-8 byte order Spark's min/max
    // computed the per-dir bounds with (4-byte emoji encoding > 3-byte
    // U+FFFD). The folded metadata answer must agree with the data path.
    val path = "/tmp/graft_tables/spec_meta_minmax_utf8"
    GraftTableWriter.drop(spark, path)
    val emoji = new String(Character.toChars(0x1F600))
    VersionedTable.appendWithStats(Seq((1L, "�")).toDF("k", "s"), path, Seq("s"))
    VersionedTable.appendWithStats(Seq((2L, emoji)).toDF("k", "s"), path, Seq("s"))
    val b = VersionedTable.minMaxFromMetadata(spark, path, "s").get
    val Seq(dataLo, dataHi) = VersionedTable.read(spark, path)
      .agg(min($"s"), max($"s")).as[(String, String)].collect().toSeq
      .flatMap(t => Seq(t._1, t._2))
    assert((b.lo, b.hi) == (dataLo, dataHi),
      s"metadata fold (${b.lo}, ${b.hi}) diverged from data path ($dataLo, $dataHi)")
    assert(b.hi == emoji, "UTF-8 byte order must rank the 4-byte emoji highest")
  }

  test("filesMetadata lists live dirs with sequences and sidecar counts; clones inherit") {
    val path = "/tmp/graft_tables/spec_files_meta"
    GraftTableWriter.drop(spark, path)
    val df = (1L to 90L).toDF("id")
    VersionedTable.overwrite(df.filter($"id" <= 30), path)
    VersionedTable.append(df.filter($"id" > 30 && $"id" <= 60), path)
    VersionedTable.append(df.filter($"id" > 60), path)
    val rows = VersionedTable.filesMetadata(spark, path)
      .orderBy($"file_ordinal")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(rows == Seq((1L, 30L), (2L, 30L), (3L, 30L)), rows.toString)
    // a zero-copy clone references the same dirs absolutely — the sidecars
    // ride along and the clone's metadata count works immediately
    val clonePath = "/tmp/graft_tables/spec_files_meta_clone"
    GraftTableWriter.drop(spark, clonePath)
    VersionedTable.cloneAt(spark, path, clonePath,
      VersionedTable.versions(spark, path).max)
    assert(VersionedTable.countFromMetadata(spark, clonePath) == Some(90L))
  }
}
