package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** INDEPENDENT reader of Apache Iceberg format-v2 metadata — the consumer
  * side of [[graft.sinks.IcebergExport]], sharing NO code with it: the
  * metadata JSON is parsed with Jackson, the manifest lists and manifests
  * are decoded as generic Avro, and every structure is resolved per the
  * PUBLIC Iceberg table spec (metadata.json → current-snapshot-id →
  * snapshot.manifest-list → manifest_file.manifest_path → manifest_entry
  * .data_file.file_path), so it reads what any external Iceberg tool would
  * read — the proof that the exporter's output is real Iceberg metadata and
  * not a private dialect. Field-id conformance is checked, not assumed:
  * [[manifestListFieldIds]] / [[manifestEntryFieldIds]] surface the `field-id`
  * attributes actually present in the Avro schemas for the spec to assert
  * against the spec's reserved ids (500-517 for manifest lists, 0-4/100-134
  * for manifest entries).
  *
  * Resolution starts at `metadata/version-hint.text` (the HadoopCatalog
  * convention) or an explicit metadata.json path. Time travel: any
  * snapshot-id in the metadata's snapshot list is readable
  * ([[readSnapshot]]), exactly as Iceberg's own `snapshot-id` read option.
  */
object IcebergRead {

  final case class SnapshotInfo(snapshotId: Long, sequenceNumber: Long,
      timestampMs: Long, manifestList: String)

  /** Schema fields as (id, name, iceberg type name). */
  final case class TableMeta(formatVersion: Int, tableUuid: String,
      currentSnapshotId: Long, snapshots: Seq[SnapshotInfo],
      schemaFields: Seq[(Int, String, String)],
      partitionFields: Seq[(String, String, Int)]) {
    def schemaFieldNames: Seq[String] = schemaFields.map(_._2)
    def fieldName(id: Int): String = fieldOf(id)._2
    def fieldType(id: Int): String = fieldOf(id)._3
    private def fieldOf(id: Int): (Int, String, String) =
      schemaFields.find(_._1 == id).getOrElse(
        throw new IllegalArgumentException(s"no schema field with id $id"))
  }

  /** One referenced file: path, content (0 = data, 2 = equality deletes),
    * its data/delete sequence number, partition values (by partition field
    * name, stringified), equality field ids (delete files), counts, and the
    * per-file column bounds (field id → raw spec-serialized bytes). */
  final case class DataFileInfo(path: String, content: Int, sequenceNumber: Long,
      partition: Map[String, String], equalityIds: Seq[Int],
      recordCount: Long, sizeBytes: Long,
      lowerBounds: Map[Int, Array[Byte]] = Map.empty,
      upperBounds: Map[Int, Array[Byte]] = Map.empty)

  /** Deserialize a spec Appendix-D single value for the bound kinds this
    * reader prunes on: `long` little-endian 8 bytes, `string` UTF-8. */
  private def boundValue(icebergType: String, bytes: Array[Byte]): Either[Long, String] =
    icebergType match {
      case "long" | "int" =>
        Left(java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong)
      case "string" => Right(new String(bytes, "UTF-8"))
      case other => throw new IllegalArgumentException(
        s"range pruning on $other bounds not supported")
    }

  private val mapper = new ObjectMapper()

  private def fs(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readBytes(filesystem: FileSystem, p: Path): Array[Byte] = {
    val in = filesystem.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  /** Resolve the current metadata.json of a table root via
    * `metadata/version-hint.text` (HadoopCatalog convention). */
  def currentMetadataPath(spark: SparkSession, tableRoot: String): String = {
    val filesystem = fs(spark, tableRoot)
    val hint = new Path(new Path(tableRoot, "metadata"), "version-hint.text")
    require(filesystem.exists(hint), s"no version-hint.text under $tableRoot/metadata")
    val v = new String(readBytes(filesystem, hint), "UTF-8").trim.toInt
    filesystem.makeQualified(
      new Path(new Path(tableRoot, "metadata"), s"v$v.metadata.json")).toString
  }

  /** Parse a metadata.json per the v2 spec. */
  def tableMeta(spark: SparkSession, metadataPath: String): TableMeta = {
    val filesystem = fs(spark, metadataPath)
    val root = mapper.readTree(readBytes(filesystem, new Path(metadataPath)))
    val fv = root.get("format-version").asInt()
    require(fv == 2, s"expected format-version 2, got $fv")
    val currentSchemaId = root.get("current-schema-id").asInt()
    val schema = iter(root.get("schemas"))
      .find(_.get("schema-id").asInt() == currentSchemaId)
      .getOrElse(throw new IllegalArgumentException(
        s"current-schema-id $currentSchemaId not in schemas"))
    val fields = iter(schema.get("fields"))
      .map(f => (f.get("id").asInt(), f.get("name").asText(),
        f.get("type").asText())).toSeq
    val defaultSpecId = root.get("default-spec-id").asInt()
    val spec = iter(root.get("partition-specs"))
      .find(_.get("spec-id").asInt() == defaultSpecId)
      .getOrElse(throw new IllegalArgumentException(
        s"default-spec-id $defaultSpecId not in partition-specs"))
    val partFields = iter(spec.get("fields")).map { f =>
      (f.get("name").asText(), f.get("transform").asText(), f.get("source-id").asInt())
    }.toSeq
    val snaps = iter(root.get("snapshots")).map { s =>
      SnapshotInfo(s.get("snapshot-id").asLong(), s.get("sequence-number").asLong(),
        s.get("timestamp-ms").asLong(), s.get("manifest-list").asText())
    }.toSeq
    TableMeta(fv, root.get("table-uuid").asText(),
      root.get("current-snapshot-id").asLong(), snaps, fields, partFields)
  }

  private def iter(n: JsonNode): Iterator[JsonNode] = {
    import scala.jdk.CollectionConverters._
    n.elements().asScala
  }

  private def avroRecords(filesystem: FileSystem, p: Path): (org.apache.avro.Schema, Seq[GenericRecord]) = {
    val reader = new DataFileReader[GenericRecord](
      new SeekableByteArrayInput(readBytes(filesystem, p)),
      new GenericDatumReader[GenericRecord]())
    try {
      val out = scala.collection.mutable.ArrayBuffer.empty[GenericRecord]
      while (reader.hasNext) out += reader.next()
      (reader.getSchema, out.toSeq)
    } finally reader.close()
  }

  /** The `field-id` attribute of each top-level field in a manifest LIST's
    * Avro schema — for spec conformance assertions. */
  def manifestListFieldIds(spark: SparkSession, manifestListPath: String): Map[String, Int] = {
    val (schema, _) = avroRecords(fs(spark, manifestListPath), new Path(manifestListPath))
    fieldIds(schema)
  }

  /** field-ids of the manifest_entry schema (top level + the data_file
    * struct's fields, prefixed "data_file."). */
  def manifestEntryFieldIds(spark: SparkSession, manifestPath: String): Map[String, Int] = {
    val (schema, _) = avroRecords(fs(spark, manifestPath), new Path(manifestPath))
    val top = fieldIds(schema)
    val df = schema.getField("data_file").schema()
    top ++ fieldIds(df).map { case (k, v) => s"data_file.$k" -> v }
  }

  private def fieldIds(schema: org.apache.avro.Schema): Map[String, Int] = {
    import scala.jdk.CollectionConverters._
    schema.getFields.asScala.flatMap { f =>
      Option(f.getObjectProp("field-id")).collect {
        case i: java.lang.Integer => f.name() -> i.intValue()
        case l: java.lang.Long    => f.name() -> l.intValue()
      }
    }.toMap
  }

  /** Every live file of a snapshot (data AND equality-delete files):
    * manifest list → manifests → entries with status != DELETED(2). */
  def allFiles(spark: SparkSession, meta: TableMeta, snapshotId: Long): Seq[DataFileInfo] = {
    val snap = meta.snapshots.find(_.snapshotId == snapshotId).getOrElse(
      throw new IllegalArgumentException(s"snapshot $snapshotId not in metadata " +
        s"(have ${meta.snapshots.map(_.snapshotId).mkString(",")})"))
    val filesystem = fs(spark, snap.manifestList)
    val (_, manifests) = avroRecords(filesystem, new Path(snap.manifestList))
    manifests.flatMap { m =>
      val mPath = m.get("manifest_path").toString
      val (_, entries) = avroRecords(filesystem, new Path(mPath))
      entries.filter(_.get("status").asInstanceOf[Int] != 2).map { e =>
        val df = e.get("data_file").asInstanceOf[GenericRecord]
        val part = df.get("partition").asInstanceOf[GenericRecord]
        val partVals = meta.partitionFields.map { case (name, _, _) =>
          name -> String.valueOf(part.get(name))
        }.toMap
        val eqIds = Option(df.get("equality_ids")).toSeq.flatMap { ids =>
          import scala.jdk.CollectionConverters._
          ids.asInstanceOf[java.util.List[Integer]].asScala.map(_.intValue()).toSeq
        }
        def bounds(field: String): Map[Int, Array[Byte]] =
          Option(df.get(field)).map { l =>
            import scala.jdk.CollectionConverters._
            l.asInstanceOf[java.util.List[GenericRecord]].asScala.map { kv =>
              val buf = kv.get("value").asInstanceOf[java.nio.ByteBuffer]
              val arr = new Array[Byte](buf.remaining()); buf.duplicate().get(arr)
              kv.get("key").asInstanceOf[Int] -> arr
            }.toMap
          }.getOrElse(Map.empty)
        DataFileInfo(df.get("file_path").toString,
          df.get("content").asInstanceOf[Int],
          e.get("sequence_number").asInstanceOf[Long],
          partVals, eqIds,
          df.get("record_count").asInstanceOf[Long],
          df.get("file_size_in_bytes").asInstanceOf[Long],
          bounds("lower_bounds"), bounds("upper_bounds"))
      }
    }
  }

  /** The DATA files of a snapshot (content 0). */
  def dataFiles(spark: SparkSession, meta: TableMeta, snapshotId: Long): Seq[DataFileInfo] =
    allFiles(spark, meta, snapshotId).filter(_.content == 0)

  /** The EQUALITY-DELETE files of a snapshot (content 2). */
  def deleteFiles(spark: SparkSession, meta: TableMeta, snapshotId: Long): Seq[DataFileInfo] =
    allFiles(spark, meta, snapshotId).filter(_.content == 2)

  /** Read the CURRENT snapshot of the table rooted at `tableRoot`. */
  def read(spark: SparkSession, tableRoot: String): DataFrame = {
    val meta = tableMeta(spark, currentMetadataPath(spark, tableRoot))
    readSnapshot(spark, meta, meta.currentSnapshotId)
  }

  /** Time travel: read a specific snapshot-id listed in the metadata.
    * Applies the spec's v2 MERGE-ON-READ rule when the snapshot carries
    * equality-delete files: an equality delete applies to every data file
    * whose data sequence number is STRICTLY LOWER than the delete's — per
    * key, a data row survives iff no later delete file contains its key
    * (key columns resolved from the delete files' `equality_ids` through
    * the metadata schema). ONE key-hash join at read time, exactly the
    * trade Iceberg's own readers make. */
  def readSnapshot(spark: SparkSession, meta: TableMeta, snapshotId: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, max}
    val files = allFiles(spark, meta, snapshotId)
    val datas = files.filter(_.content == 0)
    val dels = files.filter(_.content == 2)
    require(datas.nonEmpty, s"snapshot $snapshotId lists no data files")
    if (dels.isEmpty) spark.read.parquet(datas.map(_.path): _*)
    else {
      val keyNames = {
        val idSets = dels.map(_.equalityIds).distinct
        require(idSets.size == 1 && idSets.head.nonEmpty,
          s"inconsistent equality_ids across delete files: $idSets")
        idSets.head.map(meta.fieldName)
      }
      val dataDf = datas.groupBy(_.sequenceNumber).toSeq.map { case (s, fs) =>
        spark.read.parquet(fs.map(_.path): _*).withColumn("__seq", lit(s))
      }.reduce(_.unionByName(_, allowMissingColumns = true))
      val delDf = dels.groupBy(_.sequenceNumber).toSeq.map { case (s, fs) =>
        spark.read.parquet(fs.map(_.path): _*).withColumn("__dseq", lit(s))
      }.reduce(_.unionByName(_, allowMissingColumns = true))
      val delMax = delDf.groupBy(keyNames.map(col): _*)
        .agg(max(col("__dseq")).as("__dseq"))
      dataDf.join(delMax, keyNames, "left_outer")
        .filter(col("__dseq").isNull || col("__dseq") <= col("__seq"))
        .drop("__seq", "__dseq")
    }
  }

  /** Metadata-level partition pruning: read only the files whose identity
    * partition value for `col` equals `value` — the file-skipping any
    * Iceberg-aware engine performs from the manifests alone. */
  def readPartition(spark: SparkSession, meta: TableMeta, snapshotId: Long,
      col: String, value: String): DataFrame = {
    require(meta.partitionFields.exists(f => f._1 == col && f._2 == "identity"),
      s"$col is not an identity partition field of this table")
    val files = dataFiles(spark, meta, snapshotId).filter(_.partition(col) == value)
    require(files.nonEmpty, s"no files for partition $col=$value")
    spark.read.parquet(files.map(_.path): _*)
  }

  /** The data files a `col BETWEEN lo AND hi` scan must open, decided from
    * the manifests' per-file lower/upper bounds alone (spec field ids
    * 125/128, Appendix-D value decoding via the schema's field type) — the
    * file skipping any Iceberg engine performs. SUPERSET contract: files
    * without bounds for `col` are always kept; callers apply the residual
    * filter. */
  def prunedDataFiles(spark: SparkSession, meta: TableMeta, snapshotId: Long,
      col: String, lo: String, hi: String): Seq[DataFileInfo] = {
    val id = meta.schemaFields.find(_._2 == col).map(_._1).getOrElse(
      throw new IllegalArgumentException(s"no schema field named $col"))
    val typ = meta.fieldType(id)
    dataFiles(spark, meta, snapshotId).filter { f =>
      (f.lowerBounds.get(id), f.upperBounds.get(id)) match {
        case (Some(l), Some(u)) =>
          (boundValue(typ, l), boundValue(typ, u)) match {
            case (Left(fl), Left(fu))   => fu >= lo.toLong && fl <= hi.toLong
            case (Right(sl), Right(su)) => su >= lo && sl <= hi
            case _                      => true
          }
        case _ => true // no recorded bounds: never pruned
      }
    }
  }

  /** Range scan through the exported metadata: open only the bound-
    * overlapping files (superset; apply the residual filter on top). */
  def readRange(spark: SparkSession, meta: TableMeta, snapshotId: Long,
      col: String, lo: String, hi: String): DataFrame = {
    val files = prunedDataFiles(spark, meta, snapshotId, col, lo, hi)
    require(files.nonEmpty, s"no files overlap $col in [$lo, $hi]")
    spark.read.parquet(files.map(_.path): _*)
  }
}
