package graft.sources

import graft.sinks.VersionedTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** Config-driven job assembly — the reference's DEPLOYMENT surface: the
  * whole pipeline is wired from one flat properties map, with defaults and
  * loud failure exactly where the reference fails loudly.
  *
  * Reference contract being mirrored (file:line):
  *  - ParameterToolLoader.java:15-28 — properties arrive either as a direct
  *    map (local run, `fromArgs`) or inside a named property GROUP
  *    (`FlinkApplicationProperties`); a missing group is a RuntimeException
  *    with that exact message.
  *  - StreamingJob.java:60-128 — the key matrix: `snowflake.user/password/
  *    schema/warehouse/db/id/port/table.name/column.name/order.column.name/
  *    interval/query.interval/query.size.interval` and `iceberg.warehouse/
  *    db/table/partition.fields/operation/upsert.equality.fields`. Every
  *    string key defaults to ""; every int key goes through
  *    `Integer.parseInt(get(key, ""))`, so a MISSING int key fails loudly
  *    with a NumberFormatException (here wrapped to name the key).
  *  - StreamingJob.java:96-97 — the JDBC URL emission, byte-pinned.
  *  - IcebergSinkBuilder.java:37-45 — operation dispatch: `upsert` splits
  *    the equality fields on `[, ]+` and equality-delete-upserts (the
  *    `.upsert(true)` MOR mechanism = [[VersionedTable.upsertMor]]);
  *    `overwrite` overwrites; ANYTHING ELSE — including `append`, despite
  *    the enclosing method's name — throws
  *    `IllegalArgumentException("Unsupported iceberg operation: …")`,
  *    mirrored verbatim.
  *  - IcebergTableManager.java:40-44, 75-81 — `iceberg.partition.fields`
  *    splits on `\s*,\s*` into identity-partition fields; a field not in
  *    the schema fails table creation loudly (PartitionSpec.builderFor
  *    semantics), mirrored by [[createTable]].
  *
  * Spark-first: the assembled pipeline is the repo's existing declarative
  * chain — [[ShardedIngest.discoverShards]] → [[ShardedIngest.page]] (one
  * window shuffle, the keyBy analogue) → [[TypedIngest]] (plan-time casts)
  * → [[VersionedTable]] commit — not a translation of the reference's
  * per-row process functions.
  */
object JobAssembly {

  /** The reference's property-group id (ParameterToolLoader.java:20). */
  val PropertyGroup = "FlinkApplicationProperties"

  final case class JobConfig(
      sfUser: String, sfPassword: String, sfSchema: String,
      sfWarehouse: String, sfDb: String, sfId: String, sfPort: Int,
      sfTable: String, sfColumn: String, sfOrderColumn: String,
      sfInterval: Int, sfQueryInterval: Int, sfQuerySize: Int,
      icebergWarehouse: String, icebergDb: String, icebergTable: String,
      partitionFields: Seq[String], operation: String,
      equalityFields: Seq[String]) {

    /** The reference's URL emission (StreamingJob.java:96-97), byte-pinned —
      * the first thing a deployer diffs against their Flink config. */
    def jdbcUrl: String =
      s"jdbc:snowflake://$sfId.snowflakecomputing.com:$sfPort/" +
        s"?warehouse=$sfWarehouse&db=$sfDb&schema=$sfSchema" +
        s"&user=$sfUser&password=$sfPassword"

    /** Warehouse-root table layout: `TableIdentifier.of(db, table)` under
      * the warehouse path (IcebergTableManager.java:57). */
    def tablePath: String = s"$icebergWarehouse/$icebergDb/$icebergTable"
  }

  /** ParameterToolLoader.loadApplicationParameters, the managed-runtime
    * branch: properties must arrive inside [[PropertyGroup]]; a missing
    * group fails with the reference's exact message. */
  def loadApplicationParameters(groups: Map[String, Map[String, String]]): JobConfig =
    groups.get(PropertyGroup) match {
      case Some(props) => fromMap(props)
      case None => throw new RuntimeException(
        "Unable to load FlinkApplicationProperties properties from runtime properties")
    }

  /** The local-run branch (`ParameterTool.fromArgs`): a flat map. Defaults
    * and parse loudness follow StreamingJob.java:60-128 exactly — strings
    * default to "", ints are `Integer.parseInt` over that default, so a
    * missing int key is a loud NumberFormatException naming the key. */
  def fromMap(p: Map[String, String]): JobConfig = {
    def str(k: String): String = p.getOrElse(k, "")
    def int(k: String): Int =
      try Integer.parseInt(str(k))
      catch {
        case _: NumberFormatException => throw new NumberFormatException(
          s"""property "$k": For input string: "${str(k)}"""")
      }
    JobConfig(
      sfUser = str("snowflake.user"),
      sfPassword = str("snowflake.password"),
      sfSchema = str("snowflake.schema"),
      sfWarehouse = str("snowflake.warehouse"),
      sfDb = str("snowflake.db"),
      sfId = str("snowflake.id"),
      sfPort = int("snowflake.port"),
      sfTable = str("snowflake.table.name"),
      sfColumn = str("snowflake.column.name"),
      sfOrderColumn = str("snowflake.order.column.name"),
      sfInterval = int("snowflake.interval"),
      sfQueryInterval = int("snowflake.query.interval"),
      // the reference's key really is `.size.interval` (StreamingJob.java:92)
      sfQuerySize = int("snowflake.query.size.interval"),
      icebergWarehouse = str("iceberg.warehouse"),
      icebergDb = str("iceberg.db"),
      icebergTable = str("iceberg.table"),
      // IcebergTableManager.java:40: split("\s*,\s*"); blank → unpartitioned
      partitionFields = str("iceberg.partition.fields")
        .split("\\s*,\\s*").toSeq.filter(_.nonEmpty),
      operation = str("iceberg.operation"),
      // IcebergSinkBuilder.java:38: split("[, ]+")
      equalityFields = str("iceberg.upsert.equality.fields")
        .split("[, ]+").toSeq.filter(_.nonEmpty))
  }

  /** createIcebergTable's validation surface (IcebergTableManager.java:27-44):
    * every identity-partition field must exist in the schema — the
    * PartitionSpec builder's loud failure, here at assembly time instead of
    * first commit. Upsert configs must name their equality fields before any
    * data moves (the reference defers this to the first sink write). */
  def validate(cfg: JobConfig, schema: StructType): JobConfig = {
    val missing = cfg.partitionFields.filterNot(schema.fieldNames.contains)
    require(missing.isEmpty,
      s"iceberg.partition.fields not in the table schema: ${missing.mkString(", ")}")
    if (cfg.operation == "upsert")
      require(cfg.equalityFields.nonEmpty,
        "iceberg.operation=upsert requires iceberg.upsert.equality.fields")
    cfg
  }

  /** IcebergSinkBuilder.buildFlinkSinkBuilder's dispatch, verbatim:
    * `upsert` → equality-delete MOR upsert (the `.upsert(true)` mechanism);
    * `overwrite` → overwrite; anything else — including `append` — is the
    * reference's own IllegalArgumentException. Returns the committed
    * version. */
  def applySink(cfg: JobConfig, batch: DataFrame): Int = cfg.operation match {
    case "upsert" =>
      require(cfg.equalityFields.nonEmpty,
        "iceberg.operation=upsert requires iceberg.upsert.equality.fields")
      VersionedTable.upsertMor(batch, cfg.tablePath, cfg.equalityFields)
    case "overwrite" =>
      VersionedTable.overwrite(batch, cfg.tablePath)
    case other =>
      throw new IllegalArgumentException(s"Unsupported iceberg operation: $other")
  }

  /** One poll cycle over a staged (all-string) source frame: the assembled
    * discoverShards → per-shard page (offset state in) → typed projection.
    * Returns the typed page and the advanced per-shard offsets
    * (SnowflakeProcessFunction.java:113's `offset += rowCount`). */
  def batchCycle(staged: DataFrame, cfg: JobConfig, schema: StructType,
      offsets: Map[String, Long]): (DataFrame, Map[String, Long]) = {
    val page = ShardedIngest.page(staged, cfg.sfColumn,
      Seq(cfg.sfOrderColumn), offsets, cfg.sfQuerySize.toLong)
    val typed = TypedIngest(page, schema)
    val next = ShardedIngest.nextOffsets(page, cfg.sfColumn, offsets)
    (typed, next)
  }

  /** The full assembled cycle: page → type → sink commit. Returns the
    * advanced offsets for the next cycle's state. */
  def runCycle(staged: DataFrame, cfg: JobConfig, schema: StructType,
      offsets: Map[String, Long]): Map[String, Long] = {
    val (typed, next) = batchCycle(staged, cfg, schema, offsets)
    applySink(cfg, typed)
    next
  }
}
