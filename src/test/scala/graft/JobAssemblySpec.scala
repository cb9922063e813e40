package graft

import graft.sources.JobAssembly
import graft.sinks.VersionedTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** The reference's config-driven assembly surface (ParameterToolLoader +
  * StreamingJob + IcebergSinkBuilder): key matrix, "" defaults, loud int
  * parse, loud missing property group, the exact unsupported-operation
  * failure (including `append`!), the byte-pinned JDBC URL, and an
  * end-to-end two-cycle properties→pipeline run with offset state.
  */
class JobAssemblySpec extends SparkSpec {

  private val fullProps = Map(
    "snowflake.user" -> "u", "snowflake.password" -> "pw",
    "snowflake.schema" -> "PUBLIC", "snowflake.warehouse" -> "WH",
    "snowflake.db" -> "DB", "snowflake.id" -> "acct123",
    "snowflake.port" -> "443", "snowflake.table.name" -> "SRC",
    "snowflake.column.name" -> "SHARD",
    "snowflake.order.column.name" -> "UPDATED_AT",
    "snowflake.interval" -> "10000", "snowflake.query.interval" -> "1000",
    "snowflake.query.size.interval" -> "500",
    "iceberg.warehouse" -> "/tmp/graft_tables/job_assembly_wh",
    "iceberg.db" -> "lake", "iceberg.table" -> "t",
    "iceberg.partition.fields" -> "a , b",
    "iceberg.operation" -> "upsert",
    "iceberg.upsert.equality.fields" -> "k1, k2 k3")

  test("key matrix: every StreamingJob key lands in the config") {
    val c = JobAssembly.fromMap(fullProps)
    assert(c.sfUser == "u" && c.sfPassword == "pw" && c.sfSchema == "PUBLIC")
    assert(c.sfWarehouse == "WH" && c.sfDb == "DB" && c.sfId == "acct123")
    assert(c.sfPort == 443 && c.sfTable == "SRC" && c.sfColumn == "SHARD")
    assert(c.sfOrderColumn == "UPDATED_AT")
    assert(c.sfInterval == 10000 && c.sfQueryInterval == 1000 && c.sfQuerySize == 500)
    assert(c.icebergWarehouse == "/tmp/graft_tables/job_assembly_wh")
    assert(c.icebergDb == "lake" && c.icebergTable == "t")
    // IcebergTableManager.java:40 split("\s*,\s*")
    assert(c.partitionFields == Seq("a", "b"))
    // IcebergSinkBuilder.java:38 split("[, ]+")
    assert(c.equalityFields == Seq("k1", "k2", "k3"))
    assert(c.tablePath == "/tmp/graft_tables/job_assembly_wh/lake/t")
  }

  test("the JDBC URL is the reference's byte-exact emission") {
    val c = JobAssembly.fromMap(fullProps)
    assert(c.jdbcUrl == "jdbc:snowflake://acct123.snowflakecomputing.com:443/" +
      "?warehouse=WH&db=DB&schema=PUBLIC&user=u&password=pw")
  }

  test("string keys default to empty; a missing int key fails loudly naming it") {
    val c = JobAssembly.fromMap(fullProps - "snowflake.user" - "iceberg.db")
    assert(c.sfUser == "" && c.icebergDb == "")
    val e = intercept[NumberFormatException] {
      JobAssembly.fromMap(fullProps - "snowflake.port")
    }
    assert(e.getMessage.contains("snowflake.port"))
  }

  test("missing property group fails with the reference's message") {
    val e = intercept[RuntimeException] {
      JobAssembly.loadApplicationParameters(Map("OtherGroup" -> fullProps))
    }
    assert(e.getMessage ==
      "Unable to load FlinkApplicationProperties properties from runtime properties")
    // and the present group parses
    val c = JobAssembly.loadApplicationParameters(
      Map(JobAssembly.PropertyGroup -> fullProps))
    assert(c.sfPort == 443)
  }

  test("operation dispatch is the reference's: append is UNSUPPORTED too") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("k", "v")
    for (op <- Seq("append", "merge", "", "UPSERT")) {
      val c = JobAssembly.fromMap(fullProps + ("iceberg.operation" -> op))
      val e = intercept[IllegalArgumentException] { JobAssembly.applySink(c, df) }
      assert(e.getMessage == s"Unsupported iceberg operation: $op")
    }
    // upsert with no equality fields is loud BEFORE any data moves
    val c = JobAssembly.fromMap(fullProps + ("iceberg.upsert.equality.fields" -> ""))
    intercept[IllegalArgumentException] { JobAssembly.applySink(c, df) }
  }

  test("validate: partition fields must exist in the schema") {
    val schema = StructType(Seq(StructField("a", LongType), StructField("k1", LongType)))
    val bad = intercept[IllegalArgumentException] {
      JobAssembly.validate(JobAssembly.fromMap(fullProps), schema)
    }
    assert(bad.getMessage.contains("b"))
    val ok = JobAssembly.validate(JobAssembly.fromMap(
      fullProps + ("iceberg.partition.fields" -> "a")), schema)
    assert(ok.partitionFields == Seq("a"))
  }

  test("end-to-end: two properties-driven cycles page, type, upsert, and advance offsets") {
    import spark.implicits._
    val wh = "/tmp/graft_tables/job_assembly_spec"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(wh), true)
    val props = fullProps ++ Map(
      "iceberg.warehouse" -> wh,
      "iceberg.partition.fields" -> "",
      "snowflake.column.name" -> "shard",
      "snowflake.order.column.name" -> "ord",
      "snowflake.query.size.interval" -> "3",
      "iceberg.upsert.equality.fields" -> "id")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("shard", StringType),
      StructField("val", LongType)))
    val cfg = JobAssembly.validate(JobAssembly.loadApplicationParameters(
      Map(JobAssembly.PropertyGroup -> props)), schema)
    // staged all-string source: shard A has 5 rows, B has 2
    val staged = (1L to 5L).map(i => (i, "A", i * 10)) ++
      Seq((6L, "B", 60L), (7L, "B", 70L))
    val stagedDf = staged.toDF("id", "shard", "val")
      .select(col("id").cast("string").as("id"), col("shard"),
        col("val").cast("string").as("val"))
      .withColumn("ord", lpad(col("id"), 6, "0"))

    val off1 = JobAssembly.runCycle(stagedDf, cfg, schema, Map.empty)
    assert(off1 == Map("A" -> 3L, "B" -> 2L)) // page size 3, B exhausted
    val t1 = VersionedTable.read(spark, cfg.tablePath)
      .select($"id", $"shard", $"val").as[(Long, String, Long)].collect().toSet
    assert(t1 == Set((1L, "A", 10L), (2L, "A", 20L), (3L, "A", 30L),
      (6L, "B", 60L), (7L, "B", 70L)))

    val off2 = JobAssembly.runCycle(stagedDf, cfg, schema, off1)
    assert(off2 == Map("A" -> 5L, "B" -> 2L)) // A drained, B unchanged
    val t2 = VersionedTable.read(spark, cfg.tablePath)
      .select($"id").as[Long].collect().toSet
    assert(t2 == (1L to 7L).toSet)
  }
}
