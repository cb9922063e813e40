package graft

import graft.sources.ShardedIngest
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** The JDBC sharded page read (per-shard ORDER BY/OFFSET/FETCH pushed into
  * the database) must return exactly what the declarative parquet-side pager
  * returns for the same (shard, sortCols, offsets, pageSize) contract —
  * Derby in-process stands in for the warehouse endpoint.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graft_spec;create=true"

  test("viaJdbc pages equal the parquet pager's pages") {
    val base = graft.core.eventsTable(spark, sf("sf0.001"))
      .select($"event_id", $"event_type", graft.core.micros($"ts").as("tsu"))
    base.write.format("jdbc")
      .option("url", url).option("dbtable", "events_spec")
      .option("createTableColumnTypes", "event_type VARCHAR(32)")
      .mode(SaveMode.Overwrite).save()

    val offsets = Map("click" -> 7L, "view" -> 123L)
    val shards = ShardedIngest.discoverShardsJdbc(spark, url, "events_spec", "event_type")
    assert(shards == base.select("event_type").distinct()
      .collect().map(_.getString(0)).toSeq.sorted)

    val viaDb = ShardedIngest.viaJdbc(spark, url, "events_spec", "event_type",
        Seq("tsu", "event_id"), offsets, 250L, shards)
      .select($"event_id", $"event_type", $"tsu")
      .as[(Long, String, Long)].collect().toSet
    val viaParquet = ShardedIngest.page(base, "event_type",
        Seq("tsu", "event_id"), offsets, 250L)
      .select($"event_id", $"event_type", $"tsu")
      .as[(Long, String, Long)].collect().toSet
    assert(viaDb == viaParquet && viaDb.nonEmpty)
  }

  test("dialect matrix: page SQL per dialect; LIMIT-dialect scope documented") {
    import ShardedIngest.PagingDialect
    // OffsetFetch (ANSI: Derby/SQL Server/Oracle/Snowflake) — live-proven in
    // the tests above; LimitOffset (PostgreSQL/MySQL/SQLite/H2/DuckDB) —
    // SQL-generation pinned here. No LIMIT-dialect engine ships in this
    // sandbox (Derby only), so live coverage is single-dialect BY SCOPE:
    // the page clause is the only dialect-dependent token in the query.
    val ansi = ShardedIngest.pageSql("t", "shard", Seq("ts", "id"),
      "cli'ck", offset = 7L, pageSize = 250L, PagingDialect.OffsetFetch)
    assert(ansi ==
      """SELECT * FROM t WHERE "shard" = 'cli''ck'
        |ORDER BY "ts", "id"
        |OFFSET 7 ROWS FETCH NEXT 250 ROWS ONLY""".stripMargin, ansi)
    val lim = ShardedIngest.pageSql("t", "shard", Seq("ts", "id"),
      "view", offset = 0L, pageSize = 100L, PagingDialect.LimitOffset)
    assert(lim ==
      """SELECT * FROM t WHERE "shard" = 'view'
        |ORDER BY "ts", "id"
        |LIMIT 100 OFFSET 0""".stripMargin, lim)
    // Derby itself parses the LIMIT clause nowhere — assert the live path
    // rejects the wrong dialect loudly rather than silently mis-paging
    val e = intercept[Exception] {
      ShardedIngest.viaJdbc(spark, url, "events_spec", "event_type",
        Seq("tsu", "event_id"), Map.empty, 10L, Seq("click"),
        dialect = PagingDialect.LimitOffset).collect()
    }
    assert(e.getMessage != null)
  }

  test("viaJdbc offset advance replays the incremental contract") {
    val shards = ShardedIngest.discoverShardsJdbc(spark, url, "events_spec", "event_type")
    val page1 = ShardedIngest.viaJdbc(spark, url, "events_spec", "event_type",
      Seq("tsu", "event_id"), Map.empty, 100L, shards)
    val next = ShardedIngest.nextOffsets(page1, "event_type", Map.empty)
    val page2 = ShardedIngest.viaJdbc(spark, url, "events_spec", "event_type",
      Seq("tsu", "event_id"), next, 100L, shards)
    // pages are disjoint and contiguous: together they equal the first 200/shard
    val bothPages = page1.select("event_id").unionByName(page2.select("event_id"))
      .as[Long].collect().toSet
    val base = graft.core.eventsTable(spark, sf("sf0.001"))
      .select($"event_id", $"event_type", graft.core.micros($"ts").as("tsu"))
    val first200 = ShardedIngest.page(base, "event_type",
        Seq("tsu", "event_id"), Map.empty, 200L)
      .select("event_id").as[Long].collect().toSet
    assert(page1.count() + page2.count() == bothPages.size) // disjoint
    assert(bothPages == first200)
  }
}
