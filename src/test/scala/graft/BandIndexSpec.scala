package graft

import graft.operators.NearDup
import org.apache.spark.sql.DataFrame

/** The persisted MinHash band index (build / append / dedup-against-index)
  * must be EXACTLY the incremental path's semantics with the corpus-side
  * compute moved to build time: result-equivalence to [[NearDup.dedupAgainstCorpus]],
  * append consistency across ingest batches, parameterization pinned in the
  * index metadata (a build/query (numPerms, bands) mismatch silently loses
  * recall, so the params are index properties the query path reads back),
  * and a plan with no corpus-side shingle/minhash recompute.
  */
class BandIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = core.table(spark, sf("sf0.001"), "documents")
    .select($"doc_id", $"text")

  /** A batch of near-dups (corpus copies) and genuinely-new docs. */
  private lazy val batch = {
    val dup = corpus.filter($"doc_id" % 7 === 0)
      .select(($"doc_id" + 500000L).as("doc_id"), $"text")
    val fresh = corpus.filter($"doc_id" % 7 === 1)
      .select(($"doc_id" + 600000L).as("doc_id"),
        org.apache.spark.sql.functions.translate(
          org.apache.spark.sql.functions.md5($"doc_id".cast("string")),
          "0123456789", "qrstuvwxyz").as("text"))
    dup.union(fresh)
  }

  private def path(name: String) = {
    val p = s"/tmp/graft_test_bandindex/$name"
    graft.sinks.GraftTableWriter.drop(spark, p)
    p
  }

  private def ids(df: DataFrame): Set[Long] =
    df.select($"doc_id").as[Long].collect().toSet

  test("dedupAgainstIndex equals dedupAgainstCorpus") {
    val p = path("equiv")
    NearDup.buildBandIndex(corpus, p)
    val viaIndex = NearDup.dedupAgainstIndex(batch, p, 0.8)
    val viaCorpus = NearDup.dedupAgainstCorpus(corpus, batch, 0.8)
    assert(ids(viaIndex) == ids(viaCorpus))
    // the batch contains both survivors and dropped near-dups, so the
    // equivalence is not vacuous
    assert(ids(viaIndex).nonEmpty && ids(viaIndex).size < batch.count())
  }

  test("appendToBandIndex keeps the index consistent across ingest batches") {
    val p = path("append")
    val half1 = corpus.filter($"doc_id" % 2 === 0)
    val half2 = corpus.filter($"doc_id" % 2 =!= 0)
    NearDup.buildBandIndex(half1, p)
    NearDup.appendToBandIndex(half2, p)
    assert(ids(NearDup.dedupAgainstIndex(batch, p, 0.8)) ==
      ids(NearDup.dedupAgainstCorpus(corpus, batch, 0.8)))
    // batch docs duplicating HALF2 docs must be dropped — i.e. the appended
    // half really participates in candidate generation
    val onlyHalf1 = ids(NearDup.dedupAgainstCorpus(half1, batch, 0.8))
    val full = ids(NearDup.dedupAgainstIndex(batch, p, 0.8))
    assert(full.subsetOf(onlyHalf1) && full != onlyHalf1,
      "appended half contributed no additional drops - append is not indexed")
  }

  test("(numPerms, bands) round-trip through the index metadata") {
    val p = path("meta")
    NearDup.buildBandIndex(corpus, p, numPerms = 32, bands = 8)
    assert(NearDup.indexMeta(spark, p) == NearDup.BandIndexMeta(32, 8))
    // the query path bands the batch with the persisted (32, 8), so the
    // collision space matches the index and results equal the direct path
    assert(ids(NearDup.dedupAgainstIndex(batch, p, 0.8)) ==
      ids(NearDup.dedupAgainstCorpus(corpus, batch, 0.8, numPerms = 32, bands = 8)))
    // append AFTER the dedup (the admit-then-grow order of a real ingest);
    // appended rows must use the PERSISTED parameterization: 8 bands per doc
    NearDup.appendToBandIndex(batch, p)
    val bands = graft.sinks.VersionedTable.read(spark, s"$p/bands")
    val perDoc = bands.groupBy("doc_id").count().select($"count").distinct()
      .as[Long].collect().toSet
    assert(perDoc == Set(8L), s"expected 8 band rows per doc, got $perDoc")
  }

  test("dedupAgainstIndex without a built index fails loudly") {
    val p = path("missing")
    intercept[IllegalStateException] {
      NearDup.dedupAgainstIndex(batch, p, 0.8)
    }
  }

  test("index path recomputes no corpus-side shingles (plan audit)") {
    val p = path("plan")
    NearDup.buildBandIndex(corpus, p)
    def shingleOps(df: DataFrame): Int =
      "(?i)wordshingles".r.findAllIn(df.queryExecution.executedPlan.toString).size
    val indexed = NearDup.dedupAgainstIndex(batch, p, 0.8)
    val naive = NearDup.dedupAgainstCorpus(corpus, batch, 0.8)
    indexed.collect(); naive.collect() // AQE: final plans exist only after execution
    val planStr = indexed.queryExecution.executedPlan.toString
    assert(planStr.contains(p), "corpus side must scan the persisted index parquet")
    // the indexed plan shingles ONLY the batch; the naive plan also shingles
    // the corpus (sets + bands), so it strictly exceeds the indexed count
    assert(shingleOps(indexed) < shingleOps(naive),
      s"indexed=${shingleOps(indexed)} naive=${shingleOps(naive)}")
  }

  test("streaming near-dup ingest equals a sequential dedupAgainstCorpus replay") {
    import org.apache.spark.sql.functions.col
    val got = SparkEntry.queries("streaming_neardup_ingest")(spark, sf("sf0.001"))
      .as[Long].collect().toSet

    // replay: same seed + same four slices, each deduped against the corpus
    // as it stood BEFORE the batch, then admitted
    val docs = core.table(spark, sf("sf0.001"), "documents").select($"doc_id", $"text")
    val seed = docs.filter($"doc_id" % 2 === 0)
    val copies = (prev: DataFrame) =>
      prev.select(($"doc_id" + 1000000L).as("doc_id"), $"text")
    val slice = (k: Int) => docs.filter(col("doc_id") % 8 === 2 * k + 1)
    val slices = Seq(
      slice(0).unionByName(copies(docs.filter($"doc_id" % 8 === 0))),
      slice(1).unionByName(copies(slice(0))),
      slice(2).unionByName(copies(slice(1))),
      slice(3).unionByName(copies(slice(2))))
    var corpus = seed
    for (sl <- slices) {
      val kept = NearDup.dedupAgainstCorpus(corpus, sl, minJaccard = 0.5)
      corpus = corpus.unionByName(kept).localCheckpoint(true)
    }
    val want = ids(corpus)

    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    assert(got.forall(_ < 1000000L),
      "every verbatim copy (id >= 1e6) must be rejected — slice-k copies of " +
        "slice-(k-1) docs are only rejectable if the index grew between batches")
    assert(slices.map(s => ids(s).count(_ >= 1000000L)).sum > 0, "scenario sanity")
  }
}
