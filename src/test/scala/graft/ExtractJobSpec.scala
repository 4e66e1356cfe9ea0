package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Doc
import graft.pipeline.{ExtractJob, LocalManifestStore}
import graft.tokenize.DocGen

/** Resume fixture (FIXTURES.md §6): a run killed after K of B buckets commit
  * must, on re-run, reprocess only B-K buckets; output must contain every
  * doc exactly once with the span-order invariant intact.
  */
class ExtractJobSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs(n: Int) = {
    import spark.implicits._
    spark.range(n).map(i => DocGen.syntheticDoc(i)).as[Doc]
  }

  test("kill after 2 commit groups, resume processes only the remainder") {
    val out = Files.createTempDirectory("graft_job").toString
    val nDocs = 600
    val cfg = ExtractJob.Config(nBuckets = 16, groupSize = 4, runId = "r1",
      failAfterGroups = Some(2))

    val first = ExtractJob.run(spark, docs(nDocs), out, cfg)
    assert(first.processedBuckets.length == 8)
    assert(first.skippedBuckets.isEmpty)
    val store = new LocalManifestStore(out)
    assert(store.committedBuckets() == first.processedBuckets.toSet)

    // resume: same job, no failure injection
    val second = ExtractJob.run(spark, docs(nDocs), out,
      cfg.copy(failAfterGroups = None, runId = "r2"))
    assert(second.skippedBuckets.toSet == first.processedBuckets.toSet)
    assert(second.processedBuckets.length == 8)
    assert((first.processedBuckets ++ second.processedBuckets).toSet == (0 until 16).toSet)

    // every doc present exactly once
    val data = spark.read.parquet(s"$out/data")
    assert(data.count() == nDocs)
    assert(data.groupBy("doc_id").count().filter("count > 1").count() == 0)

    // first-run buckets carry run r1 manifests, second-run r2
    assert(first.processedBuckets.forall(b => store.readManifest(b).exists(_.runId == "r1")))
    assert(second.processedBuckets.forall(b => store.readManifest(b).exists(_.runId == "r2")))

    // manifests agree with the data
    val perBucket = data.groupBy("bucket").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    (0 until 16).foreach { b =>
      assert(store.readManifest(b).map(_.nDocs).contains(perBucket.getOrElse(b, 0L)))
    }

    // a third run is a no-op
    val third = ExtractJob.run(spark, docs(nDocs), out, cfg.copy(failAfterGroups = None))
    assert(third.processedBuckets.isEmpty && third.skippedBuckets.length == 16)

    // span-order invariant on the stored output
    import spark.implicits._
    val bad = data.select("spans").as[Seq[graft.model.Span]]
      .filter(s => s.map(_.offset) != s.indices)
      .count()
    assert(bad == 0)

    // per-partition lineage metrics exist and reconcile with totals
    val metrics = spark.read.parquet(s"$out/metrics")
    assert(metrics.columns.toSet ==
      Set("bucket", "partition_id", "n_docs", "n_spans", "n_errors", "run_id"))
    val mDocs = metrics.agg(org.apache.spark.sql.functions.sum("n_docs")).head.getLong(0)
    assert(mDocs == nDocs)
  }

  test("crash INSIDE the per-bucket commit loop loses no data on resume") {
    // Window: group dir renamed into place, only some of its bucket
    // manifests committed. The sweep must revoke those manifests along with
    // the dir so the whole group reprocesses (exactly-once either way).
    val out = Files.createTempDirectory("graft_midcrash").toString
    val nDocs = 400
    val cfg = ExtractJob.Config(nBuckets = 8, groupSize = 4, runId = "c1",
      failAfterBucketCommits = Some(2))
    intercept[ExtractJob.SimulatedCrash] {
      ExtractJob.run(spark, docs(nDocs), out, cfg)
    }
    val store = new LocalManifestStore(out)
    assert(store.committedBuckets().size == 2) // the torn group, half committed

    val second = ExtractJob.run(spark, docs(nDocs), out,
      cfg.copy(failAfterBucketCommits = None, runId = "c2"))
    // the torn group's committed buckets were revoked -> everything reran
    assert(second.skippedBuckets.isEmpty)
    assert(second.processedBuckets.toSet == (0 until 8).toSet)
    val data = spark.read.parquet(s"$out/data")
    assert(data.count() == nDocs)
    assert(data.groupBy("doc_id").count().filter("count > 1").count() == 0)
    // manifests agree with the data after the recovery run
    val perBucket = data.groupBy("bucket").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    (0 until 8).foreach { b =>
      assert(store.readManifest(b).map(_.nDocs).contains(perBucket.getOrElse(b, 0L)))
      assert(store.readManifest(b).exists(_.runId == "c2"))
    }
  }

  test("mega-docs are isolated onto their own partitions") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_skew").toString
    // low heavy threshold so the synthetic mega tail definitely qualifies
    val cfg = ExtractJob.Config(nBuckets = 4, groupSize = 4, heavyWeight = 5000L,
      runId = "skew")
    // choose n so the deterministic mega tail is definitely included
    val firstMega = (0L until 20000L)
      .find(i => DocGen.megaFactor(i) > 1)
      .getOrElse(fail("no mega doc in generator range"))
    val n = firstMega.toInt + 200
    val stats = ExtractJob.run(spark, docs(n), out, cfg)
    assert(stats.nDocs == n)
    val data = spark.read.parquet(s"$out/data")
    val megaDocIds: Seq[String] = (0L until n.toLong)
      .filter(i => DocGen.syntheticDoc(i).spans.iterator
        .map(s => s.text.length.toLong + s.media_ref.length).sum >= 5000L)
      .map(i => f"doc_$i%09d")
    assert(megaDocIds.nonEmpty, "expected at least one mega doc in range")
    // no light doc shares a physical partition with a mega doc
    val partOfMega = data
      .filter(org.apache.spark.sql.functions.col("doc_id").isin(megaDocIds: _*))
      .select("partition_id").as[Int].collect().toSet
    val partOfLight = data
      .filter(!org.apache.spark.sql.functions.col("doc_id").isin(megaDocIds: _*))
      .select("partition_id").as[Int].collect().toSet
    assert(partOfMega.nonEmpty && partOfMega.intersect(partOfLight).isEmpty,
      s"mega partitions $partOfMega must be disjoint from light partitions")
  }
}
