package graft.pipeline

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Doc
import graft.tokenize.SpanTokenizer

/** The end-to-end extraction job (SURVEY.md §4 physical plan):
  *
  *   read -> drop committed buckets -> skew-aware repartition ->
  *   mapPartitions(tokenizer kernel) -> write(partitionBy bucket) ->
  *   metrics + per-bucket commit manifests
  *
  * Scale design decisions, in order of importance at 10^12 docs:
  *  - documents stay single rows end-to-end (extraction is embarrassingly
  *    parallel, map-only; the ONLY planned shuffle is the repartition);
  *  - buckets = hash(doc_id) % B drive both resumability (a bucket is the
  *    commit unit) and output layout (partitionBy("bucket") with dynamic
  *    overwrite keeps re-runs idempotent);
  *  - skew: doc_weight = total raw text length; docs above `heavyWeight`
  *    are isolated onto their own partitions (a pathological mega-doc can't
  *    hold a whole partition of normal docs hostage), everything else is
  *    salted uniformly (hash(doc_id) is already uniform);
  *  - commit groups: buckets are processed in groups of `groupSize`; after
  *    each group's write, its manifests commit atomically. A kill between
  *    groups loses at most one group of work; Iceberg snapshot-per-group in
  *    production (see Checkpoint.scala);
  *  - lineage: every output row carries extraction_path + the physical
  *    partition id that produced it; per-(bucket, partition) metric rows
  *    land next to the data (Provenance.extraction_path semantics,
  *    reference src/pipeline/provenance.py:132-139).
  */
object ExtractJob {

  final case class Config(
      nBuckets: Int = 32,
      groupSize: Int = 8,
      heavyWeight: Long = 200000L,
      tokenizer: SpanTokenizer.Config = SpanTokenizer.default,
      runId: String = "run",
      // test hook: simulate a crash after N commit groups
      failAfterGroups: Option[Int] = None)

  final case class RunStats(
      processedBuckets: Seq[Int],
      skippedBuckets: Seq[Int],
      nDocs: Long,
      nSpans: Long,
      nErrors: Long)

  /** One extracted output row (long-lived storage schema). */
  final case class OutRow(
      doc_id: String,
      spans: Seq[graft.model.Span],
      n_spans: Int,
      n_errors: Int,
      modalities: Seq[String],
      extraction_path: Seq[String],
      partition_id: Int,
      bucket: Int)

  def bucketOf(docId: String, nBuckets: Int): Int = {
    val h = graft.functions.Hashing.fnv1a64(docId)
    (((h % nBuckets) + nBuckets) % nBuckets).toInt
  }

  def run(spark: SparkSession, docs: Dataset[Doc], outDir: String,
      cfg: Config = Config()): RunStats = {
    import spark.implicits._
    val store = new LocalManifestStore(outDir)
    val committed = store.committedBuckets()
    val allBuckets = 0 until cfg.nBuckets
    val remaining = allBuckets.filterNot(committed.contains)
    if (remaining.isEmpty)
      return RunStats(Nil, committed.toSeq.sorted, 0L, 0L, 0L)

    val nB = cfg.nBuckets
    val heavy = cfg.heavyWeight
    // weight + bucket computed once, before the shuffle
    val keyed = docs.map { d =>
      val weight = d.spans.iterator.map(s =>
        s.text.length.toLong + s.media_ref.length.toLong).sum
      (bucketOf(d.doc_id, nB), weight, d)
    }.toDF("bucket", "weight", "doc")

    val groups = remaining.grouped(cfg.groupSize).toSeq
    var processed = List.empty[Int]
    var totDocs = 0L; var totSpans = 0L; var totErrors = 0L
    val tok = cfg.tokenizer

    groups.zipWithIndex.foreach { case (group, gi) =>
      if (cfg.failAfterGroups.forall(gi < _)) {
        val groupSet = group.toSet
        val inGroup = keyed.filter(col("bucket").isin(group.map(Integer.valueOf): _*))
        // Light docs: salted hash repartition (uniform). Heavy docs: their own
        // repartition by doc_id. The union CONCATENATES the two partition
        // sets without another shuffle, so no light doc ever shares a
        // partition with a mega-doc — a straggler mega-doc can only delay
        // its own partition.
        val light = inGroup.filter(col("weight") < heavy)
          .repartition(col("bucket"), pmod(xxhash64(col("doc.doc_id")), lit(64)))
        val heavyDs = inGroup.filter(col("weight") >= heavy)
          .repartition(col("doc.doc_id"))
        val part = light.unionByName(heavyDs)
        val extracted = part.select(col("doc").as[Doc])
          .mapPartitions { it =>
            val pid = TaskContext.getPartitionId()
            SpanTokenizer.extractPartition(it, tok).map { e =>
              OutRow(e.doc_id, e.spans, e.n_spans, e.n_errors, e.modalities,
                e.extraction_path :+ s"commit_group:$gi", pid,
                bucketOf(e.doc_id, nB))
            }
          }
        extracted.write
          .mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("bucket")
          .parquet(s"$outDir/data")

        // metric rows at (bucket, partition) granularity — the per-partition
        // lineage record written alongside each commit
        val metrics = spark.read.parquet(s"$outDir/data")
          .filter(col("bucket").isin(group.map(Integer.valueOf): _*))
          .groupBy(col("bucket"), col("partition_id"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_spans")).as("n_spans"),
            sum(col("n_errors")).as("n_errors"))
          .withColumn("run_id", lit(cfg.runId))
        metrics.write.mode(SaveMode.Append).parquet(s"$outDir/metrics")

        val perBucket = metrics.groupBy("bucket")
          .agg(sum("n_docs").as("d"), sum("n_spans").as("s"), sum("n_errors").as("e"))
          .collect()
          .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
          .toMap
        group.foreach { b =>
          val (d, s, e) = perBucket.getOrElse(b, (0L, 0L, 0L))
          store.commit(BucketManifest(b, d, s, e, cfg.runId))
          totDocs += d; totSpans += s; totErrors += e
        }
        processed = processed ++ group
      }
    }
    RunStats(processed, committed.toSeq.sorted, totDocs, totSpans, totErrors)
  }
}
