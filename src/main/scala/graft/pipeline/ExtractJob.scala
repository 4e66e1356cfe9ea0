package graft.pipeline

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Doc
import graft.tokenize.SpanTokenizer

/** The end-to-end extraction job (SURVEY.md §4 physical plan):
  *
  *   read -> drop committed buckets -> skew-aware repartition ->
  *   mapPartitions(tokenizer kernel) -> atomic group-dir write ->
  *   metrics + per-bucket commit manifests
  *
  * Scale design decisions, in order of importance at 10^12 docs:
  *  - documents stay single rows end-to-end (extraction is embarrassingly
  *    parallel, map-only; the ONLY planned shuffle is the repartition);
  *  - buckets = hash(doc_id) % B drive resumability (a bucket is the commit
  *    unit recorded in the manifest store); buckets are processed in groups
  *    of `groupSize`, and each group's output is written to a temp dir then
  *    atomically renamed to `data/group=<buckets>` — a group is either fully
  *    visible or absent, so a kill loses at most one group of work. In
  *    production the rename is an Iceberg snapshot commit (Checkpoint.scala);
  *    on re-run, group dirs whose buckets are not all manifest-committed are
  *    swept away before processing, so output rows are exactly-once;
  *  - file count is bounded by tasks-per-group (one file per non-empty task),
  *    NOT tasks x buckets: we deliberately do NOT partitionBy("bucket") at
  *    write time — with a salted composite repartition every task would touch
  *    every bucket and emit tasks x buckets small files per group, the classic
  *    small-files failure at 1000 executors. Bucket stays a data column; the
  *    manifest maps buckets -> group dirs for pruned reads;
  *  - skew: doc_weight = total raw payload length; docs above `heavyWeight`
  *    are isolated onto their own partitions (a pathological mega-doc can't
  *    hold a whole partition of normal docs hostage), everything else is
  *    salted uniformly (hash(doc_id) is already uniform);
  *  - per-group metrics read back only that group's files (O(group), not
  *    O(total output) — re-reading the whole table per commit would be
  *    quadratic across a run);
  *  - lineage: every output row carries extraction_path + the physical
  *    partition id that produced it; per-(bucket, partition) metric rows
  *    land next to the data (Provenance.extraction_path semantics,
  *    reference src/pipeline/provenance.py:132-139). Metrics are append-only
  *    history keyed by run_id; the authoritative totals live in the bucket
  *    manifests.
  */
object ExtractJob {

  /** Shuffle-partition sizing rule (measured, BASELINE.md round-3 wave A/B):
    * on skewed corpora run MULTIPLE scheduling waves — shuffle partitions
    * >= 3-4x total cores — so mega-doc task-duration variance can be
    * rebalanced by the scheduler instead of extending the critical path
    * (N-vs-4N efficiency 0.69 with 1 wave vs 0.89 with 4 on the 1.6M
    * skewed corpus). Uniform corpora are fine at 1 wave.
    *
    * heavyWeight sizing rule (measured, see BASELINE.md skew A/B): isolate a
    * document only when it is a meaningful fraction (~5%) of one partition's
    * total char budget — below that, the salted uniform path absorbs the
    * skew for free, and isolation's extra input scan + shuffle wave is a net
    * loss (800k-doc corpus with 0.65k-x megas ran ~20% slower isolated).
    * Default 5M chars ~ 5% of a 100M-char partition at the bench shape; at
    * 10^12 docs set it from table stats: heavyWeight ~ 0.05 * totalChars /
    * shufflePartitions.
    */
  final case class Config(
      nBuckets: Int = 32,
      groupSize: Int = 8,
      heavyWeight: Long = 5000000L,
      saltMod: Int = 64,
      // Heavy-branch relocation: heavy docs are spread over this many PINNED
      // partitions (REPARTITION_BY_NUM, not AQE-coalescible) so a
      // kernel+write task carries ~1-2 mega-docs. The relocation shuffle is
      // kept unconditionally: a scan-side-only heavy branch was A/B'd in
      // round 6 (same corpus, same window) and lost ~30% at c16 — without
      // relocation each heavy scan split funnels its ~20+ megas through one
      // encode task. The count is sized from the DATA (expected heavies per
      // group / target megas-per-task; at 10^12 docs set it from table
      // stats), deliberately NOT from the core count: a cores-proportional
      // count (an earlier round-6 shape) launches more tasks on bigger
      // clusters for the same 390 megas, pure scheduling overhead on the
      // wider leg. 256 ≈ 1.5 megas/task at the bench's mega density; too
      // few partitions re-creates the funnel via hash-collision stragglers
      // (128 parts measured 35% slower at c16 than 512).
      heavyParts: Int = 256,
      // Salted light-branch shuffle, OFF by default (round-6 measurement):
      // with heavy docs isolated onto their own partitions, the remaining
      // light work is byte-proportional and parquet scan splits are already
      // byte-balanced (maxPartitionBytes packing), so the salt shuffle
      // moved the full corpus bytes through a shuffle for no balance gain —
      // removing it cut the c16 skew leg ~9% and left c4 unchanged (A/B in
      // OPTIMIZATION_r06.md). Turn back on for sources whose per-row WORK
      // is not byte-proportional (then byte-balanced splits are not
      // work-balanced and the salt spread earns its shuffle).
      saltLight: Boolean = false,
      // Output writer options. Dictionary encoding is disabled by default:
      // extracted span text is high-cardinality, so the dictionary pass
      // burns encoder CPU and memory only to overflow and fall back —
      // measured +13% on the 16-core skew leg with no c4 change (guide §6;
      // snappy page compression still applies).
      writeOptions: Map[String, String] =
        Map("parquet.enable.dictionary" -> "false"),
      tokenizer: SpanTokenizer.Config = SpanTokenizer.default,
      runId: String = "run",
      // test hook: simulate a crash after N commit groups
      failAfterGroups: Option[Int] = None,
      // test hook: simulate a crash after N BUCKET manifest commits — lands
      // inside the per-bucket commit loop, the window the sweep's manifest
      // revocation exists for
      failAfterBucketCommits: Option[Int] = None)

  /** Thrown by the failAfterBucketCommits test hook (simulated crash). */
  final class SimulatedCrash extends RuntimeException("simulated crash")

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

  private def deleteRecursively(p: Path): Unit = Manifests.deleteRecursively(p)

  /** Sweep stale state from a previous crashed run: temp dirs, and any group
    * dir whose buckets are not ALL manifest-committed (a crash between the
    * group rename and its manifest writes leaves such a dir; its buckets will
    * be reprocessed, so the dir must go to keep output exactly-once).
    *
    * Crash WINDOW inside the per-bucket manifest loop: a group dir can exist
    * with only SOME of its buckets committed. Deleting the dir alone would
    * lose the committed buckets' rows forever (their manifests would still
    * claim them done, so they'd never reprocess) — so sweeping a group dir
    * also REVOKES the manifests of every bucket named in it, making the whole
    * group reprocess. The group is thus the atomic commit unit; bucket
    * manifests within a fully-present group remain the resume granularity.
    * Returns the committed set after revocations.
    */
  private def sweepUncommitted(outDir: String, store: SnapshotStore,
      committed: Set[Int]): Set[Int] = {
    val root = Paths.get(outDir)
    if (!Files.isDirectory(root)) return committed
    scala.util.Using.resource(Files.list(root))(
      _.iterator().asScala
        .filter(_.getFileName.toString.startsWith(".tmp-group-"))
        .toSeq.foreach(deleteRecursively))
    var alive = committed
    val dataDir = root.resolve("data")
    if (!Files.isDirectory(dataDir)) return alive
    scala.util.Using.resource(Files.list(dataDir))(
      _.iterator().asScala
        .filter(_.getFileName.toString.startsWith("group="))
        .toSeq)
      .foreach { d =>
        val buckets = d.getFileName.toString.stripPrefix("group=")
          .split('-').flatMap(s => scala.util.Try(s.toInt).toOption)
        if (!buckets.forall(committed.contains)) {
          // Revoke FIRST, then delete: a crash after the revokes leaves a
          // group dir with not-all-committed buckets, which the next sweep
          // deletes and re-revokes safely (idempotent). The reverse order
          // has a window where the data is gone but manifests still claim
          // the committed buckets done — those rows would be lost forever.
          buckets.foreach(store.revoke)
          deleteRecursively(d)
          alive = alive -- buckets
        }
      }
    alive
  }

  def run(spark: SparkSession, docs: Dataset[Doc], outDir: String,
      cfg: Config = Config()): RunStats = {
    import spark.implicits._
    val store = new LocalManifestStore(outDir)
    val committed = sweepUncommitted(outDir, store, store.committedBuckets())
    val allBuckets = 0 until cfg.nBuckets
    val remaining = allBuckets.filterNot(committed.contains)
    if (remaining.isEmpty)
      return RunStats(Nil, committed.toSeq.sorted, 0L, 0L, 0L)

    val nB = cfg.nBuckets
    val heavy = cfg.heavyWeight
    // weight + bucket computed as COLUMNS before the shuffle: a typed
    // map-to-tuple here would deserialize + re-serialize every nested spans
    // array once more per row; `aggregate` over the struct column and a
    // string-only UDF stay on the columnar path
    val bucketUdf = udf((id: String) => bucketOf(id, nB))
    // octet_length, not length: byte count is O(1) on the UTF8 payload while
    // character count rescans every byte, and the weight is a routing
    // heuristic — bytes are, if anything, the truer cost proxy (threshold
    // docs above updated to bytes).
    val keyed = docs.toDF()
      .withColumn("weight", aggregate(col("spans"), lit(0L), (acc, s) =>
        acc + octet_length(s.getField("text")).cast("long") +
          octet_length(s.getField("media_ref")).cast("long")))
      .withColumn("bucket", bucketUdf(col("doc_id")))

    val groups = remaining.grouped(cfg.groupSize).toSeq
    var processed = List.empty[Int]
    var totDocs = 0L; var totSpans = 0L; var totErrors = 0L
    val tok = cfg.tokenizer

    groups.zipWithIndex.foreach { case (group, gi) =>
      if (cfg.failAfterGroups.forall(gi < _)) {
        // At 10^12 scale this filter is partition pruning on the bucketed
        // input table (each group scans only its own buckets); locally it
        // re-derives the input per group — bench runs use one group.
        val inGroup = keyed.filter(col("bucket").isin(group.map(Integer.valueOf): _*))
        // Light docs: salted hash repartition (uniform). Heavy docs: their own
        // repartition by doc_id. The union CONCATENATES the two partition
        // sets without another shuffle, so no light doc ever shares a
        // partition with a mega-doc — a straggler mega-doc can only delay
        // its own partition. The two branches are two scans of the input; on
        // the production table the weight predicate pushes into row-group
        // stats (cluster by weight at ingest), so the heavy scan is ~free.
        //
        // The heavy repartition PINS its partition count (round-6 fix). A
        // column-only repartition is an AQE-coalescible shuffle
        // (REPARTITION_BY_COL), and AQE's byte-targeted coalescing was
        // silently undoing this whole layout: measured on the skewed bench
        // corpus at local[16] x 4 waves, the heavy branch's 64 partitions
        // coalesced to SIX carrying 14-25 mega-docs EACH — the exact
        // all-megas-through-one-task funnel the isolation exists to prevent,
        // and the write-stage wall behind the sub-0.8 skew scaling readings
        // of rounds 3-5. Pinned at `shuffle.partitions x heavyFanout`, each
        // mega lands alone in its own kernel+write task (an empty heavy
        // partition costs a no-op task launch). The light branch skips the
        // shuffle entirely by default (see Config.saltLight): scan splits
        // are byte-balanced, which IS the balance the salt bought, minus a
        // full corpus pass through the shuffle machinery. AQE still
        // coalesces every other shuffle in the job (metrics aggregation,
        // the opt-in salted path).
        val spNum = spark.sessionState.conf.numShufflePartitions
        val lightRaw = inGroup.filter(col("weight") < heavy)
        val light =
          if (cfg.saltLight)
            lightRaw.repartition(spNum, col("bucket"),
              pmod(xxhash64(col("doc_id")), lit(cfg.saltMod)))
          else lightRaw
        val heavyDs = inGroup.filter(col("weight") >= heavy)
          .repartition(cfg.heavyParts, col("doc_id"))
        // heavy partitions FIRST: union concatenates partition lists and
        // Spark schedules tasks in partition order — longest-processing-
        // time-first lets the mega-doc tasks run while light tasks pack
        // around them instead of starting after the lights drain
        val part = heavyDs.unionByName(light)
        val extracted = part.select(col("doc_id"), col("spans")).as[Doc]
          .mapPartitions { it =>
            val pid = TaskContext.getPartitionId()
            SpanTokenizer.extractPartition(it, tok).map { e =>
              OutRow(e.doc_id, e.spans, e.n_spans, e.n_errors, e.modalities,
                e.extraction_path :+ s"commit_group:$gi", pid,
                bucketOf(e.doc_id, nB))
            }
          }

        val gname = group.mkString("-")
        val tmp = Paths.get(outDir, s".tmp-group-$gname")
        extracted.write.options(cfg.writeOptions)
          .mode(SaveMode.Overwrite).parquet(tmp.toString)
        val target = Paths.get(outDir, "data", s"group=$gname")
        Files.createDirectories(target.getParent)
        deleteRecursively(target) // stale uncommitted dir from a crashed run
        Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)

        // metric rows at (bucket, partition) granularity — the per-partition
        // lineage record written alongside each commit; reads ONLY this
        // group's files. The read pins the just-written schema explicitly:
        // schema inference otherwise merges footers across every output
        // file, a driver-side fixed cost that grows with the task count and
        // eats into the faster leg's scaling (Amdahl).
        val metrics = spark.read.schema(extracted.schema).parquet(target.toString)
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
          if (cfg.failAfterBucketCommits.exists(processed.length >= _))
            throw new SimulatedCrash
          val (d, s, e) = perBucket.getOrElse(b, (0L, 0L, 0L))
          store.commit(BucketManifest(b, d, s, e, cfg.runId))
          totDocs += d; totSpans += s; totErrors += e
          processed = processed :+ b
        }
      }
    }
    RunStats(processed, committed.toSeq.sorted, totDocs, totSpans, totErrors)
  }
}
