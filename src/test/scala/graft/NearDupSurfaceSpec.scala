package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.DocumentsQ

/** The full near-dup pair surfaces (d06/d07 ...All): incidental base-base
  * discoveries must be PRESENT and distinguishable from the planted recall
  * rows — round-2 verdict item 7 (the oracled queries keep only the planted
  * subset; the operator a production user runs is the full surface).
  */
class NearDupSurfaceSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Crafted corpus: docs 1 and 2 are exact duplicates (an incidental
    * base-base near-dup pair by construction: identical shingle sets and
    * identical token bags), doc 3 is unrelated.
    */
  private lazy val dir: String = {
    import spark.implicits._
    val a = (1 to 50).map(k => s"alpha$k").mkString(" ")
    val c = (1 to 50).map(k => s"omega${k * 7}").mkString(" ")
    val out = Files.createTempDirectory("graft_neardup").toString
    Seq((1L, a), (2L, a), (3L, c)).toDF("doc_id", "text")
      .write.parquet(s"$out/documents.parquet")
    out
  }

  test("minhash full surface carries the incidental pair, flagged") {
    val all = DocumentsQ.d06MinhashLshAll(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(all.contains((1L, 2L, false)), s"incidental base-base pair missing: $all")
    assert(all.contains((1L, 10000001L, true)) && all.contains((2L, 10000002L, true)))
    // oracle projection = planted rows only
    val oracled = DocumentsQ.d06MinhashLsh(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(oracled == all.filter(_._3).map(t => (t._1, t._2)))
  }

  test("simhash full surface carries the incidental pair, flagged") {
    val all = DocumentsQ.d07SimhashAll(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getBoolean(3)))
    val byPair = all.map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    assert(byPair.get((1L, 2L)).exists { case (h, p) => h == 0 && !p },
      s"incidental Hamming-0 pair missing: ${all.toSeq}")
    assert(byPair.get((1L, 10000001L)).exists { case (h, p) => h == 0 && p })
    val oracled = DocumentsQ.d07Simhash(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(oracled == all.filter(_._4).map(t => (t._1, t._2)).toSet)
  }
}
