package graft

import org.apache.spark.sql.SparkSession

/** Extra measurement harness for the optimization rounds (guide §1) — the
  * frozen `graft.Bench` is the graded artifact; this main exists so per-query
  * work can be isolated and re-measured quickly without touching it.
  *
  * Usage (all args optional):
  *   sbt "runMain graft.BenchExtra [--mode count|noop] [--passes N]
  *        [--explain <outDir>] [query names...]"
  *
  *  - `--mode noop` times `df.write.format("noop")` (computes every column of
  *    every row — guide §1.4) instead of the harness's `.count()` action;
  *  - `--passes N` repeats each query N times and reports every sample plus
  *    the min (JIT-warm steady state);
  *  - `--explain dir` additionally writes `.explain("formatted")` for each
  *    selected query to `dir/<name>.txt` (the plan evidence committed under
  *    plans/r06/);
  *  - trailing args select queries by exact name (default: all).
  *
  * Environment mirrors Bench: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    var mode = "count"
    var passes = 1
    var explainDir: Option[String] = None
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--mode" => mode = args(i + 1); i += 2
        case "--passes" => passes = args(i + 1).toInt; i += 2
        case "--explain" => explainDir = Some(args(i + 1)); i += 2
        case q => names += q; i += 1
      }
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try spark.read.parquet(s"$sfDir/nation.parquet").count()
    catch { case _: Throwable => }

    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names.contains(n) }

    explainDir.foreach { d =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
      selected.foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(d, s"$name.txt"), txt)
          System.err.println(s"[explain] wrote $d/$name.txt")
        } catch {
          case e: Throwable => System.err.println(s"[explain] $name FAILED: $e")
        }
      }
    }

    val results = selected.map { case (name, fn) =>
      spark.sparkContext.setJobDescription(name)
      val samples = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        try {
          val df = fn(spark, sfDir)
          if (mode == "noop") df.write.format("noop").mode("overwrite").save()
          else df.count()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench-extra] $name FAILED: $e"); -1.0
        }
      }
      spark.sparkContext.setJobDescription(null)
      name -> samples
    }
    val qjson = results.map { case (n, ss) =>
      f""""$n":{"min":${ss.filter(_ >= 0).minOption.getOrElse(-1.0)}%.3f,""" +
        ss.map(s => f"$s%.3f").mkString(""""samples":[""", ",", "]}")
    }.mkString("{", ",", "}")
    val total = results.flatMap(_._2.filter(_ >= 0).minOption).sum
    println(f"""{"metric":"extra","mode":"$mode","value":$total%.3f,"unit":"sec","queries":$qjson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
