package graft

import org.apache.spark.sql.SparkSession
import graft.datalog.TableSource
import graft.http.{GraftNode, HttpServer}

/** Standalone node launcher — the analogue of the reference's
  * `crux.main`/`crux.cli` entry point (crux-core/src/crux/cli.clj:1-90:
  * parse options, start a node, serve HTTP until shutdown). A user of the
  * reference runs `java -jar crux.jar -f config.edn`; here:
  *
  * {{{
  *   sbt "runMain graft.Main --data-dir /root/testdata/sf0.01 --port 3000"
  * }}}
  *
  * boots a SparkSession, a [[GraftNode]] over the directory's parquet
  * tables, and the full HTTP surface (query/entity/history/tx/SQL/
  * Avatica/metrics routes) on the given port (0 = ephemeral, printed),
  * then blocks until the process is signalled. Flags mirror the CLI
  * options that matter in this engine:
  *
  *   --data-dir DIR   parquet table directory (required)
  *   --port N         HTTP port (default 0 = ephemeral)
  *   --master M       Spark master (default local[*])
  *   --fn-allowlist a,b,c   engine :fn-allow-list (default open)
  *   --read-only true  serve queries only; submit-tx returns 403
  *                     (the reference's read-only node)
  */
object Main {
  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args)
    val dir = opts.getOrElse("data-dir",
      sys.error("--data-dir is required (a directory of parquet tables)"))
    val spark = SparkSession.builder()
      .master(opts.getOrElse("master", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        Runtime.getRuntime.availableProcessors().toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val allow = opts.get("fn-allowlist").map(_.split(",").toSeq.map(_.trim))
    val node = new GraftNode(spark, TableSource.tpch(spark, dir),
      sqlDir = Some(dir), fnAllowList = allow)
    val server = new HttpServer(node, opts.getOrElse("port", "0").toInt,
      readOnly = opts.get("read-only").exists(_ != "false")).start()
    println(s"graft node listening on http://127.0.0.1:${server.boundPort} (data: $dir)")
    sys.addShutdownHook { server.stop(); spark.stop() }
    // block like the reference's main: the server threads keep running
    Thread.currentThread().join()
  }

  /** `--key value` pairs; a `--flag` followed by another `--` token (or
    * nothing) is a bare boolean flag = "true". Anything that isn't a
    * `--`-led token where one is expected fails LOUDLY — the old strict
    * sliding-pairs parse silently dropped a dangling `--read-only`,
    * which reads as a security setting that didn't take effect. */
  private[graft] def parseArgs(args: Array[String]): Map[String, String] = {
    val out = scala.collection.mutable.Map[String, String]()
    var i = 0
    while (i < args.length) {
      val k = args(i)
      require(k.startsWith("--"), s"expected --option, got '$k'")
      if (i + 1 < args.length && !args(i + 1).startsWith("--")) {
        out(k.stripPrefix("--")) = args(i + 1); i += 2
      } else { out(k.stripPrefix("--")) = "true"; i += 1 }
    }
    out.toMap
  }
}
