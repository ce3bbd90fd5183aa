package graft.bitemp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.{FileSystem, Path}

/** Checkpoint sink (SURVEY §2.1): periodic snapshots of the index state so
  * a new node starts from the latest snapshot instead of replaying the whole
  * transaction log — the semantics of `crux-core/src/crux/checkpoint.clj:1-177`
  * (store layout, completed-marker atomicity, retention of the N newest),
  * re-expressed as parquet snapshot directories.
  *
  * Layout: `<storeDir>/checkpoint-<txId>-<millis>/` holding the parquet
  * snapshot plus a `_COMPLETE` marker written only after the data lands
  * (readers ignore unmarked dirs, mirroring the reference's
  * upload-then-write-metadata ordering at checkpoint.clj:94-113).
  *
  * All filesystem access goes through the Hadoop `FileSystem` resolved from
  * the store path, so the store may live on HDFS/S3/local alike — the same
  * FS the parquet writes target.
  *
  * Scale: a snapshot is one parquet write of the versions table — columnar,
  * partition-parallel, no driver materialization; restore is a plain scan.
  */
object Checkpoint {

  final case class Meta(txId: Long, millis: Long, path: String)

  /** How long an unmarked checkpoint dir must be older than the current
    * save before torn-dir GC may delete it. Generous: covers a slow
    * concurrent snapshot write plus multi-node clock skew. Test-visible.
    * Volatile: test code and a saver thread may race on it. */
  @volatile private[graft] var TornDirGraceMillis: Long = 60L * 60 * 1000

  private val Dir = "checkpoint-(-?\\d+)-(\\d+)".r
  private val Marker = "_COMPLETE"

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  /** A snapshot is restorable only if its `_COMPLETE` manifest (file name
    * + length per data file, written after the parquet lands) still
    * matches the directory contents. The grace window narrows the
    * torn-dir GC race but cannot close it — a saver slower than the
    * window (or clock skew beyond it) can still have its in-flight dir
    * deleted, after which its own marker write would bless a gutted
    * snapshot; validating the manifest on READ detects that instead of
    * trusting it (r10 advice). An EMPTY marker (pre-r11 layout) is
    * trusted for backward compatibility. */
  private def isValid(f: FileSystem, dir: Path): Boolean = {
    val marker = new Path(dir, Marker)
    val mst = try f.getFileStatus(marker) catch {
      case _: java.io.FileNotFoundException => return false
    }
    if (mst.getLen == 0) return true // legacy empty marker
    // TOCTOU (r11 advice): a concurrent saver's prune can delete the dir
    // between the getFileStatus above and the reads below — a vanished
    // marker/dir means "not restorable", not an exception
    try {
      val manifest = {
        val in = f.open(marker)
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](4096)
          var r = in.read(chunk)
          while (r >= 0) { buf.write(chunk, 0, r); r = in.read(chunk) }
          new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
        } finally in.close()
      }
      val actual = f.listStatus(dir)
        .filter(s => s.isFile && s.getPath.getName != Marker)
        .map(s => s.getPath.getName -> s.getLen).toMap
      manifest.split("\n").filter(_.nonEmpty).forall { line =>
        // a malformed line (the marker write itself tore) means INVALID,
        // not an exception — one bad manifest must not brick the store
        val sep = line.lastIndexOf('\t')
        sep > 0 && scala.util.Try(line.substring(sep + 1).toLong).toOption
          .exists(len => actual.get(line.substring(0, sep)).contains(len))
      }
    } catch {
      case _: java.io.FileNotFoundException => false
    }
  }

  /** Write a completed checkpoint of `state` at `txId`; prune to the
    * `keep` newest completed checkpoints (checkpoint.clj retention,
    * `::cp/keep-count`). Returns the new checkpoint's metadata. */
  def save(state: DataFrame, storeDir: String, txId: Long, keep: Int = 2): Meta = {
    require(keep >= 1,
      s"keep must be >= 1 (got $keep) - keep = 0 would delete the checkpoint just written")
    val spark = state.sparkSession
    val millis = System.currentTimeMillis()
    val path = s"$storeDir/checkpoint-$txId-$millis"
    state.write.mode("overwrite").parquet(path)
    val f = fs(spark, storeDir)
    // the marker IS the manifest (see isValid): written only after the
    // data lands, mirroring the reference's upload-then-write-metadata
    // ordering (checkpoint.clj:94-113)
    val manifest = f.listStatus(new Path(path))
      .filter(st => st.isFile && st.getPath.getName != Marker)
      .sortBy(_.getPath.getName)
      .map(st => s"${st.getPath.getName}\t${st.getLen}")
      .mkString("\n")
    val os = f.create(new Path(path, Marker), true)
    try os.write(manifest.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally os.close()
    val all = completed(spark, storeDir).sortBy(m => (m.txId, m.millis))
    all.dropRight(keep).foreach(m => f.delete(new Path(m.path), true))
    // torn dirs (data landed but the marker write failed — the reference's
    // cleanup-checkpoint concern, checkpoint.clj:94-113) would otherwise
    // accumulate forever. Only collect invalid dirs a generous grace
    // window older than this save: a concurrent saver that stamped its
    // millis just before ours may still be writing parquet (multi-node
    // shared stores; clock skew widens the window) — deleting its
    // in-flight dir would bless-then-gut its snapshot (restore would
    // still reject it via the manifest, but the work is wasted). Torn
    // and gutted-but-marked dirs linger at most one grace window.
    f.listStatus(new Path(storeDir)).foreach { st =>
      st.getPath.getName match {
        case Dir(_, ms) if ms.toLong < millis - TornDirGraceMillis &&
            !isValid(f, st.getPath) =>
          f.delete(st.getPath, true); ()
        case _ => ()
      }
    }
    Meta(txId, millis, path)
  }

  /** All completed checkpoints (unmarked or manifest-invalid dirs are
    * in-flight, torn, or gutted — never restorable). */
  def completed(spark: SparkSession, storeDir: String): Seq[Meta] = {
    val f = fs(spark, storeDir)
    val root = new Path(storeDir)
    if (!f.exists(root)) return Nil
    f.listStatus(root).toSeq.flatMap { st =>
      st.getPath.getName match {
        case Dir(tx, ms) if isValid(f, st.getPath) =>
          Some(Meta(tx.toLong, ms.toLong, st.getPath.toString))
        case _ => None
      }
    }
  }

  def latest(spark: SparkSession, storeDir: String): Option[Meta] =
    completed(spark, storeDir).sortBy(m => (m.txId, m.millis)).lastOption

  /** Load the latest completed snapshot, if any. Schema comes from the
    * snapshot itself — a versions table may carry inline payload columns
    * beyond [[TxLog.versionSchema]], and pinning the schema here would
    * silently drop them on the recovery path. */
  def restore(spark: SparkSession, storeDir: String): Option[DataFrame] =
    latest(spark, storeDir).map(m => spark.read.parquet(m.path))
}
