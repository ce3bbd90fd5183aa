package graft.bitemp

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  * Scale: a snapshot is one parquet write of the versions table — columnar,
  * partition-parallel, no driver materialization; restore is a plain scan.
  */
object Checkpoint {

  final case class Meta(txId: Long, millis: Long, path: String)

  private val Dir = "checkpoint-(-?\\d+)-(\\d+)".r

  /** Write a completed checkpoint of `state` at `txId`; prune to the
    * `keep` newest completed checkpoints (checkpoint.clj retention,
    * `::cp/keep-count`). Returns the new checkpoint's metadata. */
  def save(state: DataFrame, storeDir: String, txId: Long, keep: Int = 2): Meta = {
    val millis = System.currentTimeMillis()
    val path = s"$storeDir/checkpoint-$txId-$millis"
    state.write.mode("overwrite").parquet(path)
    java.nio.file.Files.createFile(java.nio.file.Paths.get(path, "_COMPLETE"))
    val all = completed(storeDir).sortBy(m => (m.txId, m.millis))
    all.dropRight(keep).foreach(m => deleteRec(new java.io.File(m.path)))
    Meta(txId, millis, path)
  }

  /** All completed checkpoints (unmarked dirs are in-flight or torn). */
  def completed(storeDir: String): Seq[Meta] = {
    val root = new java.io.File(storeDir)
    if (!root.isDirectory) return Nil
    root.listFiles().toSeq.flatMap { f =>
      f.getName match {
        case Dir(tx, ms) if new java.io.File(f, "_COMPLETE").isFile =>
          Some(Meta(tx.toLong, ms.toLong, f.getPath))
        case _ => None
      }
    }
  }

  def latest(storeDir: String): Option[Meta] =
    completed(storeDir).sortBy(m => (m.txId, m.millis)).lastOption

  /** Load the latest completed snapshot, if any. */
  def restore(spark: SparkSession, storeDir: String): Option[DataFrame] =
    latest(storeDir).map(m => spark.read.schema(TxLog.versionSchema).parquet(m.path))

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    f.delete(); ()
  }
}
