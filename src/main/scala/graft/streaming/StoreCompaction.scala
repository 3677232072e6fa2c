package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Generic retention for the per-batchId DELTA stores every streaming
  * sink here maintains (fingerprint history, shard-manifest partials,
  * drift cells, …): fold the partitions `batch_id <= upto` — plus any
  * existing base — into ONE base partition at `batch_id=-1` using the
  * store's own merge algebra, so the store stops accreting a partition
  * per micro-batch while every read path (partition discovery +
  * `batch_id < currentBatch` filters; -1 always qualifies) is unchanged.
  * The merge MUST be the same associative fold serving already applies
  * (sum/XOR/min/max partials, distinct row union), which is exactly what
  * makes served results bit-identical across compactions.
  *
  * Crash-safe by a hidden-staging protocol (single maintenance writer
  * assumed): (1) write the merged rows to a dot-prefixed staging dir —
  * invisible to parquet readers — then a `_folded_ids` manifest naming
  * exactly the partitions folded; (2) delete those partitions; (3)
  * rename staging to the base partition. A crash before the manifest
  * leaves the store untouched (incomplete staging is discarded on the
  * next call); a crash after it leaves the merged data complete in
  * staging, and the next call finishes (2)-(3) FROM THE MANIFEST —
  * deltas that landed after the crash are never touched. Cost is
  * O(folded state rows), never documents; run at maintenance cadence,
  * not per batch. Pass `upto <= lastCommittedBatch - 1` so the one
  * batch the checkpoint may still replay keeps its own partition.
  */
object StoreCompaction {

  val BasePartition = -1L
  private val StagingName = ".compact_tmp"

  private[streaming] def partitionIds(dir: java.io.File): Seq[Long] =
    Option(dir.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
      .map(_.getName.stripPrefix("batch_id=").toLong)

  private[streaming] def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).toSeq.flatten.foreach(deleteRecursively)
    f.delete(); ()
  }

  /** Fold `batch_id <= upto` partitions (and the base) through `merge`
    * into the base partition. `merge` sees the union of the folded
    * partitions' DATA columns (no batch_id) and must return the same
    * schema the sink writes.
    */
  def foldInto(spark: SparkSession, storeDir: String, upto: Long)(
      merge: DataFrame => DataFrame): Unit = {
    val root = new java.io.File(storeDir)
    val staging = new java.io.File(root, StagingName)
    val base = new java.io.File(root, s"batch_id=$BasePartition")
    val manifest = new java.io.File(staging, "_folded_ids")
    def finishFold(ids: Seq[Long]): Unit = {
      ids.foreach(id => deleteRecursively(new java.io.File(root, s"batch_id=$id")))
      require(staging.renameTo(base), s"rename $staging -> $base failed")
    }
    if (staging.exists()) {
      if (new java.io.File(staging, "_SUCCESS").exists() && manifest.exists())
        finishFold(java.nio.file.Files.readAllLines(manifest.toPath)
          .asScala.toSeq.filter(_.nonEmpty).map(_.toLong))
      else deleteRecursively(staging)
    }
    val ids = partitionIds(root).filter(id => id == BasePartition || id <= upto)
    if (ids.isEmpty || ids == Seq(BasePartition)) return
    merge(spark.read.parquet(ids.map(id => s"$storeDir/batch_id=$id"): _*))
      .write.mode("overwrite").parquet(staging.getPath)
    java.nio.file.Files.write(manifest.toPath,
      ids.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finishFold(ids)
  }
}
