package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the housekeeping operator every long-lived
  * 100 TB lake needs: streaming ingestion and per-model full refreshes
  * leave thousands of KB-sized parquet files whose open/footer overhead
  * dominates scan time and whose count explodes driver-side listings.
  *
  * `compact` rewrites a parquet dataset into ~`targetBytes` output
  * files: input size comes from the filesystem listing (cheap, exact),
  * the output file count is `ceil(bytes / target)`, and the rewrite is
  * either a shuffle-free coalesce (when only merging), a hash
  * `repartition` (even sizes, no ordering), or a `repartitionByRange` +
  * in-partition sort when `sortBy` is given — the poor-man's Z-order:
  * range-partitioned, sorted files give parquet row-group min/max
  * statistics that let later scans skip whole files/row-groups on the
  * sort key.
  */
object Compaction {
  /** @param sortBy  cluster-by columns; empty = size-only compaction
    * @param targetBytes desired output file size (pre-compression input
    *                    bytes as the proxy; parquet re-compresses)
    * @return number of output files written */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long = 512L << 20, sortBy: Seq[String] = Nil): Int = {
    require(targetBytes > 0)
    val conf = spark.sparkContext.hadoopConfiguration
    val in = new org.apache.hadoop.fs.Path(inPath)
    val fs = in.getFileSystem(conf)
    val bytes = fs.getContentSummary(in).getLength
    val files = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(inPath)
    val shaped =
      if (sortBy.nonEmpty)
        df.repartitionByRange(files, sortBy.map(col): _*)
          .sortWithinPartitions(sortBy.map(col): _*)
      else df.coalesce(files) // merge-only: no shuffle
    shaped.write.mode("overwrite").parquet(outPath)
    files
  }
}
