package graft.engine

import org.apache.spark.sql.SparkSession

/** Session defaults shared by every local entry point (Bench/Verify/
  * Smoke/tools/tests). One place, so a driver-contract main and the
  * evidence tools measure the same I/O stack.
  *
  * `fs.file.impl` → [[FastLocalFs]]: serves local-FS metadata through
  * `java.nio` instead of Hadoop's fork-per-permission-read shell path and
  * drops the `.crc` sibling files of the checksummed default — a
  * local-deployment I/O fix (profiled: ~1/3 of driver samples on the
  * index-maintenance composites were `ls` forks under file listings). On
  * a cluster the warehouse scheme is hdfs/s3 and this binding is inert.
  * Opt out per session with `SPARK_GRAFT_STOCK_LOCAL_FS=1` (A/B lever —
  * keeps the bench comparable across the flag). */
object SessionDefaults {
  def withLocalIo(b: SparkSession.Builder): SparkSession.Builder =
    if (sys.env.contains("SPARK_GRAFT_STOCK_LOCAL_FS")) b
    else b.config("spark.hadoop.fs.file.impl",
      classOf[FastLocalFs].getName)
}
