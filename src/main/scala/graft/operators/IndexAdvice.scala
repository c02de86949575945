package graft.operators

import org.apache.hadoop.fs.Path
import graft.engine.Warehouse

/** The maintenance DECISION for a persistent index ([[TextIndex]],
  * [[IvfIndex]]) — what an evidence-driven policy recommends doing now.
  *
  * Both indexes have had the maintenance MECHANICS (tombstoning
  * `delete`/`reindex`, tombstone-GC `compact`, retraining rebuilds) since
  * round 8; this type closes the POLICY level: `maintenanceAdvice` reads
  * STORED evidence only (tombstone mass from the `_deletes` companion vs
  * live doclen/entry counts, cell-occupancy skew vs `_centroids`, the
  * byte mass of `_deletes` itself) and returns one of these three, so a
  * nightly job can run `maintain()` on every index and pay a rewrite
  * only when the evidence says the index needs one.
  */
sealed trait IndexAdvice

object IndexAdvice {

  /** Evidence within thresholds — do nothing. */
  case object Healthy extends IndexAdvice

  /** Enough tombstoned mass (or tombstone-file bloat) to be worth the
    * index-sized rewrite: run `compact()`. Executable by `maintain()` —
    * compaction needs nothing but the index itself. */
  case object Compact extends IndexAdvice

  /** Structural drift a compaction cannot fix (cell occupancy skewed
    * far past the trained layout): re-train/re-bucket. `maintain()`
    * SURFACES this by default and EXECUTES it with
    * `executeRebuild = true` — `TextIndex.rebuild` re-buckets the live
    * postings at a granularity chosen from the stored occupancy
    * evidence, `IvfIndex.rebuild` re-trains the plain-vector layout
    * from its own live entries at observed mass. Only a coded (PQ)
    * layout still needs the caller (its codes cannot re-train a
    * quantizer — re-run `buildPq` over the corpus). */
  case object Rebuild extends IndexAdvice

  /** One metadata-only pass over an index's resolved version directory:
    * file count and bytes, split into data files (postings / coded
    * entries), the `_deletes` tombstone companion, and everything else
    * (doclen, centroids, codebooks, manifests). The stored health row
    * (`_health`, excluded here so writing it never moves its own census)
    * is stamped with (nFiles, totalBytes, maxMtime) and withdrawn the
    * moment any file changes — the same freshness discipline as the
    * sketch-stats catalog, so advice can never be served from
    * pre-maintenance evidence. `maxMtime` (the newest file's
    * modification time) closes the byte-alias hole a two-field stamp
    * left open: a foreign rewrite that lands the identical file count
    * AND byte total still moves the stamp. Listing is proportional to
    * file COUNT, never data size: "index health without scanning" at
    * 100 TB.
    */
  final case class Census(nFiles: Long, totalBytes: Long, dataBytes: Long,
                          deletesBytes: Long, maxMtime: Long) {
    /** The freshness stamp — what caches and sidecars compare. */
    def stamp: (Long, Long, Long) = (nFiles, totalBytes, maxMtime)
  }

  /** Explicit shuffle-partition count for writer-side clustering — a
    * bare `repartition(col)` invites AQE to coalesce a byte-small
    * exchange to ONE partition, serializing the write at scale. Shared
    * by both index families' build/append/compact writers. */
  private[operators] def shufflePartitions(wh: Warehouse): Int =
    wh.spark.conf.get("spark.sql.shuffle.partitions").toInt

  /** Partition count for a metadata-scale companion write (tombstones,
    * per-batch doclen rows): ONE file while the set is small — these
    * dirs are listed by every search/probe, so a file per shuffle
    * partition per maintenance call is the failure mode — and multiple
    * bounded writers past that, so no single task ever carries a write
    * that grows with the corpus (AQE's coalescing can't be used here:
    * with parallelismFirst it keeps ~default-parallelism partitions
    * even for kilobyte sets). 500k rows/writer ≈ 10-15 MB parquet. */
  private[operators] def companionShards(n: Long): Int =
    if (n <= 50000L) 1 else math.max(2L, n / 500000L + 1L).toInt

  /** Write a metadata-scale sidecar (health evidence, layout markers)
    * as ONE driver-written file — no Spark job, no commit protocol, no
    * task scheduling. The maintenance composites are fixed-overhead
    * bound (q204: 122 jobs for milliseconds of real work), and every
    * health fold previously paid TWO coalesce(1) parquet write jobs;
    * a bounded ≤nlist-row evidence table does not need an executor.
    * Crash discipline: write `<path>.tmp`, then rename over the target
    * (delete-first when present) — a crash between the steps leaves the
    * old file or none, both of which read as stale/absent and trigger
    * the bounded re-measure, never wrong evidence. */
  private[operators] def writeSidecar(wh: Warehouse, path: String,
                                      body: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(wh.spark.sessionState.newHadoopConf())
    val tmp = new Path(path + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, true)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"sidecar rename failed: $tmp -> $p")
  }

  /** Read a sidecar written by [[writeSidecar]]; None when absent. */
  private[operators] def readSidecar(wh: Warehouse,
                                     path: String): Option[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(wh.spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val st = fs.getFileStatus(p)
      if (st.isDirectory) None
      else {
        val buf = new Array[Byte](st.getLen.toInt)
        val in = fs.open(p)
        try in.readFully(0L, buf) finally in.close()
        Some(new String(buf, java.nio.charset.StandardCharsets.UTF_8))
      }
    }
  }

  private[operators] def census(wh: Warehouse, name: String): Census = {
    val base = new Path(wh.dataPath(name))
    val fs = base.getFileSystem(wh.spark.sessionState.newHadoopConf())
    val it = fs.listFiles(base, true)
    var n = 0L; var total = 0L; var data = 0L; var dels = 0L
    var mtime = 0L
    val prefix = base.toUri.getPath
    while (it.hasNext) {
      val s = it.next()
      val rel = s.getPath.toUri.getPath.stripPrefix(prefix)
      if (!rel.startsWith("/_health")) {
        n += 1; total += s.getLen
        if (s.getModificationTime > mtime) mtime = s.getModificationTime
        if (rel.startsWith("/_deletes")) dels += s.getLen
        // a data file lives under no underscore-prefixed dir and is not
        // itself underscore-named (_SUCCESS)
        else if (!rel.split('/').exists(_.startsWith("_"))) data += s.getLen
      }
    }
    Census(n, total, data, dels, mtime)
  }
}
