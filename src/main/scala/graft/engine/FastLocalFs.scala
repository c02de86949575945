package graft.engine

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.PosixFilePermission

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Fork-free local filesystem for `file://` URIs.
  *
  * Hadoop's stock local FS has two pathologies that dominate DRIVER wall
  * time for metadata-heavy workloads when no native `libhadoop` is present
  * (the usual case in plain-JVM deployments):
  *
  *  1. Every `FileStatus.getPermission/getOwner/getGroup` access forks a
  *     shell (`RawLocalFileSystem.loadPermissionInfoByNonNativeIO` execs
  *     `ls -ld` per file). Spark's leaf-file listing converts every
  *     status to a `LocatedFileStatus`, whose copy constructor reads the
  *     permission — so listing a published table forks once PER FILE PER
  *     LISTING. Profiled on this engine's index-maintenance composites,
  *     those forks were ~1/3 of all driver samples (q204: 122 jobs, 15+
  *     listings of a 64-partition layout).
  *  2. The default `LocalFileSystem` is checksummed: every written file
  *     gets a `.crc` sibling — double the file population, double the
  *     creates and commit renames, and `setPermission` (also a fork)
  *     runs per create.
  *
  * This subclass keeps `RawLocalFileSystem`'s data paths (streams,
  * rename-based commits) and replaces ONLY the metadata operations with
  * `java.nio.file` calls, which cost a syscall instead of a `fork(2)`:
  *
  *  - `getFileStatus`/`listStatus` build eager `FileStatus` rows from one
  *    NIO attribute read — permissions included, nothing lazy, no shell;
  *  - `setPermission` maps to `Files.setPosixFilePermissions`.
  *
  * On a real cluster the warehouse sits on HDFS/S3 and this class is
  * inert by construction (it only binds to the `file` scheme, and only
  * when the session opts in via `spark.hadoop.fs.file.impl`). It changes
  * no bytes, no paths, no listing ORDER semantics (directory entries are
  * sorted for determinism, matching `File.list`'s use downstream) — only
  * how fast local metadata is served.
  */
class FastLocalFs extends RawLocalFileSystem {

  private def nioStatus(f: java.io.File): FileStatus = {
    val p = Paths.get(f.getPath)
    // follow links — the stock DeprecatedRawLocalFileStatus derives from
    // java.io.File, which follows symlinks; match it.
    // NIO throws nio.NoSuchFileException when the file vanishes between
    // an exists()/list() and this read — that is NOT a
    // java.io.FileNotFoundException, and Hadoop's FileSystem contract
    // (and Spark's InMemoryFileIndex, which tolerates concurrently-
    // vanishing files by catching FNFE) branches on FNFE; rethrow as
    // the contract type so concurrent churn (_temporary cleanup,
    // streaming checkpoints) degrades exactly as the stock FS does
    val attrs = try Files.readAttributes(p,
      classOf[java.nio.file.attribute.PosixFileAttributes])
    catch {
      case _: java.nio.file.NoSuchFileException =>
        throw new java.io.FileNotFoundException(
          s"File ${f.getPath} does not exist")
    }
    val perm = new FsPermission(fsPermBits(attrs.permissions()))
    new FileStatus(
      if (attrs.isDirectory) 0L else attrs.size(),
      attrs.isDirectory,
      1,
      getDefaultBlockSize,
      attrs.lastModifiedTime().toMillis,
      attrs.lastAccessTime().toMillis,
      perm,
      attrs.owner().getName,
      attrs.group().getName,
      new Path(f.toURI.toString).makeQualified(getUri, getWorkingDirectory))
  }

  private def fsPermBits(
      ps: java.util.Set[PosixFilePermission]): Short = {
    import PosixFilePermission._
    var bits = 0
    if (ps.contains(OWNER_READ)) bits |= 0x100
    if (ps.contains(OWNER_WRITE)) bits |= 0x80
    if (ps.contains(OWNER_EXECUTE)) bits |= 0x40
    if (ps.contains(GROUP_READ)) bits |= 0x20
    if (ps.contains(GROUP_WRITE)) bits |= 0x10
    if (ps.contains(GROUP_EXECUTE)) bits |= 0x8
    if (ps.contains(OTHERS_READ)) bits |= 0x4
    if (ps.contains(OTHERS_WRITE)) bits |= 0x2
    if (ps.contains(OTHERS_EXECUTE)) bits |= 0x1
    bits.toShort
  }

  override def getFileStatus(p: Path): FileStatus = {
    val f = pathToFile(p)
    if (!f.exists())
      throw new java.io.FileNotFoundException(
        s"File $p does not exist")
    nioStatus(f)
  }

  override def listStatus(p: Path): Array[FileStatus] = {
    val f = pathToFile(p)
    if (!f.exists())
      throw new java.io.FileNotFoundException(
        s"File $p does not exist")
    if (f.isFile) Array(nioStatus(f))
    else {
      val names = f.list()
      if (names == null)
        throw new java.io.IOException(s"Error accessing $p")
      java.util.Arrays.sort(names.asInstanceOf[Array[Object]])
      // an entry deleted between list() and its attribute read simply
      // drops from the listing — the stock lazy-permission status never
      // touched the file until an attribute was read, so a vanished
      // entry must not fail the whole listing
      names.flatMap { n =>
        try Some(nioStatus(new java.io.File(f, n)))
        catch { case _: java.io.FileNotFoundException => None }
      }
    }
  }

  override def setPermission(p: Path, permission: FsPermission): Unit = {
    val perms = new java.util.HashSet[PosixFilePermission]()
    val m = permission.toShort
    import PosixFilePermission._
    if ((m & 0x100) != 0) perms.add(OWNER_READ)
    if ((m & 0x80) != 0) perms.add(OWNER_WRITE)
    if ((m & 0x40) != 0) perms.add(OWNER_EXECUTE)
    if ((m & 0x20) != 0) perms.add(GROUP_READ)
    if ((m & 0x10) != 0) perms.add(GROUP_WRITE)
    if ((m & 0x8) != 0) perms.add(GROUP_EXECUTE)
    if ((m & 0x4) != 0) perms.add(OTHERS_READ)
    if ((m & 0x2) != 0) perms.add(OTHERS_WRITE)
    if ((m & 0x1) != 0) perms.add(OTHERS_EXECUTE)
    Files.setPosixFilePermissions(Paths.get(pathToFile(p).getPath), perms)
    ()
  }
}
