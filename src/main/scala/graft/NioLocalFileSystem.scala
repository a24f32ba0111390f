package graft

import java.nio.file.attribute.PosixFilePermission
import java.nio.file.attribute.PosixFilePermission._

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local `file:` Hadoop FileSystem whose permission operations use
  * java.nio instead of Hadoop's shell fallback.
  *
  * Why (same root cause as [[graft.streaming.LocalCheckpointFileManager]],
  * measured there): without the native Hadoop library,
  * `RawLocalFileSystem.setPermission` execs `/bin/chmod` — and Hadoop
  * calls setPermission on EVERY local file create (the
  * `LocalFSFileOutputStream` constructor applies the default
  * FsPermission), so every parquet part file, every task-temp file, and
  * every staged export a gate writes pays a ~10-40 ms process fork.
  * `Files.setPosixFilePermissions` applies the identical mode bits in
  * ~microseconds. Modes outside plain rwxrwxrwx (sticky/setuid/setgid)
  * fall back to the stock path — fidelity over speed for the exotic
  * cases, which never occur on scratch files.
  *
  * Configured via `spark.hadoop.fs.file.impl` in the session builders;
  * a cluster deployment reading/writing HDFS/S3 is untouched (this binds
  * the `file` scheme only, where it is semantically identical to the
  * stock LocalFileSystem).
  */
class NioLocalFileSystem extends LocalFileSystem(new NioRawLocalFileSystem)

class NioRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    val posix = NioLocalFileSystem.toPosix(permission)
    if (posix == null) super.setPermission(p, permission)
    else {
      try java.nio.file.Files.setPosixFilePermissions(pathToFile(p).toPath, posix)
      catch {
        // non-POSIX store (or an FS refusing the call): stock behavior
        case _: UnsupportedOperationException => super.setPermission(p, permission)
      }
    }
  }
}

object NioLocalFileSystem {
  /** FsPermission → NIO permission set; null when the mode carries bits
    * NIO cannot express (sticky/setuid/setgid) so the caller falls back. */
  private[graft] def toPosix(p: FsPermission): java.util.Set[PosixFilePermission] = {
    val mode = p.toShort.toInt
    if ((mode & ~0x1ff) != 0) return null
    val out = java.util.EnumSet.noneOf(classOf[PosixFilePermission])
    if ((mode & 0x100) != 0) out.add(OWNER_READ)
    if ((mode & 0x080) != 0) out.add(OWNER_WRITE)
    if ((mode & 0x040) != 0) out.add(OWNER_EXECUTE)
    if ((mode & 0x020) != 0) out.add(GROUP_READ)
    if ((mode & 0x010) != 0) out.add(GROUP_WRITE)
    if ((mode & 0x008) != 0) out.add(GROUP_EXECUTE)
    if ((mode & 0x004) != 0) out.add(OTHERS_READ)
    if ((mode & 0x002) != 0) out.add(OTHERS_WRITE)
    if ((mode & 0x001) != 0) out.add(OTHERS_EXECUTE)
    out
  }
}
