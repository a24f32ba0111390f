package graft.streaming

import java.io.{FileNotFoundException, OutputStream}
import java.nio.file.{Files, Paths, StandardCopyOption, Path => NioPath}
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FSDataInputStream, Path, PathFilter}
import org.apache.spark.sql.execution.streaming.checkpointing.{CheckpointFileManager, FileContextBasedCheckpointFileManager}
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager.CancellableFSDataOutputStream

/** [[CheckpointFileManager]] for `file:` checkpoint locations built on
  * java.nio instead of Hadoop's local-filesystem shims.
  *
  * Why it exists (measured, not assumed): on a JVM without the native
  * Hadoop library — every stock container image, including this one —
  * `RawLocalFileSystem.setPermission` falls back to
  * `Shell.execCommand("chmod", ...)`, i.e. it FORKS A PROCESS for every
  * file Hadoop creates on the local filesystem. Structured Streaming
  * creates checkpoint files constantly: one offset-WAL entry and one
  * commit-log entry per micro-batch, one state-store delta per stateful
  * operator per shard per batch, plus the file-sink manifest. Measured
  * here: `createAtomic` through the default FileContext-based manager
  * costs ~40 ms per 2 KB file ON TMPFS, with >95% of it in the chmod
  * fork; the same write through java.nio is ~0.04 ms. At 2 state shards
  * × 2 operators + 3 logs per micro-batch, every micro-batch pays
  * ~300-500 ms of pure process-spawn overhead — dwarfing the actual
  * state and data work of a small batch, and accounting for roughly half
  * the wall time of this library's 31 streaming correctness gates.
  *
  * Semantics match the stock manager: `createAtomic` writes a dot-temp
  * sibling and renames on close (`ATOMIC_MOVE`; without
  * overwrite-permission an existing target surfaces as Hadoop's
  * [[org.apache.hadoop.fs.FileAlreadyExistsException]], the signal
  * HDFSMetadataLog's concurrent-writer path catches), `cancel` deletes
  * the temp, `delete` is recursive-and-silent on absence, `list` on a
  * missing directory throws [[FileNotFoundException]]. No `.crc`
  * sidecars are written — Spark's checkpoint logs carry their own
  * integrity discipline (atomic rename + re-read validation), exactly as
  * on HDFS where the checksum layer lives below the FileSystem API.
  *
  * NON-`file:` schemes (hdfs/s3a/abfss/...) delegate wholesale to the
  * stock [[FileContextBasedCheckpointFileManager]]: a cluster deployment
  * checkpointing to durable storage keeps stock behavior even with this
  * class configured session-wide via
  * `spark.sql.streaming.checkpointFileManagerClass`.
  */
class LocalCheckpointFileManager(path: Path, conf: Configuration)
    extends CheckpointFileManager {

  private val delegate: Option[CheckpointFileManager] = {
    val scheme = path.toUri.getScheme
    if (scheme == null || scheme == "file") None
    else Some(new FileContextBasedCheckpointFileManager(path, conf))
  }

  private def nio(p: Path): NioPath = Paths.get(p.toUri.getPath)

  private def qualify(p: Path): Path =
    if (p.toUri.getScheme != null) p else new Path("file://" + p.toUri.getPath)

  override def isLocal: Boolean = delegate.forall(_.isLocal)

  override def createCheckpointDirectory(): Path = delegate match {
    case Some(d) => d.createCheckpointDirectory()
    case None =>
      Files.createDirectories(nio(path))
      qualify(path)
  }

  override def mkdirs(p: Path): Unit = delegate match {
    case Some(d) => d.mkdirs(p)
    case None => Files.createDirectories(nio(p))
  }

  override def exists(p: Path): Boolean = delegate match {
    case Some(d) => d.exists(p)
    case None => Files.exists(nio(p))
  }

  override def delete(p: Path): Unit = delegate match {
    case Some(d) => d.delete(p)
    case None =>
      val root = nio(p)
      if (Files.exists(root)) {
        import scala.jdk.CollectionConverters._
        val walk = Files.walk(root)
        // children before parents; a file vanishing mid-walk (concurrent
        // maintenance) degrades to the same silent no-op as the stock
        // manager's fc.delete
        try walk.sorted(java.util.Comparator.reverseOrder[NioPath]())
          .iterator().asScala.foreach(f =>
            try Files.deleteIfExists(f)
            catch { case _: java.nio.file.NoSuchFileException => () })
        finally walk.close()
      }
  }

  override def open(p: Path): FSDataInputStream = delegate match {
    case Some(d) => d.open(p)
    case None =>
      val target = nio(p)
      if (!Files.exists(target)) throw new FileNotFoundException(p.toString)
      new FSDataInputStream(new NioSeekableInputStream(target))
  }

  override def list(p: Path, filter: PathFilter): Array[FileStatus] =
    delegate match {
      case Some(d) => d.list(p, filter)
      case None =>
        val dir = nio(p)
        if (!Files.exists(dir)) throw new FileNotFoundException(p.toString)
        if (!Files.isDirectory(dir)) {
          return status(dir) match {
            case Some(st) if filter.accept(st.getPath) => Array(st)
            case _ => Array.empty
          }
        }
        val stream = Files.list(dir)
        try {
          import scala.jdk.CollectionConverters._
          stream.iterator().asScala
            .flatMap(status)
            .filter(st => filter.accept(st.getPath))
            .toArray
        } finally stream.close()
    }

  /** None when the entry vanished between Files.list and the attribute
    * reads (state-store maintenance deletes old delta/snapshot files
    * concurrently with log listings) — the stock java.io.File path
    * reports length/mtime 0 instead of throwing, so a listing must
    * never fail on a concurrently-deleted entry. */
  private def status(f: NioPath): Option[FileStatus] =
    try {
      val isDir = Files.isDirectory(f)
      val len = if (isDir) 0L else Files.size(f)
      Some(new FileStatus(len, isDir, 1, 32L * 1024 * 1024,
        Files.getLastModifiedTime(f).toMillis,
        qualify(new Path(f.toUri.getPath))))
    } catch {
      case _: java.nio.file.NoSuchFileException => None
      case _: FileNotFoundException => None
    }

  override def createAtomic(p: Path,
                            overwriteIfPossible: Boolean): CancellableFSDataOutputStream =
    delegate match {
      case Some(d) => d.createAtomic(p, overwriteIfPossible)
      case None =>
        val target = nio(p)
        Option(target.getParent).foreach(Files.createDirectories(_))
        val tmp = target.resolveSibling(
          "." + target.getFileName + "." + java.util.UUID.randomUUID() + ".tmp")
        val out = Files.newOutputStream(tmp)
        new RenameOnCloseStream(tmp, target, overwriteIfPossible, out)
    }

  /** Dot-temp + atomic rename, the RenameBasedFSDataOutputStream contract:
    * close() renames exactly once (idempotent), cancel() deletes the temp,
    * close-after-cancel and double-close are no-ops. */
  private class RenameOnCloseStream(tmp: NioPath, target: NioPath,
                                    overwrite: Boolean, out: OutputStream)
      extends CancellableFSDataOutputStream(out) {
    private val terminated = new AtomicBoolean(false)

    override def close(): Unit = if (terminated.compareAndSet(false, true)) {
      super.close()
      if (overwrite)
        Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
      else {
        try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
        catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            Files.deleteIfExists(tmp)
            // the typed signal HDFSMetadataLog's lost-the-race path catches
            throw new org.apache.hadoop.fs.FileAlreadyExistsException(
              s"rename destination $target already exists")
        }
      }
    }

    override def cancel(): Unit = if (terminated.compareAndSet(false, true)) {
      try super.close() catch { case scala.util.control.NonFatal(_) => () }
      try Files.deleteIfExists(tmp)
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }
}

/** Seekable positioned reader over a [[java.nio.channels.FileChannel]] —
  * the read half of the fork-free local checkpoint path (state store
  * snapshot/delta loads, offset/commit log replays on restart). */
private[streaming] class NioSeekableInputStream(file: NioPath)
    extends java.io.InputStream
    with org.apache.hadoop.fs.Seekable
    with org.apache.hadoop.fs.PositionedReadable {

  private val ch = java.nio.channels.FileChannel.open(
    file, java.nio.file.StandardOpenOption.READ)

  override def read(): Int = {
    val b = java.nio.ByteBuffer.allocate(1)
    if (ch.read(b) <= 0) -1 else b.get(0) & 0xff
  }

  override def read(dst: Array[Byte], off: Int, len: Int): Int =
    ch.read(java.nio.ByteBuffer.wrap(dst, off, len))

  override def read(position: Long, buffer: Array[Byte], offset: Int,
                    length: Int): Int =
    ch.read(java.nio.ByteBuffer.wrap(buffer, offset, length), position)

  override def readFully(position: Long, buffer: Array[Byte], offset: Int,
                         length: Int): Unit = {
    var done = 0
    while (done < length) {
      val n = read(position + done, buffer, offset + done, length - done)
      if (n < 0) throw new java.io.EOFException(
        s"EOF at ${position + done} reading $file")
      done += n
    }
  }

  override def readFully(position: Long, buffer: Array[Byte]): Unit =
    readFully(position, buffer, 0, buffer.length)

  override def seek(pos: Long): Unit = ch.position(pos)
  override def getPos: Long = ch.position()
  override def seekToNewSource(targetPos: Long): Boolean = false
  override def available(): Int =
    math.min(math.max(0L, ch.size() - ch.position()), Int.MaxValue.toLong).toInt
  override def close(): Unit = ch.close()
}
