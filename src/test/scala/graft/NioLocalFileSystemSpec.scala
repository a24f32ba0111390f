package graft

import java.net.URI

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.hadoop.fs.permission.FsPermission

/** Pins the fork-free local-FS binding: the session's Hadoop conf must
  * resolve `file:` to [[NioLocalFileSystem]] (otherwise every local file
  * create silently regresses to a ~10-40 ms /bin/chmod fork), and the
  * NIO permission translation must be mode-exact with the stock shell
  * path, falling back for modes NIO can't express. */
class NioLocalFileSystemSpec extends SparkSpec {

  test("session hadoop conf binds file: to the NIO filesystem") {
    val conf = spark.sessionState.newHadoopConf()
    val fs = FileSystem.newInstance(URI.create("file:///"), conf)
    try assert(fs.isInstanceOf[NioLocalFileSystem],
      s"file: resolved to ${fs.getClass.getName}")
    finally fs.close()
  }

  test("setPermission applies exact mode bits via NIO") {
    val conf = spark.sessionState.newHadoopConf()
    val fs = FileSystem.newInstance(URI.create("file:///"), conf)
    try {
      val dir = java.nio.file.Files.createTempDirectory("niofs-spec")
      val p = new Path(dir.resolve("f1").toString)
      val out = fs.create(p, true)
      out.write("x".getBytes); out.close()
      for (mode <- Seq("640", "755", "600", "444")) {
        fs.setPermission(p, new FsPermission(Integer.parseInt(mode, 8).toShort))
        val got = java.nio.file.Files.getPosixFilePermissions(
          java.nio.file.Paths.get(p.toUri.getPath))
        val expect = NioLocalFileSystem.toPosix(
          new FsPermission(Integer.parseInt(mode, 8).toShort))
        assert(got == expect, s"mode $mode: $got vs $expect")
      }
      // cleanup
      fs.delete(new Path(dir.toString), true)
    } finally fs.close()
  }

  test("modes NIO cannot express fall back instead of corrupting") {
    // sticky bit (01644) is outside the rwx 9-bit space
    assert(NioLocalFileSystem.toPosix(new FsPermission(Integer.parseInt("1644", 8).toShort)) == null)
    assert(NioLocalFileSystem.toPosix(new FsPermission(Integer.parseInt("644", 8).toShort)) != null)
  }
}
