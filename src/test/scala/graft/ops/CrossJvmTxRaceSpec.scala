package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** Cross-PROCESS TxTable contention, for real (the r13 verdict's item 4):
  * [[CrashSafeSwapSpec]] races commits in one JVM and injects a FAKE
  * foreign claim; this spec spawns an actual second JVM (same classpath,
  * its own SparkSession and FileSystem handle) and drives the parent's
  * commit into its read-version→claim window while the child commits the
  * same version number first — via the [[TxTable.interleave]] hook, so
  * the loss is deterministic, not a timing lottery.
  *
  * Pins: exactly one winner per version number, the loser DETECTS the
  * race (ConcurrentModificationException, never a silent clobber), the
  * loser's RETRY lands as the next version, no manifest is corrupted
  * (each version's file set parses and serves), and both final snapshots
  * read back row-correct. */
class CrossJvmTxRaceSpec extends SparkSpec {

  private def await(cond: => Boolean, what: String,
                    timeoutMs: Long = 90000L): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond) {
      assert(System.currentTimeMillis() < deadline, s"timed out waiting: $what")
      Thread.sleep(25)
    }
  }

  test("cross-JVM commit race: one winner, one detected-and-retried loser, no corruption") {
    val root = Files.createTempDirectory("graft_xjvm_tx").toString
    def mark(name: String): Unit =
      Files.write(Paths.get(root, name), Array.emptyByteArray)
    def marked(name: String): Boolean = Files.exists(Paths.get(root, name))

    // a real one-partition table so every committed snapshot can SERVE
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .coalesce(1).write.parquet(s"$root/seed")
    TxTable.bootstrapIfNeeded(spark, root)
    val v0 = TxTable.currentVersion(spark, root)

    // second JVM: same classpath, same JDK17 module opens the Spark
    // session needs outside spark-submit
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = (Seq(
      Paths.get(System.getProperty("java.home"), "bin", "java").toString)
      ++ addOpens ++ Seq(
      "-Xmx1g", "-cp", System.getProperty("java.class.path"),
      "graft.ops.TxContender", root)).toIndexedSeq
    val proc = new ProcessBuilder(cmd: _*)
      .redirectOutput(new java.io.File(s"$root/contender.out"))
      .redirectErrorStream(true)
      .start()
    try {
      await(marked("_contender_ready"), "contender session up")

      // the parent's commit loses deterministically: between its version
      // read and its claim, the CHILD commits that version first
      TxTable.interleave = () => {
        mark("_go_1")
        await(marked("_done_1"), "contender commit 1")
        TxTable.interleave = () => () // the retry must run clean
      }
      val detected =
        try { TxTable.commit(spark, root, TxTable.listDataFiles(spark, root)); false }
        catch { case _: java.util.ConcurrentModificationException => true }
        finally TxTable.interleave = () => ()
      assert(detected,
        "the losing writer must detect the foreign commit, not clobber it")
      val childV = new String(Files.readAllBytes(
        Paths.get(root, "_done_1")), "UTF-8").trim.toLong
      assert(childV == v0 + 1, s"child must have won v${v0 + 1}, got $childV")

      // the loser retries and lands as the NEXT version
      val retryV = TxTable.commit(spark, root,
        TxTable.listDataFiles(spark, root))
      assert(retryV == v0 + 2, s"retry must land v${v0 + 2}, got $retryV")

      // no corruption: every version's manifest parses, and both the
      // child's snapshot and the retried latest serve the seed rows
      (1L to retryV).foreach { v =>
        val files = TxTable.filesOfVersion(spark, root, v)
        assert(files.nonEmpty && files.forall(_.endsWith(".parquet")),
          s"manifest v$v is corrupt: $files")
      }
      assert(TxTable.readVersion(spark, root, childV).count() == 2L)
      assert(TxTable.read(spark, root).count() == 2L)
    } finally {
      mark("_stop")
      if (!proc.waitFor(30, java.util.concurrent.TimeUnit.SECONDS))
        proc.destroyForcibly()
      TxTable.interleave = () => ()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
    assert(proc.exitValue() == 0, "contender JVM must exit cleanly")
  }
}
