package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit pins for the [[TxTable]] protocol pieces CrashSafeSwapSpec's
  * end-to-end scenarios don't isolate: manifest-log trimming, hidden-name
  * filtering in the data-file walk, and the loud failure modes of
  * version resolution. */
class TxTableSpec extends SparkSpec {

  test("vacuum trims the manifest log to keepManifests, never the latest") {
    import spark.implicits._
    val out = ExportOps.scratchDir("graft_txunit", "spec")
    ExportOps.withScratchCleanup(out) {
      val root = s"$out/t"
      Seq((1L, "a")).toDF("k", "v").write.parquet(root)
      TxTable.bootstrapIfNeeded(spark, root)
      val live = TxTable.liveFiles(spark, root)
      (2 to 15).foreach { _ => TxTable.commit(spark, root, live) }
      assert(TxTable.currentVersion(spark, root) === 15L)
      TxTable.vacuum(spark, root, keepManifests = 3)
      val txFiles = new java.io.File(root, "_tx").listFiles()
        .map(_.getName).filter(_.startsWith("manifest-")).sorted.toSeq
      assert(txFiles === Seq("manifest-v13.txt", "manifest-v14.txt",
        "manifest-v15.txt"),
        s"log must keep exactly the last 3 manifests: $txFiles")
      // the latest still resolves; a trimmed version fails loudly
      assert(TxTable.read(spark, root).count() === 1L)
      val ex = intercept[IllegalArgumentException] {
        TxTable.readVersion(spark, root, 2L)
      }
      assert(ex.getMessage.contains("vacuumed or never committed"))
      ExportOps.deleteRecursively(out)
    }
  }

  test("listDataFiles skips hidden names at every level; vacuum leaves them alone") {
    import spark.implicits._
    val out = ExportOps.scratchDir("graft_txunit2", "spec")
    ExportOps.withScratchCleanup(out) {
      val root = s"$out/t"
      Seq((1L, 0), (2L, 1)).toDF("k", "p")
        .repartition(col("p")).write.partitionBy("p").parquet(root)
      TxTable.bootstrapIfNeeded(spark, root)
      // plant hidden debris a crashed writer could leave: a dot-staged
      // dir with a parquet inside, and an underscore marker file
      val hiddenDir = new java.io.File(root, ".stage_crashed/p=0")
      hiddenDir.mkdirs()
      java.nio.file.Files.write(
        new java.io.File(hiddenDir, "part-x.parquet").toPath,
        Array[Byte](1, 2, 3))
      java.nio.file.Files.write(
        new java.io.File(root, "_marker").toPath, Array[Byte](0))
      val listed = TxTable.listDataFiles(spark, root)
      assert(listed.forall(f => !f.contains(".stage_crashed")),
        s"hidden dirs must not be listed as data: $listed")
      assert(listed.toSet === TxTable.liveFiles(spark, root).toSet)
      TxTable.vacuum(spark, root)
      // vacuum reasons over VISIBLE files only — hidden debris is not its
      // jurisdiction (Spark never reads it either), and must survive
      assert(new java.io.File(hiddenDir, "part-x.parquet").exists())
      assert(new java.io.File(root, "_marker").exists())
      assert(TxTable.read(spark, root).count() === 2L)
      ExportOps.deleteRecursively(out)
    }
  }

  test("read/liveFiles on an unregistered table fail loudly, not empty") {
    import spark.implicits._
    val out = ExportOps.scratchDir("graft_txunit3", "spec")
    ExportOps.withScratchCleanup(out) {
      val root = s"$out/t"
      Seq((1L, "a")).toDF("k", "v").write.parquet(root)
      val ex = intercept[IllegalArgumentException] {
        TxTable.read(spark, root)
      }
      assert(ex.getMessage.contains("bootstrap first"))
      ExportOps.deleteRecursively(out)
    }
  }

  test("an empty-but-legal manifest serves an empty frame via the schema sidecar") {
    import spark.implicits._
    val out = ExportOps.scratchDir("graft_txunit4", "spec")
    ExportOps.withScratchCleanup(out) {
      val root = s"$out/t"
      // stageAndCommit records the schema sidecar; then a maintenance
      // step (e.g. a retention erasure expiring every partition) commits
      // ZERO files — the table must serve empty with the schema, not die
      // in parquet's "Unable to infer schema"
      TxTable.stageAndCommit(Seq((1L, "a")).toDF("k", "v"), root,
        append = false)
      TxTable.commit(spark, root, Nil)
      val served = TxTable.read(spark, root)
      assert(served.count() === 0L)
      assert(served.columns.toSeq === Seq("k", "v"))
      // the zero-file VERSION also time-travels as empty
      assert(TxTable.readVersion(spark, root,
        TxTable.currentVersion(spark, root)).count() === 0L)
      ExportOps.deleteRecursively(out)
    }
  }

  test("a zero-file manifest without a schema sidecar fails with the TxTable story") {
    import spark.implicits._
    val out = ExportOps.scratchDir("graft_txunit5", "spec")
    ExportOps.withScratchCleanup(out) {
      val root = s"$out/t"
      Seq((1L, "a")).toDF("k", "v").write.parquet(root)
      TxTable.bootstrapIfNeeded(spark, root) // no sidecar written this path
      TxTable.commit(spark, root, Nil)
      val ex = intercept[IllegalStateException] { TxTable.read(spark, root) }
      assert(ex.getMessage.contains("zero data files"),
        s"must explain the empty snapshot, got: ${ex.getMessage}")
      ExportOps.deleteRecursively(out)
    }
  }

  test("readVersion after vacuum reports the retention contract, not file-not-found") {
    import spark.implicits._
    val out = ExportOps.scratchDir("graft_txunit6", "spec")
    ExportOps.withScratchCleanup(out) {
      val root = s"$out/t"
      // v1 = one row; v2 = a full replacement (new files) — then vacuum
      // deletes v1's data but RETAINS its manifest as commit history
      TxTable.stageAndCommit(Seq((1L, "a")).toDF("k", "v"), root,
        append = false, vacuumNow = false)
      val vOld = TxTable.currentVersion(spark, root)
      TxTable.stageAndCommit(Seq((2L, "b")).toDF("k", "v"), root,
        append = false, vacuumNow = false)
      // both versions readable pre-vacuum (the e22 time-travel window)
      assert(TxTable.readVersion(spark, root, vOld).count() === 1L)
      TxTable.vacuum(spark, root)
      assert(TxTable.read(spark, root).as[(Long, String)].collect()
        .toSeq === Seq((2L, "b")))
      // the old manifest still resolves (history) but its read tells the
      // accurate vacuum story instead of parquet's missing-file error
      val ex = intercept[IllegalStateException] {
        TxTable.readVersion(spark, root, vOld)
      }
      assert(ex.getMessage.contains("deleted by vacuum"),
        s"got: ${ex.getMessage}")
      ExportOps.deleteRecursively(out)
    }
  }
}
