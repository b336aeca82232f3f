package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    // Streaming state-store checkpoints default under java.io.tmpdir and,
    // on Spark 4.1, every checkpoint file write goes through
    // ChecksumCheckpointFileManager, which blocks in awaitResult on its
    // companion checksum write. On a contended disk that block is what
    // turned the round-13 driver's `sbt test` into a timeout (stuck
    // HDFSBackedStateStoreProvider commits). Tests need durability for
    // exactly the lifetime of one JVM: route checkpoints to tmpfs when
    // the box has it and drop the checksum companion files — both are
    // I/O-hygiene settings for the suite, not semantics.
    val shm = java.nio.file.Paths.get("/dev/shm")
    val checkpointRoot =
      if (java.nio.file.Files.isWritable(shm))
        java.nio.file.Files.createTempDirectory(shm, "graft-test-ckpt")
      else
        java.nio.file.Files.createTempDirectory("graft-test-ckpt")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      org.apache.commons.io.FileUtils.deleteQuietly(checkpointRoot.toFile)))
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.checkpointLocation", checkpointRoot.toString)
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
