package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the round-10 durability contracts on the stored-index
  * machinery: the single-writer append lock and swapRewrite's
  * crash-recovery restore order. */
class StoredIndexDurabilitySpec extends SparkSpec {
  import spark.implicits._

  private def fs(path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("a held append lock makes a second appender fail loudly, not race") {
    val dir = tmpDir("lock_idx")
    // a standing lock, as if another writer is mid-append
    val lock = new org.apache.hadoop.fs.Path(dir, "_append_lock")
    fs(dir).create(lock, false).close()
    val e = intercept[IllegalStateException] {
      StoredIndex.withAppendLock(spark, dir) { fail("body must not run") }
    }
    e.getMessage should include("_append_lock")
    // the failed acquire must NOT have removed the holder's lock
    fs(dir).exists(lock) shouldBe true
    fs(dir).delete(lock, false)
    // with the lock gone the same call proceeds and releases on exit
    StoredIndex.withAppendLock(spark, dir) { 42 } shouldBe 42
    fs(dir).exists(lock) shouldBe false
  }

  test("append lock is released when the body throws") {
    val dir = tmpDir("lock_idx_throw")
    val lock = new org.apache.hadoop.fs.Path(dir, "_append_lock")
    intercept[RuntimeException] {
      StoredIndex.withAppendLock(spark, dir) { sys.error("boom") }
    }
    fs(dir).exists(lock) shouldBe false
  }

  test("swapRewrite retry restores a live dir lost between the two renames") {
    val dir = tmpDir("swap_crash") + "/idx"
    def write(path: String, tag: String): Unit =
      Seq((1L, tag)).toDF("id", "v").write.mode("overwrite").parquet(path)
    def readTag(path: String): String =
      spark.read.parquet(path).select("v").head.getString(0)

    // simulate the mid-gap crash state of a prior swap: live name
    // MISSING, complete _tmp (the new data) and _old (rollback) present
    write(dir + "_tmp", "new")
    write(dir + "_old", "old")
    // the retry must FIRST restore the live name from _tmp — the
    // pre-fix clear-leftovers-first order deleted both copies and then
    // crashed reading the missing live dir
    StoredIndex.swapRewrite(spark, dir) { tmp =>
      // a real caller reads the live dir here; assert the recovery
      // already happened and the newer copy won
      readTag(dir) shouldBe "new"
      write(tmp, "newer")
    }
    readTag(dir) shouldBe "newer"
    fs(dir).exists(new org.apache.hadoop.fs.Path(dir + "_tmp")) shouldBe false
    fs(dir).exists(new org.apache.hadoop.fs.Path(dir + "_old")) shouldBe false
  }

  test("swapRewrite retry restores from _old when no _tmp survived") {
    val dir = tmpDir("swap_crash2") + "/idx"
    def write(path: String, tag: String): Unit =
      Seq((1L, tag)).toDF("id", "v").write.mode("overwrite").parquet(path)
    write(dir + "_old", "old")
    StoredIndex.swapRewrite(spark, dir) { tmp =>
      spark.read.parquet(dir).select("v").head.getString(0) shouldBe "old"
      write(tmp, "replacement")
    }
    spark.read.parquet(dir).select("v").head.getString(0) shouldBe "replacement"
  }
}
