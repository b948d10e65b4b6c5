package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract of the SQL-text DML router: Spark-parsed DELETE/UPDATE/
  * MERGE reach the store's CoW DML with their predicates intact, and
  * anything outside the supported surface is refused loudly rather
  * than half-applied.
  */
class StoreSqlSpec extends SparkSpec {

  import spark.implicits._

  private def freshStore(): ManifestTableStore = {
    val p = Files.createTempDirectory("storesql-")
    p.toFile.deleteOnExit()
    val store = new ManifestTableStore(p.toString,
      statsColumns = Seq("n"))
    store.append(Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "n"), 0L)
    store
  }

  test("DELETE FROM routes the parsed predicate to the CoW delete") {
    val store = freshStore()
    StoreSql.exec(spark, Map("t" -> store), "DELETE FROM t WHERE n >= 2")
    assert(store.read(spark).select("k").as[String].collect().toSet
      == Set("a"))
  }

  test("UPDATE ... SET routes assignments as expressions; UPDATE " +
      "without WHERE is refused before touching the table") {
    val store = freshStore()
    StoreSql.exec(spark, Map("t" -> store),
      "UPDATE t SET k = concat(k, '!'), n = n * 10 WHERE n <= 2")
    assert(store.read(spark).select("k", "n").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
      == Set(("a!", 10), ("b!", 20), ("c", 3)))
    val v = store.currentVersion(spark)
    intercept[IllegalArgumentException] {
      StoreSql.exec(spark, Map("t" -> store), "UPDATE t SET n = 0")
    }
    assert(store.currentVersion(spark) == v)
  }

  test("MERGE INTO upserts through the keyed CoW merge; non-star " +
      "actions and multi-column conditions are refused") {
    val store = freshStore()
    Seq(("b", 20), ("d", 40)).toDF("k", "n")
      .createOrReplaceTempView("src")
    StoreSql.exec(spark, Map("t" -> store),
      "MERGE INTO t USING src ON t.k = src.k " +
        "WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *", batchId = 1L)
    assert(store.read(spark).select("k", "n").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
      == Set(("a", 1), ("b", 20), ("c", 3), ("d", 40)))
    intercept[IllegalArgumentException] {
      StoreSql.exec(spark, Map("t" -> store),
        "MERGE INTO t USING src ON t.k = src.k " +
          "WHEN MATCHED THEN UPDATE SET n = src.n " +
          "WHEN NOT MATCHED THEN INSERT *", batchId = 2L)
    }
    intercept[IllegalArgumentException] {
      StoreSql.exec(spark, Map("t" -> store),
        "MERGE INTO t USING src ON t.k = src.k AND t.n = src.n " +
          "WHEN MATCHED THEN UPDATE SET * " +
          "WHEN NOT MATCHED THEN INSERT *", batchId = 2L)
    }
  }

  test("unknown targets and non-DML statements are refused") {
    val store = freshStore()
    intercept[IllegalArgumentException] {
      StoreSql.exec(spark, Map("t" -> store),
        "DELETE FROM other WHERE n = 1")
    }
    intercept[IllegalArgumentException] {
      StoreSql.exec(spark, Map("t" -> store), "SELECT * FROM t")
    }
  }
}
