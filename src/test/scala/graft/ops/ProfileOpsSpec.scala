package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.ProfileOps.{Check, ColumnSpec}

/** Laws for the declarative profiling/constraint surface beyond what the
  * q156/q157 oracles pin: exact metric values on a constructed frame with
  * known nulls/dupes, and the verdict-vs-display separation — a
  * constraint whose compliance ROUNDS to 1.0 must still fail, because
  * `passed` compares exact counts, never the rounded metric.
  */
class ProfileOpsSpec extends SparkSpec {

  test("profile: exact completeness / cardinality / numeric / length " +
      "metrics on a frame with known nulls and duplicates") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("aa"), Some(10.0)),
      (2L, Some("bbbb"), None),
      (3L, None, Some(30.0)),
      (3L, Some("aa"), Some(20.0))
    ).toDF("id", "s", "x")
    val rows = ProfileOps.profile(df, Seq(
      ColumnSpec("id", distinct = true),
      ColumnSpec("s", textLen = true),
      ColumnSpec("x", numeric = true)))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(rows(("_table", "n_rows")) == 4.0)
    assert(rows(("id", "completeness")) == 1.0)
    assert(rows(("id", "n_distinct")) == 3.0)
    assert(rows(("s", "completeness")) == 0.75)
    assert(rows(("s", "min_len")) == 2.0)
    assert(rows(("s", "max_len")) == 4.0)
    assert(rows(("s", "avg_len")) == 2.666667) // 8/3 rounded to 6 dp
    assert(rows(("x", "completeness")) == 0.75)
    assert(rows(("x", "min")) == 10.0)
    assert(rows(("x", "max")) == 30.0)
    assert(rows(("x", "mean")) == 20.0)
  }

  test("verify: a uniqueness violation whose compliance rounds to 1.0 " +
      "still fails — the verdict compares exact counts") {
    // 2,000,001 rows, ONE duplicate key: d/n = 0.9999995, which rounds
    // to 1.0 at 6 decimals. A gate comparing the display metric would
    // pass; the exact-count verdict must not.
    val df = spark.range(2000000L)
      .select((col("id") % 1999999L).as("k"))
    val rows = ProfileOps.verify(df, Seq(
      Check("k_unique",
        round(count_distinct(col("k")).cast("double") / count(lit(1)), 6),
        count_distinct(col("k")) === count(lit(1))),
      Check("k_complete",
        round(count(col("k")).cast("double") / count(lit(1)), 6),
        count(col("k")) === count(lit(1)))))
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(2))))
      .toMap
    val (uv, up) = rows("k_unique")
    assert(uv == 1.0, s"display metric should round to 1.0, got $uv")
    assert(!up, "rounded-to-1.0 uniqueness violation must still fail")
    assert(rows("k_complete") == ((1.0, true)))
  }
}
