package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SortedIntersectExpr
import graft.plans.GraftExtensions

/** The SparkSessionExtensions entry point: SQL registrations for the
  * native Expressions and the sorted-intersect optimizer rewrite —
  * exercised on a second session (same SparkContext) built with
  * `.withExtensions(new GraftExtensions)`, exactly as a cluster would
  * via `spark.sql.extensions`. */
class GraftExtensionsSpec extends AnyFunSuite {

  lazy val base: SparkSession = SparkTestSession.spark

  /** A second session sharing base's SparkContext, with the extensions
    * installed. getOrCreate() would return the existing default session,
    * so the default/active slots are cleared for the build and restored
    * right after. */
  lazy val ext: SparkSession = {
    base.sparkContext // force the shared context first
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    prevDefault.foreach(SparkSession.setDefaultSession)
    prevActive.foreach(SparkSession.setActiveSession)
    s
  }

  test("injected SQL functions run and match the Column-API native nodes") {
    val r = ext.sql(
      """SELECT
        |  js_round(1.005D, 2)                                   AS jr,
        |  dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D))     AS dp,
        |  sum_squares(array(3.0D, 4.0D))                        AS sq,
        |  sorted_intersect(array(1L, 2L, 5L), array(2L, 5L, 7L)) AS si,
        |  sorted_intersect_count(array(1L, 2L, 5L), array(2L, 5L, 7L)) AS sc,
        |  sliding_min(array(5L, 3L, 4L, 1L), 2)                 AS sm
        |""".stripMargin).head()
    // IEEE 1.005*100 = 100.4999..., +0.5 floors to 100 — the JS-parity
    // contract (NOT round-half-up on the decimal value)
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 11.0)
    assert(r.getDouble(2) == 25.0)
    assert(r.getAs[scala.collection.Seq[Long]](3).toSeq == Seq(2L, 5L))
    assert(r.getLong(4) == 2L)
    assert(r.getAs[scala.collection.Seq[Long]](5).toSeq == Seq(3L, 3L, 1L))
    // NFC: e + combining acute (2 code points) normalizes to é (1)
    val n = ext.sql("SELECT nfc_normalize_graft('é') AS s").head.getString(0)
    assert(n == "é")
    // the functions are session-scoped: the base session must NOT see them
    intercept[Exception] { base.sql("SELECT sum_squares(array(1.0D))").head() }
  }

  test("sorted-intersect rewrite fires on provable shapes, preserves results, skips unprovable") {
    def fired(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.expressions.exists(_.exists {
        case _: SortedIntersectExpr.SortedIntersectCount => true
        case _ => false
      })
    // a non-foldable source (range) — a literal LocalRelation would be
    // constant-folded whole by ConvertToLocalRelation before any plan
    // inspection could see the rewrite
    val provable = "size(array_intersect(" +
      "sort_array(array_distinct(array(id * 2L, id + 1L, 2L))), " +
      "array_distinct(sort_array(array(2L, id * 3L, id + 1L))))) AS n"
    val dfExt = ext.range(20).selectExpr(provable)
    assert(fired(dfExt), "rule must rewrite the provable shape")
    // ground truth: the SAME query on the base session (no extension,
    // hash-set array_intersect path) must agree row for row
    val expected = base.range(20).selectExpr(provable)
    assert(!fired(expected), "no extension, no rewrite")
    assert(dfExt.collect().map(_.getInt(0)).toSeq ==
      expected.collect().map(_.getInt(0)).toSeq)
    // unprovable sortedness (no syntactic sort proof): NOT rewritten,
    // even with the extension installed — wrong sortedness would
    // silently undercount
    val unproven = ext.range(20)
      .selectExpr("size(array_intersect(array(id, 2L), array(2L, id))) AS n")
    assert(!fired(unproven))
    // descending sort: rejected by the ascending-literal guard
    val desc = ext.range(20).selectExpr(
      "size(array_intersect(sort_array(array_distinct(array(id, 2L)), false), " +
        "sort_array(array_distinct(array(2L, id)), false))) AS n")
    assert(!fired(desc))
  }
}
