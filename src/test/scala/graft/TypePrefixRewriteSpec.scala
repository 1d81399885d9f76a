package graft

import org.apache.spark.sql.functions._

import graft.model.ObjectsModel
import graft.plans.TypePrefixRewrite

/** The anchored-regex → StartsWith optimizer rule (sargable rewrite,
  * server/src/main.rs:287-294 analog). */
class TypePrefixRewriteSpec extends SparkSpec {

  test("anchored literal alternations are recognized; regex metas are not") {
    assert(TypePrefixRewrite.anchoredLiterals("^0x2::coin") === Some(Seq("0x2::coin")))
    assert(TypePrefixRewrite.anchoredLiterals("^a|^b::c") === Some(Seq("a", "b::c")))
    assert(TypePrefixRewrite.anchoredLiterals("^a.*") === None)
    assert(TypePrefixRewrite.anchoredLiterals("a|^b") === None)
    assert(TypePrefixRewrite.anchoredLiterals("^") === None)
  }

  test("rlike '^prefix' plans as StartsWith and matches the startswith result") {
    TypePrefixRewrite.install(spark)
    val objs = ObjectsModel.objects(spark, sf0001)
    val viaRlike = objs.filter(col("type_full").rlike("^0x1::click|^0x0::view"))
    val optimized = viaRlike.queryExecution.optimizedPlan.toString
    assert(optimized.contains("StartsWith"), optimized)
    assert(!optimized.toLowerCase.contains("rlike"), optimized)
    val expected = objs.filter(
      col("type_full").startsWith("0x1::click") || col("type_full").startsWith("0x0::view"))
      .select("_id").collect().map(_.getString(0)).sorted.toSeq
    val got = viaRlike.select("_id").collect().map(_.getString(0)).sorted.toSeq
    assert(got === expected && got.nonEmpty)
  }

  test("non-rewritable regex is left untouched and still correct") {
    TypePrefixRewrite.install(spark)
    val objs = ObjectsModel.objects(spark, sf0001)
    val df = objs.filter(col("type_full").rlike("^0x[12]::click"))
    val expected = objs.filter(
      col("type_full").startsWith("0x1::click") || col("type_full").startsWith("0x2::click"))
      .count()
    assert(df.count() === expected)
  }
}
