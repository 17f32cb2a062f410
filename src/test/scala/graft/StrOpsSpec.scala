package graft

import org.apache.spark.sql.functions._
import graft.functions.StrOps

/** One test per string kernel family (reference tests/test_str.py: one test
  * per Arrow kernel wrapper). Goldens match Python/Arrow semantics. */
class StrOpsSpec extends SparkSpec {
  import spark.implicits._

  private def strs(vals: String*) =
    vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("row_id", "s")

  test("capitalize2 / title / swapcase") {
    val df = strs("hello world", "SPARK", "mIxEd")
    assert(eval1(df, StrOps.capitalize2(col("s"))) ==
      Seq("Hello world", "Spark", "Mixed"))
    assert(eval1(df, StrOps.title(col("s"))) ==
      Seq("Hello World", "Spark", "Mixed"))
    assert(eval1(df, StrOps.swapcase(col("s"))) ==
      Seq("HELLO WORLD", "spark", "MiXeD"))
  }

  test("countSubstring / findSubstring") {
    val df = strs("abcabcab", "xyz", "")
    assert(eval1(df, StrOps.countSubstring(col("s"), "ab")) == Seq(3.0, 0.0, 0.0))
    assert(eval1(df, StrOps.findSubstring(col("s"), "ca")) == Seq(2, -1, -1))
  }

  test("char-class predicates") {
    val df = strs("abc123", "abc", "ABC", " \t", "Title Case", "123")
    assert(eval1(df, StrOps.isAlnum(col("s"))) ==
      Seq(true, true, true, false, false, true))
    assert(eval1(df, StrOps.isAlpha(col("s"))) ==
      Seq(false, true, true, false, false, false))
    assert(eval1(df, StrOps.isDigit(col("s"))) ==
      Seq(false, false, false, false, false, true))
    assert(eval1(df, StrOps.isLower(col("s"))) ==
      Seq(true, true, false, false, false, false))
    assert(eval1(df, StrOps.isUpper(col("s"))) ==
      Seq(false, false, true, false, false, false))
    assert(eval1(df, StrOps.isSpace(col("s"))) ==
      Seq(false, false, false, true, false, false))
  }

  test("pad / trim / repeat / reverse") {
    val df = strs("ab", "  c  ")
    assert(eval1(df, StrOps.lpadStr(col("s"), 4, "_")) == Seq("__ab", "  c "))
    assert(eval1(df, StrOps.rpadStr(col("s"), 4, "_")) == Seq("ab__", "  c "))
    assert(eval1(df, StrOps.trimWhitespace(col("s"))) == Seq("ab", "c"))
    assert(eval1(df, StrOps.ltrimWhitespace(col("s"))) == Seq("ab", "c  "))
    assert(eval1(df, StrOps.repeatStr(col("s"), 2)) == Seq("abab", "  c    c  "))
    assert(eval1(df, StrOps.reverseStr(col("s"))) == Seq("ba", "  c  "))
  }

  test("replaceSlice / sliceStr") {
    val df = strs("abcdef")
    assert(eval1(df, StrOps.replaceSlice(col("s"), 1, 3, "XY")) == Seq("aXYdef"))
    assert(eval1(df, StrOps.sliceStr(col("s"), 1, 4)) == Seq("bcd"))
    assert(eval1(df, StrOps.sliceStr(col("s"), 4, 2)) == Seq(""))
  }

  test("splits") {
    val df = strs("a b  c")
    assert(eval1(df, StrOps.splitWhitespace(col("s"))).map(seqOf) ==
      Seq(Seq("a", "b", "c")))
    assert(eval1(df, StrOps.splitPattern(col("s"), " ")).map(seqOf) ==
      Seq(Seq("a", "b", "", "c")))
  }

  test("match / membership") {
    val df = strs("hello spark", "flink")
    assert(eval1(df, StrOps.matchLike(col("s"), "%spark%")) == Seq(true, false))
    assert(eval1(df, StrOps.matchSubstring(col("s"), "ell")) == Seq(true, false))
    assert(eval1(df, StrOps.matchSubstringRegex(col("s"), "sp.rk")) ==
      Seq(true, false))
    assert(eval1(df, StrOps.isIn(col("s"), Seq("flink", "beam"))) ==
      Seq(false, true))
  }

  test("joinArr / joinElementWise") {
    val df = Seq((0L, Seq("a", "b", "c"))).toDF("row_id", "xs")
    assert(eval1(df, StrOps.joinArr(col("xs"), "-")) == Seq("a-b-c"))
    val df2 = strs("x")
    assert(eval1(df2, StrOps.joinElementWise(lit("/"), col("s"), lit("y"),
      lit("z"))) == Seq("x/y/z"))
  }

  test("extractRegex returns a struct of named groups, null on no match") {
    val df = strs("id=42;x", "nope")
    val got = df.orderBy("row_id")
      .select(StrOps.extractRegex(col("s"), "id=([0-9]+);([a-z])",
        Seq("num", "tag")).as("r"))
      .collect()
    assert(got(0).getStruct(0).getString(0) == "42")
    assert(got(0).getStruct(0).getString(1) == "x")
    assert(got(1).isNullAt(0))
  }

  test("remaining char-class predicates") {
    val df = strs("abc", "ABC 123", "\u00e9t\u00e9", "Title Case")
    assert(eval1(df, StrOps.isAscii(col("s"))) ==
      Seq(true, true, false, true))
    assert(eval1(df, StrOps.isNumeric(col("s"))) ==
      Seq(false, false, false, false))
    assert(eval1(df, StrOps.isTitle(col("s"))) ==
      Seq(false, false, false, true))
  }

  test("countSubstringRegex / replaceSubstring") {
    val df = strs("ab1cd22ef333")
    assert(eval1(df, StrOps.countSubstringRegex(col("s"), "[0-9]+")) == Seq(3))
    assert(eval1(df, StrOps.replaceSubstring(col("s"), "22", "_")) ==
      Seq("ab1cd_ef333"))
  }

  test("center pads both sides (Python rule)") {
    val df = strs("ab", "abc", "abcdef")
    assert(eval1(df, StrOps.center(col("s"), 5, "*")) ==
      Seq("*ab**", "*abc*", "abcdef"))
  }
}
