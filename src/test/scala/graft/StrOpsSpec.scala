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

  test("char-class predicates are Unicode (Python str.is* goldens)") {
    // é/Σ/漢 are letters; ǅ is titlecase (Lt): neither lower nor upper;
    // СПАРК (Cyrillic caps) is upper; "héllo1" alnum but not alpha.
    val df = strs("héllo", "Σλ", "漢字", "héllo1", "ǅ", "СПАРК", "éλ")
    assert(eval1(df, StrOps.isAlpha(col("s"))) ==
      Seq(true, true, true, false, true, true, true))
    assert(eval1(df, StrOps.isAlnum(col("s"))) ==
      Seq(true, true, true, true, true, true, true))
    assert(eval1(df, StrOps.isLower(col("s"))) ==
      Seq(true, false, false, true, false, false, true))
    assert(eval1(df, StrOps.isUpper(col("s"))) ==
      Seq(false, false, false, false, false, true, false))
  }

  test("digit-family Unicode classes: is_decimal vs is_digit vs is_numeric") {
    // "42" all three; superscript "4²" digit+numeric, not decimal;
    // vulgar fraction "½" numeric only; roman numeral "Ⅻ" numeric only.
    val df = strs("42", "4²", "½", "Ⅻ", "x1")
    assert(eval1(df, StrOps.isDecimal(col("s"))) ==
      Seq(true, false, false, false, false))
    assert(eval1(df, StrOps.isDigit(col("s"))) ==
      Seq(true, true, false, false, false))
    assert(eval1(df, StrOps.isNumeric(col("s"))) ==
      Seq(true, true, true, true, false))
  }

  test("is_numeric Lo ideographic numerals (lib/str.py:317): full " +
    "Python isnumeric fidelity — CJK/financial/supplementary numerals " +
    "pass, non-numeral ideographs do not") {
    // every golden verified against CPython: "三十五".isnumeric() etc.
    val df = strs(
      "三十五",        // plain CJK numerals (Lo)
      "壹貳參",        // financial forms (Lo)
      "〇",            // U+3007 — Nl, was already in \p{N}
      "𠀁", // U+20001 archaic form, supplementary plane (Lo)
      "廿卅",          // twenty/thirty compact forms (Lo)
      "漢",            // ideograph WITHOUT a numeric value
      "第一")          // ordinal prefix is not numeric
    assert(eval1(df, StrOps.isNumeric(col("s"))) ==
      Seq(true, true, true, true, true, false, false))
  }

  test("is_printable (str.py:333): control/format chars break it, space ok") {
    val df = strs("abc def", "", "tab\there", "nl\nhere", "unicode-ok: é")
    assert(eval1(df, StrOps.isPrintable(col("s"))) ==
      Seq(true, true, false, false, true))
  }

  test("is_title (str.py:365) follows Python str.istitle") {
    // Python goldens: "ABc Def" false (upper after cased), "Foo-Bar" true
    // (non-letter delimits runs), "A1b" false (lower starts a run),
    // "abc" false, "A" true, "123" false (no cased char).
    val df = strs("Title Case", "ABc Def", "Foo-Bar", "A1b", "abc", "A", "123")
    assert(eval1(df, StrOps.isTitle(col("s"))) ==
      Seq(true, false, true, false, false, true, false))
  }

  test("find_substring_regex (str.py:161): 0-based, -1 absent, ignore_case") {
    val df = strs("abc123xyz", "no digits", "ABCdef")
    assert(eval1(df, StrOps.findSubstringRegex(col("s"), "[0-9]+")) ==
      Seq(3, -1, -1))
    assert(eval1(df, StrOps.findSubstringRegex(col("s"), "abc",
      ignoreCase = true)) == Seq(0, -1, 0))
  }

  test("one-sided char-set trims (str.py:482/696)") {
    val df = strs("xxhixx", "xyhixy")
    assert(eval1(df, StrOps.ltrimChars(col("s"), "xy")) == Seq("hixx", "hixy"))
    assert(eval1(df, StrOps.rtrimChars(col("s"), "xy")) == Seq("xxhi", "xyhi"))
    assert(eval1(df, StrOps.trimChars(col("s"), "xy")) == Seq("hi", "hi"))
  }

  test("extract_regex named-group form (str.py:123, Arrow semantics)") {
    val df = strs("k=v", "a=1", "nomatch")
    val got = eval1(df,
      StrOps.extractRegexNamed(col("s"), "(?<key>[a-z]+)=(?<value>\\w+)"))
    val r0 = got(0).asInstanceOf[org.apache.spark.sql.Row]
    assert(r0.getString(0) == "k" && r0.getString(1) == "v")
    val r1 = got(1).asInstanceOf[org.apache.spark.sql.Row]
    assert(r1.getString(0) == "a" && r1.getString(1) == "1")
    assert(got(2) == null)
    // Python (?P<name>...) spelling is normalized to Java's (?<name>...)
    val gotP = eval1(df,
      StrOps.extractRegexNamed(col("s"), "(?P<key>[a-z]+)=(?P<value>\\w+)"))
    assert(gotP(0).asInstanceOf[org.apache.spark.sql.Row].getString(0) == "k")
  }

  test("to_categorical (str.py:867) tags categorical layout metadata") {
    val df = strs("a", "b", "a").select(
      StrOps.toCategorical(col("s"), as = "s"))
    val meta = df.schema("s").metadata
    assert(meta.getString("graft.param.__array__") == "categorical")
    assert(df.collect().map(_.getString(0)).toSeq == Seq("a", "b", "a"))
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
