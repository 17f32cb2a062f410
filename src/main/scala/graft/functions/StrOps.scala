package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** String-function surface — Spark-native equivalents of the reference's
  * `src/dask_awkward/lib/str.py` (929 lines; every function there is a 1:1
  * wrap of an Arrow compute kernel, applied elementwise at any nesting
  * depth). Here each op is a codegen'd Column expression; to apply inside
  * nested lists, compose with [[NestedOps.mapLeaves]] — the analogue of the
  * reference applying kernels "at any depth".
  *
  * Citations are `lib/str.py:<line>` of the reference function.
  */
object StrOps {
  private val lowerChars = "abcdefghijklmnopqrstuvwxyz"
  private val upperChars = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"

  /** str.py:27 capitalize — first char upper, rest lower. */
  def capitalize2(c: Column): Column =
    concat(upper(c.substr(1, 1)), lower(c.substr(lit(2), length(c))))

  /** str.py:43 center — pad both sides to `width` (Python str.center rule:
    * left gets floor((width-len)/2), extra char goes right). */
  def center(c: Column, width: Int, pad: String = " "): Column = {
    val l = length(c)
    val leftW = l + floor((lit(width) - l) / 2).cast("int")
    when(l >= width, c).otherwise(rpad(lpad(c, leftW, lit(pad)), width, pad))
  }

  /** str.py:63 count_substring. */
  def countSubstring(c: Column, sub: String): Column =
    when(length(c) === 0, 0).otherwise(
      (length(c) - length(replace(c, lit(sub), lit("")))) / sub.length)

  /** str.py:83 count_substring_regex. */
  def countSubstringRegex(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0)))

  /** str.py:103 / 815 ends_with / starts_with. */
  def endsWith(c: Column, s: String): Column = c.endsWith(s)
  def startsWith(c: Column, s: String): Column = c.startsWith(s)

  /** str.py:141 find_substring — 0-based index of first occurrence, -1 if
    * absent (Arrow semantics). */
  def findSubstring(c: Column, sub: String): Column = instr(c, sub) - 1

  /** str.py:161 find_substring_regex — 0-based index of the first regex
    * match, -1 if absent (Arrow semantics; `regexp_instr` is 1-based with
    * 0 for no match, so shifting by one gives exactly that). */
  def findSubstringRegex(c: Column, pattern: String,
      ignoreCase: Boolean = false): Column = {
    val p = if (ignoreCase) s"(?i)$pattern" else pattern
    regexp_instr(c, lit(p)) - 1
  }

  /** str.py:281 is_in — membership in a value set. */
  def isIn(c: Column, values: Seq[String]): Column = c.isin(values: _*)

  /** str.py:181 index_in — 0-based index of the value in the set, null if
    * absent (Arrow semantics). */
  def indexIn(c: Column, values: Seq[String]): Column = {
    val pos = array_position(array(values.map(lit): _*), c)
    when(pos > 0, pos - 1)
  }

  /** char-class predicates str.py:201-381 (is_alnum, is_alpha, is_ascii,
    * is_decimal, is_digit, is_lower, is_numeric, is_printable, is_space,
    * is_title, is_upper) — regex-based, Unicode-category semantics
    * matching the reference's Arrow kernels: `is_alpha` = any \p{L}
    * letter (é, Σ, 漢 all qualify, as in Python str.isalpha);
    * `is_alnum` = \p{L} or \p{N}. The three digit-family predicates
    * follow Arrow/Python's Unicode distinction: `is_decimal` = Nd only;
    * `is_digit` = Nd plus Numeric_Type=Digit codepoints (super/subscripts);
    * `is_numeric` = any N category (adds vulgar fractions, roman
    * numerals) UNION the 81 Lo ideographic numerals (see [[loNumerals]])
    * — full Python `str.isnumeric` fidelity, no residual divergence. */
  def isAlnum(c: Column): Column = c.rlike("^[\\p{L}\\p{N}]+$")
  def isAlpha(c: Column): Column = c.rlike("^\\p{L}+$")
  def isAscii(c: Column): Column = c.rlike("^[\\x00-\\x7F]*$")
  def isDecimal(c: Column): Column = c.rlike("^\\p{Nd}+$")
  def isDigit(c: Column): Column =
    c.rlike("^[\\p{Nd}\\u00B2\\u00B3\\u00B9\\u2070\\u2074-\\u2079\\u2080-\\u2089]+$")
  // is_lower/is_upper follow Python's cased-char rule: at least one char of
  // the target case and NO cased char of the opposite case (titlecase Lt
  // counts as "other case" for both, matching str.islower/isupper on ǅ)
  def isLower(c: Column): Column =
    c.rlike("\\p{Ll}") && !c.rlike("[\\p{Lu}\\p{Lt}]")
  /** The 81 Lo-category ideographic numerals Python's `str.isnumeric`
    * admits beyond `\p{N}` (Numeric_Type=Numeric chars whose general
    * category is Lo, not N*): CJK numerals 一二三…萬億, their financial
    * forms 壹貳…, the compatibility-ideograph duplicates, and the
    * 16 supplementary-plane archaic forms. Derived mechanically from
    * unicodedata 14.0 (`c.isnumeric() && category(c) !~ N*`), pinned in
    * StrOpsSpec — closes the last `lib/str.py:317` divergence. */
  private val loNumerals =
      "\\u3405\\u3483\\u382A\\u3B4D\\u4E00\\u4E03\\u4E07\\u4E09" +
      "\\u4E5D\\u4E8C\\u4E94\\u4E96\\u4EBF\\u4EC0\\u4EDF\\u4EE8" +
      "\\u4F0D\\u4F70\\u5104\\u5146\\u5169\\u516B\\u516D\\u5341" +
      "\\u5343\\u5344\\u5345\\u534C\\u53C1\\u53C2\\u53C3\\u53C4" +
      "\\u56DB\\u58F1\\u58F9\\u5E7A\\u5EFE\\u5EFF\\u5F0C\\u5F0D" +
      "\\u5F0E\\u5F10\\u62FE\\u634C\\u67D2\\u6F06\\u7396\\u767E" +
      "\\u8086\\u842C\\u8CAE\\u8CB3\\u8D30\\u9621\\u9646\\u964C" +
      "\\u9678\\u96F6\\uF96B\\uF973\\uF978\\uF9B2\\uF9D1\\uF9D3" +
      "\\uF9FD\\x{20001}\\x{20064}\\x{200E2}\\x{20121}\\x{2092A}" +
      "\\x{20983}\\x{2098C}\\x{2099C}\\x{20AEA}\\x{20AFD}\\x{20B19}" +
      "\\x{22390}\\x{22998}\\x{23B1B}\\x{2626D}\\x{2F890}"
  def isNumeric(c: Column): Column =
    c.rlike(s"^[\\p{N}$loNumerals]+$$")
  def isSpace(c: Column): Column = c.rlike("^\\s+$")
  def isUpper(c: Column): Column =
    c.rlike("\\p{Lu}") && !c.rlike("[\\p{Ll}\\p{Lt}]")

  /** str.py:333 is_printable — no control/format/separator chars except
    * the plain space; empty string is printable (Python semantics). */
  def isPrintable(c: Column): Column =
    c.rlike("^(?:[^\\p{C}\\p{Zl}\\p{Zp}\\p{Zs}]|\\x20)*$")

  /** str.py:365 is_title — Python `str.istitle`: at least one cased char,
    * no uppercase directly after a letter, no lowercase starting a letter
    * run. (Matches Python on bicameral scripts; `"ABc Def"` -> false,
    * `"Foo-Bar"` -> true — where the old initcap round-trip diverged.) */
  def isTitle(c: Column): Column =
    c.rlike("[\\p{Lu}\\p{Ll}]") &&
      !c.rlike("\\p{L}\\p{Lu}") &&
      !c.rlike("(^|\\P{L})\\p{Ll}")

  /** str.py:397 join — list of strings -> string with separator (a per-row
    * reduction in the reference). */
  def joinArr(arr: Column, sep: String): Column = array_join(arr, sep)

  /** str.py:415 join_element_wise. */
  def joinElementWise(sep: Column, parts: Column*): Column =
    concat_ws("", parts.head +: parts.tail.flatMap(p => Seq(sep, p)): _*)

  /** str.py:430 length (in characters). */
  def strLength(c: Column): Column = length(c)

  /** str.py:446 / 917 lower / upper; str.py:851 title. */
  def lowerStr(c: Column): Column = lower(c)
  def upperStr(c: Column): Column = upper(c)
  def title(c: Column): Column = initcap(c)

  /** str.py:462 / 676 lpad / rpad. */
  def lpadStr(c: Column, w: Int, p: String): Column = lpad(c, w, p)
  def rpadStr(c: Column, w: Int, p: String): Column = rpad(c, w, p)

  /** str.py:482-714 trims — whitespace forms plus the char-set forms
    * (str.py:482 ltrim / str.py:696 rtrim take an explicit character set,
    * one-sided; str.py:883 trim is the both-sides form). */
  def ltrimWhitespace(c: Column): Column = ltrim(c)
  def rtrimWhitespace(c: Column): Column = rtrim(c)
  def trimWhitespace(c: Column): Column = trim(c)
  def trimChars(c: Column, chars: String): Column = trim(c, chars)
  def ltrimChars(c: Column, chars: String): Column = ltrim(c, chars)
  def rtrimChars(c: Column, chars: String): Column = rtrim(c, chars)

  /** str.py:516 match_like (SQL LIKE) / str.py:536-556 match_substring(_regex). */
  def matchLike(c: Column, pattern: String): Column = c.like(pattern)
  def matchSubstring(c: Column, sub: String): Column = c.contains(sub)
  def matchSubstringRegex(c: Column, pattern: String): Column = c.rlike(pattern)

  /** str.py:576 repeat; str.py:660 reverse. */
  def repeatStr(c: Column, n: Int): Column = repeat(c, n)
  def reverseStr(c: Column): Column = reverse(c)

  /** str.py:594 replace_slice — replace chars [start, stop) with `by`
    * (0-based, Arrow semantics). */
  def replaceSlice(c: Column, start: Int, stop: Int, by: String): Column =
    concat(substring(c, 1, start), lit(by), c.substr(lit(stop + 1), length(c)))

  /** str.py:616 / 638 replace_substring(_regex). */
  def replaceSubstring(c: Column, find: String, by: String): Column =
    replace(c, lit(find), lit(by))
  def replaceSubstringRegex(c: Column, pattern: String, by: String): Column =
    regexp_replace(c, pattern, by)

  /** str.py:730 slice — [start, stop) 0-based char slice. */
  def sliceStr(c: Column, start: Int, stop: Int): Column =
    substring(c, start + 1, math.max(stop - start, 0))

  /** str.py:752 / 774 / 796 split_pattern(_regex) / split_whitespace. */
  def splitPattern(c: Column, sep: String): Column =
    split(c, java.util.regex.Pattern.quote(sep))
  def splitPatternRegex(c: Column, pattern: String): Column = split(c, pattern)
  def splitWhitespace(c: Column): Column = split(c, "\\s+")

  /** str.py:835 swapcase — ASCII case flip via translate (codegen'd; no UDF). */
  def swapcase(c: Column): Column =
    translate(c, lowerChars + upperChars, upperChars + lowerChars)

  /** str.py:123 extract_regex — first match's capture groups as a struct
    * with the given field names (Arrow returns a struct array likewise). */
  def extractRegex(c: Column, pattern: String, groups: Seq[String]): Column =
    when(c.rlike(pattern),
      struct(groups.zipWithIndex.map { case (g, i) =>
        regexp_extract(c, pattern, i + 1).as(g)
      }: _*))

  /** str.py:123 extract_regex, Arrow named-group form — field names come
    * from `(?<name>...)` groups in the pattern itself (Arrow's
    * `extract_regex` derives the struct fields the same way). Group order
    * in the pattern is the positional group order, so the i-th named group
    * maps to capture index i+1. */
  def extractRegexNamed(c: Column, pattern: String): Column = {
    val names = "\\(\\?P?<([A-Za-z][A-Za-z0-9]*)>".r
      .findAllMatchIn(pattern).map(_.group(1)).toSeq
    require(names.nonEmpty, s"extractRegexNamed: no named groups in $pattern")
    // Java regex rejects Python's (?P<name>...) spelling — normalize it.
    val javaPattern = pattern.replace("(?P<", "(?<")
    extractRegex(c, javaPattern, names)
  }

  /** str.py:867 to_categorical — dictionary-encode in the reference; in
    * Spark, dictionary encoding is a parquet/Tungsten storage concern, so
    * this is a documented metadata no-op: the column is tagged
    * `graft.param.__array__ = categorical` (the reference likewise sets the
    * `__array__: categorical` layout parameter). */
  def toCategorical(c: Column, as: String = "value"): Column =
    Behaviors.withParameter(c, "__array__", "categorical", as)
}
