package graft.queries

/** Tiny two-dialect SQL emitter for the LLM-pipeline operators
  * (dedup / similarity / text analysis).
  *
  * The near-dup and ANN operators hinge on hash functions that must be
  * IDENTICAL in Spark and in the DuckDB oracle, or the candidate sets
  * cannot be hash-compared. Neither engine exposes the other's native
  * hash, but both expose `md5` (same algorithm, same lowercase-hex
  * rendering), `substring`, and `instr` — so [[SqlDialect.hex32]] derives
  * a 32-bit integer hash by parsing the first 8 hex digits of an md5
  * arithmetically. Everything else here papers over naming differences
  * (size/len, transform/list_transform, sequence/generate_series, …).
  *
  * Only scalar/array expressions are emitted through this; the relational
  * shape (joins, explodes, windows) stays in idiomatic DataFrame API on
  * the Spark side and plain SQL in the oracle.
  */
sealed trait SqlDialect {
  /** Bind `value` to lambda variable `v` inside `body`, forcing exactly
    * one evaluation of `value` per row. Both engines interpret
    * higher-order lambdas without common-subexpression elimination, so an
    * expensive expression referenced N times is otherwise computed N
    * times (measured: the 8 md5 calls of an unbound hex32 made simhash
    * 30× slower at sf0.1). */
  final def bind(value: String, v: String, body: String): String =
    elem(map(mkArray1(value), v, body), "1")

  /** One-element array literal (dialect-specific syntax). */
  protected def mkArray1(x: String): String

  /** 32-bit hash: parse md5(x)[0,8) as hex → BIGINT in [0, 2^32).
    * Default: the md5 is computed ONCE (via `bind`) and its digits parsed
    * arithmetically — the only hex→int path DuckDB has. Spark overrides
    * with its native codegen'd `conv` (identical values, ~8× fewer
    * interpreted ops). */
  def hex32(x: String): String =
    bind(s"md5($x)", "mh",
      (1 to 8).map(i =>
        s"CAST(instr('0123456789abcdef', substring(mh, $i, 1)) - 1 AS BIGINT) * ${1L << (4 * (8 - i))}")
        .mkString("(", " + ", ")"))

  /** String-array literal. Items must be lowercase ASCII letters only —
    * the one regime where both dialects' quoting is identical, so no
    * escaping divergence can reach a hash compare. */
  final def strArray(items: Seq[String]): String = {
    require(items.nonEmpty && items.forall(_.matches("[a-z]+")),
      s"strArray: lowercase-ASCII items only, got $items")
    mkArrayOf(items.map(s => s"'$s'"))
  }
  protected def mkArrayOf(items: Seq[String]): String

  /** DOUBLE-array literal from shortest-roundtrip decimal renderings.
    * Both engines parse a decimal literal to the NEAREST double, and
    * `Double.toString` emits a string that round-trips exactly — so the
    * array is bit-identical cross-engine (the model-as-literals transport
    * used by Pca oracles). NaN/Inf have no portable literal. */
  final def dblArray(xs: Seq[Double]): String = {
    require(xs.forall(x => !x.isNaN && !x.isInfinite),
      "dblArray: finite values only")
    mkArrayOf(xs.map(x => s"CAST(${java.lang.Double.toString(x)} AS DOUBLE)"))
  }

  /** Fold `body` (a function of `acc` only; the element is a dummy) n
    * times starting from `init` — the cross-dialect iterate-n-times
    * primitive (Spark `aggregate` has an explicit init; DuckDB
    * `list_reduce` takes the first element as init, so the dummy list is
    * prepended with one). `init` and `body` must be BIGINT-typed; n < 1
    * yields `init`. */
  def ifoldn(n: String, init: String, body: String): String

  def len(x: String): String
  def map(l: String, v: String, body: String): String
  /** Split on a LITERAL separator (Spark's split takes a regex, so only
    * regex-inert separators are allowed; '' splits into characters —
    * verified identical in both engines). */
  def splitOn(t: String, sep: String): String
  /** Left fold of a STRING list into a STRING accumulator (DuckDB's
    * list_reduce requires acc type = element type, which strings
    * satisfy; the init is prepended as the first reduced element). */
  def sfold(l: String, init: String, body: String): String
  /** TRUE iff `pat` matches anywhere in `c`. */
  def regexLike(c: String, pat: String): String
  def amin(l: String): String
  def amax(l: String): String
  def adistinct(l: String): String
  /** Ascending natural sort. Both engines sort ASCII strings in binary
    * order; callers feeding non-ASCII must not depend on tie order. */
  def asort(l: String): String
  def range(a: String, b: String): String
  /** 1..n inclusive, EMPTY when n < 1. Spark's sequence(1, 0) counts
    * DOWN ([1, 0]) instead of being empty — a crash (slice start 0) and
    * a cross-engine divergence for degenerate inputs. */
  def range1(n: String): String
  def toStr(x: String): String
  def splitSpace(t: String): String
  /** Array -> rows in a SELECT list (explode/unnest). */
  def unnest(l: String): String
  /** CTE materialization hint — breaks exponential inlining of a
    * CTE chain whose stages reference several predecessors (the DP
    * trainers). Empty where the engine plans CTE reuse itself. */
  def ctem: String
  /** n-token window starting at 1-based idx, joined by spaces. */
  def wordSlice(arr: String, idx: String, n: Int): String
  def interSize(a: String, b: String): String
  def unionSize(a: String, b: String): String
  def elem(l: String, i: String): String
  def filterIn(l: String, items: Seq[String]): String
  /** filter `l` keeping elements `v` where `pred` holds. */
  def filterBy(l: String, v: String, pred: String): String
  /** exact integer sum of a BIGINT list (order-insensitive: exact). */
  def isum(l: String): String
  /** elementwise product of two float lists as DOUBLE list. */
  def zipMul(a: String, b: String): String
  def joinStr(l: String, sep: String): String
  def shiftl(x: String, b: String): String
  /** sequential left-fold sum of a DOUBLE list (order-identical across
    * dialects so dot products are bit-comparable). */
  def dsum(l: String): String
  def shiftr(x: String, b: String): String
  def bxor(a: String, b: String): String
  def idiv(a: String, b: String): String
  /** A UTF-8 string synthesized from literal hex bytes — the only
    * ASCII-source-safe way to plant non-ASCII test content that is
    * byte-identical in both engines (Spark's `chr` truncates codepoints
    * to one byte; raw multibyte literals would ride three quoting
    * layers). `hex` must be a valid UTF-8 byte sequence. */
  final def utf8FromHex(hex: String): String = {
    require(hex.matches("(?:[0-9A-F]{2})+"), s"utf8FromHex: even-length uppercase hex, got '$hex'")
    utf8Decode(s"unhex('$hex')")
  }
  protected def utf8Decode(blob: String): String
  /** Byte (not char) length of a string. */
  def byteLen(x: String): String
  /** Replace EVERY match of `pat` in `c` with `repl` (DuckDB's default
    * is first-match-only; the 'g' flag lives here so callers can't
    * forget it). Patterns must stay in the backslash-free regex subset —
    * see [[graft.operators.PiiRedaction]]. */
  def regexReplaceAll(c: String, pat: String, repl: String): String
  /** Number of matches of `pat` in `c`, BIGINT. */
  def regexCount(c: String, pat: String): String
  /** Uppercase hex of the UTF-8 bytes of `x` — two hex chars per byte
    * (the byte-fallback tokenizers' byte rendering). */
  def hexBytes(x: String): String
  /** Concatenation of column `c`'s values in sorted order — callers
    * pre-distinct (Spark's collect_set is set-valued either way). */
  def strAggSorted(c: String): String
}

object SparkSql extends SqlDialect {
  def unnest(l: String) = s"explode($l)"
  def ctem: String = ""
  protected def mkArray1(x: String) = s"array($x)"
  protected def mkArrayOf(items: Seq[String]) = items.mkString("array(", ", ", ")")
  def ifoldn(n: String, init: String, body: String) =
    s"aggregate(${range1(n)}, $init, (acc, __i) -> $body)"
  override def hex32(x: String): String = s"md5_u32($x)"
  def len(x: String) = s"size($x)"
  def map(l: String, v: String, body: String) = s"transform($l, $v -> $body)"
  def splitOn(t: String, sep: String) = {
    require(sep.matches("[a-z0-9&,;|]*"), s"splitOn: regex-inert separators only, got '$sep'")
    s"split($t, '$sep')"
  }
  def sfold(l: String, init: String, body: String) =
    s"aggregate($l, $init, (acc, x) -> $body)"
  def regexLike(c: String, pat: String) = s"regexp_like($c, '$pat')"
  def amin(l: String) = s"array_min($l)"
  def amax(l: String) = s"array_max($l)"
  def adistinct(l: String) = s"array_distinct($l)"
  def asort(l: String) = s"array_sort($l)"
  def range(a: String, b: String) = s"sequence($a, $b)"
  def range1(n: String) =
    s"CASE WHEN ($n) < 1 THEN array() ELSE sequence(1, $n) END"
  def toStr(x: String) = s"CAST($x AS STRING)"
  def splitSpace(t: String) = s"split($t, ' ')"
  def wordSlice(arr: String, idx: String, n: Int) = s"concat_ws(' ', slice($arr, $idx, $n))"
  def interSize(a: String, b: String) = s"size(array_intersect($a, $b))"
  def unionSize(a: String, b: String) = s"size(array_union($a, $b))"
  def elem(l: String, i: String) = s"element_at($l, $i)"
  def filterIn(l: String, items: Seq[String]) =
    s"filter($l, t -> t IN (${items.map(s => s"'$s'").mkString(", ")}))"
  def filterBy(l: String, v: String, pred: String) = s"filter($l, $v -> $pred)"
  def dsum(l: String) = s"aggregate($l, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
  def shiftr(x: String, b: String) = s"shiftright($x, $b)"
  def bxor(a: String, b: String) = s"($a ^ $b)"
  def idiv(a: String, b: String) = s"($a DIV $b)"
  def isum(l: String) = s"aggregate($l, CAST(0 AS BIGINT), (acc, x) -> acc + x)"
  def zipMul(a: String, b: String) =
    s"zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE))"
  def joinStr(l: String, sep: String) = s"array_join($l, '$sep')"
  def shiftl(x: String, b: String) = s"shiftleft($x, $b)"
  def regexReplaceAll(c: String, pat: String, repl: String) =
    s"regexp_replace($c, '$pat', '$repl')"
  def regexCount(c: String, pat: String) =
    s"CAST(regexp_count($c, '$pat') AS BIGINT)"
  protected def utf8Decode(blob: String) = s"decode($blob, 'UTF-8')"
  def byteLen(x: String) = s"octet_length($x)"
  def hexBytes(x: String) = s"hex(encode($x, 'UTF-8'))"
  def strAggSorted(c: String) = s"array_join(array_sort(collect_set($c)), '')"
}

object DuckSql extends SqlDialect {
  def unnest(l: String) = s"unnest($l)"
  def ctem: String = "MATERIALIZED "
  protected def mkArray1(x: String) = s"[$x]"
  protected def mkArrayOf(items: Seq[String]) = items.mkString("[", ", ", "]")
  def ifoldn(n: String, init: String, body: String) =
    s"list_reduce(list_concat([$init], list_transform(${range1(n)}, __i -> $init)), (acc, __i) -> $body)"
  def len(x: String) = s"len($x)"
  def map(l: String, v: String, body: String) = s"list_transform($l, $v -> $body)"
  def splitOn(t: String, sep: String) = {
    require(sep.matches("[a-z0-9&,;|]*"), s"splitOn: regex-inert separators only, got '$sep'")
    s"string_split($t, '$sep')"
  }
  def sfold(l: String, init: String, body: String) =
    s"list_reduce(list_concat([$init], $l), (acc, x) -> $body)"
  def regexLike(c: String, pat: String) = s"regexp_matches($c, '$pat')"
  def amin(l: String) = s"list_min($l)"
  def amax(l: String) = s"list_max($l)"
  def adistinct(l: String) = s"list_distinct($l)"
  def asort(l: String) = s"list_sort($l)"
  def range(a: String, b: String) = s"generate_series($a, $b)"
  def range1(n: String) = s"generate_series(1, $n)" // already empty-safe
  def toStr(x: String) = s"CAST($x AS VARCHAR)"
  def splitSpace(t: String) = s"string_split($t, ' ')"
  def wordSlice(arr: String, idx: String, n: Int) =
    s"array_to_string($arr[$idx:$idx+${n - 1}], ' ')"
  def interSize(a: String, b: String) = s"len(list_intersect($a, $b))"
  def unionSize(a: String, b: String) = s"len(list_distinct(list_concat($a, $b)))"
  def elem(l: String, i: String) = s"$l[$i]"
  def filterIn(l: String, items: Seq[String]) =
    s"list_filter($l, t -> t IN (${items.map(s => s"'$s'").mkString(", ")}))"
  def filterBy(l: String, v: String, pred: String) = s"list_filter($l, $v -> $pred)"
  def dsum(l: String) = s"list_reduce(list_concat([CAST(0.0 AS DOUBLE)], $l), (acc, x) -> acc + x)"
  def shiftr(x: String, b: String) = s"($x >> $b)"
  def bxor(a: String, b: String) = s"xor($a, $b)"
  def idiv(a: String, b: String) = s"($a // $b)"
  def isum(l: String) = s"CAST(list_sum($l) AS BIGINT)"
  def zipMul(a: String, b: String) =
    s"list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))"
  def joinStr(l: String, sep: String) = s"array_to_string($l, '$sep')"
  def shiftl(x: String, b: String) = s"($x << $b)"
  def regexReplaceAll(c: String, pat: String, repl: String) =
    s"regexp_replace($c, '$pat', '$repl', 'g')"
  def regexCount(c: String, pat: String) =
    s"CAST(len(regexp_extract_all($c, '$pat')) AS BIGINT)"
  protected def utf8Decode(blob: String) = s"decode($blob)"
  def byteLen(x: String) = s"octet_length(encode($x))"
  def hexBytes(x: String) = s"hex(encode($x))"
  def strAggSorted(c: String) = s"string_agg($c, '' ORDER BY $c)"
}
