package graft.queries

/** Shared DuckDB oracle SQL fragments.
  *
  * These emulate graft-native expressions in the verification engine; they
  * exist so each emulation has exactly one definition to audit.
  */
private[queries] object OracleSql {

  /** DuckDB emulation of Java `String.hashCode` over `expr`.
    *
    * Java hashes **UTF-16 code units**, while DuckDB's `ord` yields Unicode
    * codepoints, so supplementary-plane characters (emoji etc.) must be
    * split into their surrogate pair before the 31-ary fold — otherwise the
    * oracle diverges from [[graft.functions.JavaHashCode]] on any non-BMP
    * input. The fold runs mod 2^64-truncation-free HUGEINT with a manual
    * `% 2^32` per step; callers map the unsigned result back to INT range.
    */
  /** DuckDB emulation of Spark `conv(substring(md5(expr), 1, 8), 16, 10)`:
    * the first 8 hex chars of the md5 digest folded to a BIGINT in
    * [0, 2^32) — the deterministic uniform behind A-ES weighted sampling
    * ([[graft.ops.Sampling.weightedSample]]). Both engines print md5 as
    * lowercase hex, so a per-char `strpos` fold reproduces the value
    * bit-exactly.
    */
  def md5U32Sql(expr: String): String =
    s"""list_reduce(list_prepend(0::BIGINT,
       |    list_transform(range(1, 9), i ->
       |      CAST(strpos('0123456789abcdef', md5($expr)[i]) - 1 AS BIGINT))),
       |  (a, b) -> a * 16 + b)""".stripMargin

  /** 60-bit variant of [[md5U32Sql]] (first 15 hex chars → [0, 2^60), which
    * fits signed BIGINT on both engines) — the winnowing fingerprint
    * uniform, where 32 bits birthday-collide at corpus scale.
    */
  def md5U60Sql(expr: String): String =
    s"""list_reduce(list_prepend(0::BIGINT,
       |    list_transform(range(1, 16), i ->
       |      CAST(strpos('0123456789abcdef', md5($expr)[i]) - 1 AS BIGINT))),
       |  (a, b) -> a * 16 + b)""".stripMargin

  def javaHashSql(expr: String): String =
    s"""list_reduce(list_prepend(0::HUGEINT,
       |    flatten(list_transform(range(1, length($expr)+1), i ->
       |      CASE WHEN ord(($expr)[i]) <= 65535
       |           THEN [ord(($expr)[i])::HUGEINT]
       |           ELSE [(55296 + (ord(($expr)[i]) - 65536) // 1024)::HUGEINT,
       |                 (56320 + (ord(($expr)[i]) - 65536) % 1024)::HUGEINT]
       |      END))),
       |  (a, b) -> (a*31 + b) % 4294967296)""".stripMargin
}
