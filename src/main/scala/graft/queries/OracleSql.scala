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
