package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** SURVEY §2b group G — scalar function surface.
  *
  * Everything here is `org.apache.spark.sql.functions._` built-ins —
  * codegen'd, no UDF in the hot path. Where Spark and DuckDB could
  * legitimately disagree on floating point (libm log etc.) the output is
  * rounded; where they can't (IEEE sqrt, single multiply), raw values.
  */
object ScalarQueries {

  /** G: string functions. */
  val g1String = Q(
    "g1_string_fns",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "part")
        .select(
          $"p_partkey",
          lower($"p_name").as("lo"),
          upper($"p_brand").as("up"),
          substring($"p_name", 1, 5).as("pfx"),
          concat_ws("-", $"p_brand", $"p_type").as("cat"),
          trim(concat(lit("  "), $"p_name", lit("  "))).as("trimmed"),
          length($"p_name").as("len"),
          size(split($"p_name", " ")).as("n_words"),
          regexp_extract($"p_name", "([a-z]+)", 1).as("first_word"),
          regexp_replace($"p_type", "[AEIOU]", "_").as("devowel"))
        .orderBy($"p_partkey")
    },
    Some("""SELECT p_partkey, lower(p_name) AS lo, upper(p_brand) AS up,
                   substring(p_name, 1, 5) AS pfx,
                   concat_ws('-', p_brand, p_type) AS cat,
                   trim('  ' || p_name || '  ') AS trimmed,
                   length(p_name) AS len,
                   CAST(len(string_split(p_name, ' ')) AS INT) AS n_words,
                   regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
                   regexp_replace(p_type, '[AEIOU]', '_', 'g') AS devowel
            FROM part ORDER BY p_partkey"""))

  /** G: date/time functions (dates rendered as strings — engines encode
    * parquet timestamps differently, strings compare exactly). */
  val g2Datetime = Q(
    "g2_datetime_fns",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .select(
          $"o_orderkey",
          date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM-dd").as("month_start"),
          year($"o_orderdate").as("yr"),
          quarter($"o_orderdate").as("qtr"),
          month($"o_orderdate").as("mo"),
          dayofmonth($"o_orderdate").as("dom"),
          datediff(lit("1998-12-31").cast("date"), $"o_orderdate".cast("date")).as("days_left"),
          date_format(add_months($"o_orderdate", 3), "yyyy-MM-dd").as("plus3mo"))
        .orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey,
                   strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
                   CAST(extract(year FROM o_orderdate) AS INT) AS yr,
                   CAST(quarter(o_orderdate) AS INT) AS qtr,
                   CAST(extract(month FROM o_orderdate) AS INT) AS mo,
                   CAST(extract(day FROM o_orderdate) AS INT) AS dom,
                   CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS INT) AS days_left,
                   strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3mo
            FROM orders ORDER BY o_orderkey"""))

  /** G: math + conditional. sqrt is IEEE-exact in both engines; ln is
    * libm-dependent so it's rounded; x*x beats pow(x,2) for
    * reproducibility. */
  val g3MathCond = Q(
    "g3_math_cond",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "customer")
        .select(
          $"c_custkey",
          round(abs($"c_acctbal"), 1).as("abs_bal"),
          round($"c_acctbal" * $"c_acctbal", 4).as("sq_bal"),
          round(sqrt(abs($"c_acctbal")), 6).as("sqrt_bal"),
          round(log(abs($"c_acctbal") + 1), 6).as("ln_bal"),
          ($"c_custkey" % 7).as("mod7"),
          when($"c_acctbal" < 0, "neg")
            .when($"c_acctbal" < 5000, "mid")
            .otherwise("high").as("bal_class"),
          coalesce(nullif($"c_mktsegment", lit("AUTOMOBILE")), lit("CAR")).as("seg"),
          greatest($"c_custkey", $"c_nationkey".cast("long")).as("gk"),
          least($"c_custkey", $"c_nationkey".cast("long")).as("lk"))
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey,
                   round(abs(c_acctbal), 1) AS abs_bal,
                   round(c_acctbal * c_acctbal, 4) AS sq_bal,
                   round(sqrt(abs(c_acctbal)), 6) AS sqrt_bal,
                   round(ln(abs(c_acctbal) + 1), 6) AS ln_bal,
                   c_custkey % 7 AS mod7,
                   CASE WHEN c_acctbal < 0 THEN 'neg'
                        WHEN c_acctbal < 5000 THEN 'mid'
                        ELSE 'high' END AS bal_class,
                   coalesce(nullif(c_mktsegment, 'AUTOMOBILE'), 'CAR') AS seg,
                   greatest(c_custkey, CAST(c_nationkey AS BIGINT)) AS gk,
                   least(c_custkey, CAST(c_nationkey AS BIGINT)) AS lk
            FROM customer ORDER BY c_custkey"""))

  /** G: array + map functions over tokenized text. */
  val g4ArrayMap = Q(
    "g4_array_map",
    (s, dir) => {
      import s.implicits._
      val toks = split($"text", " ")
      Tables(s, dir, "documents")
        .select(
          $"doc_id",
          size(toks).as("n_tokens"),
          array_contains(toks, "the").cast("int").as("has_the"),
          element_at(toks, 2).as("second_tok"),
          concat_ws(" ", slice(toks, 1, 3)).as("first3"),
          array_max(transform(toks, t => length(t))).as("max_tok_len"),
          concat_ws(",", map_keys(map(lit("a"), $"n_chars", lit("b"), $"doc_id"))).as("mkeys"),
          element_at(map(lit("a"), $"n_chars", lit("b"), $"doc_id"), "a").as("mval"))
        .orderBy($"doc_id")
    },
    Some("""SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
                   CAST(list_contains(string_split(text, ' '), 'the') AS INT) AS has_the,
                   string_split(text, ' ')[2] AS second_tok,
                   array_to_string(string_split(text, ' ')[1:3], ' ') AS first3,
                   CAST(list_max(list_transform(string_split(text, ' '), t -> length(t))) AS INT) AS max_tok_len,
                   array_to_string(map_keys(map(['a','b'], [n_chars, doc_id])), ',') AS mkeys,
                   n_chars AS mval
            FROM documents ORDER BY doc_id"""))

  /** G: JSON extraction over events.props. */
  val g5Json = Q(
    "g5_json",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        // single-row-group scan = one task; JSON parsing is per-row CPU
        .repartition(s.sparkContext.defaultParallelism, $"event_id")
        .select(
          $"event_id",
          coalesce(get_json_object($"props", "$.k").cast("long"), lit(-1L)).as("k_path"),
          coalesce(
            from_json($"props", org.apache.spark.sql.types.StructType.fromDDL("k LONG"))
              .getField("k"),
            lit(-1L)).as("k_struct"))
        .orderBy($"event_id")
    },
    Some("""SELECT event_id,
                   coalesce(CAST(json_extract_string(props, '$.k') AS BIGINT), -1) AS k_path,
                   coalesce(CAST(json_extract_string(props, '$.k') AS BIGINT), -1) AS k_struct
            FROM events ORDER BY event_id"""))

  /** G: bitwise ops (the §2a#4 dependency surface). */
  val g6Bitwise = Q(
    "g6_bitwise",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "supplier")
        .select(
          $"s_suppkey",
          $"s_suppkey".bitwiseAND(15L).as("and15"),
          $"s_suppkey".bitwiseOR(8L).as("or8"),
          $"s_suppkey".bitwiseXOR(5L).as("xor5"),
          shiftleft($"s_suppkey", 2).as("shl2"),
          shiftright($"s_suppkey", 1).as("shr1"))
        .orderBy($"s_suppkey")
    },
    Some("""SELECT s_suppkey,
                   s_suppkey & 15 AS and15,
                   s_suppkey | 8 AS or8,
                   xor(s_suppkey, 5) AS xor5,
                   s_suppkey << 2 AS shl2,
                   s_suppkey >> 1 AS shr1
            FROM supplier ORDER BY s_suppkey"""))

  /** G: NULL semantics — fixtures carry no NULLs, so nullif manufactures
    * them; exercises IS NULL, null-safe equality (<=>), coalesce/nvl. */
  val g7NullSemantics = Q(
    "g7_null_semantics",
    (s, dir) => {
      import s.implicits._
      val st = expr("nullif(o_orderstatus, 'O')")
      Tables(s, dir, "orders")
        .select(
          $"o_orderkey",
          coalesce(st, lit("open")).as("status_or_open"),
          isnull(st).cast("int").as("is_open"),
          expr("nullif(o_orderstatus, 'O') <=> 'F'").cast("int").as("null_safe_is_f"),
          expr("nvl(nullif(o_orderpriority, '1-URGENT'), 'was-urgent')").as("prio_or_flag"))
        .orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey,
                   coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
                   CAST(nullif(o_orderstatus, 'O') IS NULL AS INT) AS is_open,
                   CAST(nullif(o_orderstatus, 'O') IS NOT DISTINCT FROM 'F' AS INT) AS null_safe_is_f,
                   coalesce(nullif(o_orderpriority, '1-URGENT'), 'was-urgent') AS prio_or_flag
            FROM orders ORDER BY o_orderkey"""))

  def all: Seq[Q] = Seq(
    g1String, g2Datetime, g3MathCond, g4ArrayMap, g5Json, g6Bitwise,
    g7NullSemantics)
}
