package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, MapType, StringType}
import scala.jdk.CollectionConverters._

import graft.core.Tables

/** Scalar-function families, SURVEY.md §2 B8 — one composite oracle query per
  * family. Every Spark↔DuckDB function pair below was probed empirically
  * (SURVEY §7.5.6); known divergences handled in the oracle SQL:
  *  - DuckDB `^` is power, not xor → `xor(a,b)`;
  *  - DuckDB ceil/floor(double) return DOUBLE, Spark returns BIGINT → cast;
  *  - DuckDB date_trunc on timestamp returns DATE for day+ units → cast;
  *  - DuckDB dayofweek is 0=Sunday, Spark is 1=Sunday → +1;
  *  - DuckDB regexp_replace is first-match unless 'g' → pass 'g';
  *  - round() on doubles differs at ties → never used in oracle outputs.
  */
object Scalars {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "fn_string" -> ((s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        lower(col("p_name")).as("lower_name"),
        upper(col("p_brand")).as("upper_brand"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 5).as("name_pfx"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("padded_key"),
        regexp_replace(col("p_name"), "[aeiou]", "*").as("starred"),
        translate(col("p_name"), "abc", "xyz").as("translated"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"),
        element_at(split(col("p_name"), " "), 1).as("first_word"))
        .orderBy("p_partkey")),

    // Regex family — Java regex vs DuckDB's RE2 agree on this conservative
    // subset (char classes, groups, bounded quantifiers); avoid lookaround/
    // backrefs, which RE2 rejects. Verified identical on fixture data.
    "fn_regex" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        regexp_extract(col("text"), "([a-z]+)r", 1).as("before_r"),
        regexp_replace(col("text"), "[aeiou]", "_").as("devoweled"),
        regexp_count(col("text"), lit("th[a-z]*")).as("n_th"),
        col("text").rlike("(spark|batch) [a-z]{3,5} ").as("has_pattern"))
        .orderBy("doc_id")),

    // Digest family: md5 / sha2-256 hex digests match DuckDB's md5/sha256
    // byte-for-byte (lowercase hex of the same standard functions). The
    // engine-native 64-bit hashes (xxhash64, murmur) are deliberately NOT
    // oracle'd — they are impl-specific; their uses (dedup digests, token
    // ids) only need self-consistency, which the dedup oracles already gate.
    "fn_hash" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        md5(encode(col("text"), "UTF-8")).as("md5_hex"),
        sha2(encode(col("text"), "UTF-8"), 256).as("sha256_hex"),
        substring(md5(encode(col("lang"), "UTF-8")), 1, 8).as("lang_bucket"))
        .orderBy("doc_id")),

    "fn_datetime" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        year(col("ts")).as("yr"),
        month(col("ts")).as("mo"),
        dayofmonth(col("ts")).as("dom"),
        hour(col("ts")).as("hr"),
        minute(col("ts")).as("mi"),
        dayofweek(col("ts")).as("dow"),
        date_trunc("day", col("ts")).as("day_start"),
        date_trunc("month", col("ts")).as("month_start"),
        make_date(year(col("ts")), month(col("ts")), lit(1)).as("month_date"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
          .as("days_since"),
        unix_micros(col("ts")).as("epoch_us"))
        .orderBy("event_id")),

    "fn_math" -> ((s, d) =>
      Tables.customer(s, d).select(
        col("c_custkey"),
        abs(col("c_acctbal")).as("abs_bal"),
        signum(col("c_acctbal")).as("sign_bal"),
        ceil(col("c_acctbal")).as("ceil_bal"),
        floor(col("c_acctbal")).as("floor_bal"),
        sqrt(abs(col("c_acctbal"))).as("sqrt_bal"),
        // x*x, not pow(x,2): Math.pow and libm differ in the last ulp on a
        // few rows per ten thousand (caught by an sf0.1 oracle stress run);
        // plain multiplication is exactly-rounded and portable
        (col("c_acctbal") * col("c_acctbal")).as("bal_sq"),
        // ln()/log10() dropped from oracle output: JVM Math.log{,10} and
        // DuckDB's libm disagree in the last ulp on a few rows per thousand.
        // They are covered by ScalaTest instead (exactness is not portable).
        greatest(col("c_acctbal"), lit(0.0)).as("clamped_lo"),
        least(col("c_acctbal"), lit(5000.0)).as("clamped_hi"))
        .orderBy("c_custkey")),

    "fn_conditional" -> ((s, d) =>
      Tables.customer(s, d).select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "overdrawn")
          .when(col("c_acctbal") < 5000, "standard")
          .otherwise("premium").as("tier"),
        coalesce(nullif(col("c_mktsegment"), lit("MACHINERY")), lit("OTHER"))
          .as("segment_or_other"),
        when(col("c_nationkey") % 2 === 0, col("c_acctbal"))
          .otherwise(-col("c_acctbal")).as("signed_bal"),
        (col("c_acctbal").isNull).as("bal_missing"))
        .orderBy("c_custkey")),

    "fn_array" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        size(split(col("text"), " ")).as("n_tokens"),
        size(array_distinct(split(col("text"), " "))).as("n_distinct_tokens"),
        array_contains(split(col("text"), " "), "data").as("has_data"),
        array_join(slice(sort_array(array_distinct(split(col("text"), " "))), 1, 3), " ")
          .as("first3_sorted"),
        array_max(transform(split(col("text"), " "), x => length(x)))
          .as("max_token_len"),
        aggregate(split(col("text"), " "), lit(0),
          (acc, x) => acc + length(x)).as("total_chars"))
        .orderBy("doc_id")),

    "fn_map" -> ((s, d) => {
      val m = from_json(col("props"), MapType(StringType, IntegerType))
      Tables.events(s, d).select(
        col("event_id"),
        element_at(m, "k").as("k_value"),
        array_join(map_keys(m), ",").as("keys"),
        size(m).as("n_entries"))
        .orderBy("event_id")
    }),

    "fn_json" -> ((s, d) => {
      val parsed = from_json(col("props"),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k", IntegerType))))
      Tables.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        parsed.getField("k").as("k_int"),
        (parsed.getField("k") % 10).as("k_mod"))
        .orderBy("event_id")
    }),

    // XML parse (B1.2-adjacent engine surface — Spark 4 ships the XML
    // reader/functions natively): serialize row fields to an XML
    // fragment and parse them BACK through from_xml with an explicit
    // schema — the oracle is the identity on the source columns plus a
    // roundtrip_ok flag the Spark side must EARN (a parse failure or
    // type coercion drift yields false/NULL and the hash diverges;
    // DuckDB has no XML, so round-trip identity is exactly the
    // cross-engine-checkable contract). Map-only.
    "fn_xml" -> ((s, d) => {
      val xml = concat(lit("<r><u>"), col("user_id"), lit("</u><t>"),
        col("event_type"), lit("</t></r>"))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("u",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("t",
          org.apache.spark.sql.types.StringType)))
      val parsed = from_xml(xml, schema)
      Tables.events(s, d).select(
        col("event_id"),
        parsed.getField("u").as("u_rt"),
        parsed.getField("t").as("t_rt"),
        (parsed.getField("u") === col("user_id") &&
          parsed.getField("t") === col("event_type")).as("roundtrip_ok"))
        .orderBy("event_id")
    }),

    // CSV parse (B1.2 — the scan path a real user hits second, after
    // parquet, finally ORACLED): serialize typed row fields to ONE CSV
    // line in-query (to_csv) and parse them BACK through from_csv under
    // an explicit schema — the fn_xml round-trip posture. The tag column
    // embeds a LITERAL COMMA so the line genuinely exercises quoting
    // (to_csv quotes it, from_csv must unquote), and the timestamp
    // round-trips at MICROSECOND precision via an explicit
    // timestampFormat on both sides (the default millis format would
    // silently truncate). The oracle is the identity on the source
    // columns plus a roundtrip_ok flag the Spark side must EARN — a
    // quoting bug, type coercion drift, or format truncation yields
    // false/NULL and the hash diverges. Map-only, codegen-friendly.
    "fn_csv" -> ((s, d) => {
      val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
      val opts = Map("timestampFormat" -> fmt)
      val line = to_csv(struct(
        col("l_orderkey").as("k"),
        col("l_linenumber").as("ln"),
        concat(col("l_returnflag"), lit(","), col("l_linestatus"))
          .as("tag"),
        col("l_quantity").as("qty"),
        col("l_shipdate").cast("timestamp").as("ship")), opts.asJava)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ln", IntegerType),
        org.apache.spark.sql.types.StructField("tag",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("qty",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("ship",
          org.apache.spark.sql.types.TimestampType)))
      val p = from_csv(line, schema, opts)
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        p.getField("k").as("k_rt"),
        p.getField("ln").as("ln_rt"),
        p.getField("tag").as("tag_rt"),
        p.getField("qty").as("qty_rt"),
        p.getField("ship").as("ship_rt"),
        (p.getField("k") === col("l_orderkey") &&
          p.getField("ln") === col("l_linenumber") &&
          p.getField("tag") === concat(col("l_returnflag"), lit(","),
            col("l_linestatus")) &&
          p.getField("qty") === col("l_quantity") &&
          p.getField("ship") === col("l_shipdate").cast("timestamp"))
          .as("roundtrip_ok"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // JSON serialize→parse round trip (B1.2's other half — fn_json
    // covers EXTRACTION from pre-existing JSON; this key covers the
    // WRITE side feeding the read side): to_json over a struct that
    // includes the props column — a JSON document EMBEDDED AS A STRING
    // VALUE, so the serializer must escape its quotes and the parser
    // must unescape them exactly — then from_json under an explicit
    // schema. Identity oracle + earned roundtrip_ok, map-only.
    "fn_json_rt" -> ((s, d) => {
      val js = to_json(struct(
        col("event_id").as("id"),
        col("user_id").as("u"),
        col("event_type").as("t"),
        col("props").as("p")))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("u",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("t",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("p",
          org.apache.spark.sql.types.StringType)))
      val p = from_json(js, schema)
      Tables.events(s, d).select(
        col("event_id"),
        p.getField("u").as("u_rt"),
        p.getField("t").as("t_rt"),
        p.getField("p").as("props_rt"),
        (p.getField("id") === col("event_id") &&
          p.getField("u") === col("user_id") &&
          p.getField("t") === col("event_type") &&
          p.getField("p") === col("props")).as("roundtrip_ok"))
        .orderBy("event_id")
    }),

    // Spark 4 VARIANT (B8 + engine surface): parse the JSON props ONCE
    // into the shredded binary form, then every access is a typed
    // variant_get — no per-access string re-parse, the semi-structured
    // path a 100 TB telemetry table actually uses (and what Parquet
    // variant shredding serves columnar). The per-type rollup
    // aggregates variant-extracted LONGs — exact integers, hash-exact
    // against DuckDB's json_extract casts; try_variant_get covers the
    // missing-path→NULL contract in the same projection.
    "fn_variant" -> ((s, d) => {
      val v = parse_json(col("props"))
      Tables.events(s, d)
        .select(col("event_type"),
          variant_get(v, "$.k", "long").as("k"),
          try_variant_get(v, "$.missing", "long").as("absent"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          count(col("absent")).as("n_absent"))
        .orderBy("event_type")
    }),

    "fn_bitip" -> ((s, d) => {
      val ip = lit(167772160L) + (col("user_id") % 256) * 256 + (col("event_id") % 256)
      Tables.events(s, d).select(
        col("event_id"),
        col("event_id").bitwiseAND(lit(255L)).as("lo_byte"),
        col("event_id").bitwiseOR(lit(16L)).as("with_flag"),
        col("event_id").bitwiseXOR(lit(255L)).as("xored"),
        expr("~event_id").as("inverted"),
        shiftleft(col("event_id"), 2).as("shl2"),
        shiftright(col("event_id"), 3).as("shr3"),
        concat_ws(".",
          shiftright(ip, 24).bitwiseAND(lit(255L)),
          shiftright(ip, 16).bitwiseAND(lit(255L)),
          shiftright(ip, 8).bitwiseAND(lit(255L)),
          ip.bitwiseAND(lit(255L))).as("src_ip_str"))
        .orderBy("event_id")
    }),

    // Morton/Z-value of two bucketed key dimensions — the clustering key
    // under [[graft.core.Layout.writeZOrdered]] (B1.7); declared so the
    // bit interleave that decides row-group pruning is itself
    // oracle-checked, not just spec'd. Pure BIGINT shift/and/or tree.
    "fn_zorder" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        pmod(col("o_custkey"), lit(256)).cast("long").as("za"),
        pmod(col("o_orderkey"), lit(256)).cast("long").as("zb"))
        .withColumn("z",
          graft.core.Layout.zValue(col("za"), col("zb"), 8))
        .orderBy("o_orderkey")),

    // Hilbert index of the same bucketed dimensions — the CONTINUOUS
    // clustering key under [[graft.core.Layout.writeHilbert]] (B1.7);
    // declared so the rotation/reflection loop that decides row-group
    // pruning is oracle-checked against the identical per-level
    // arithmetic generated as SQL (Layout.hilbertSql — one source).
    "fn_hilbert" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        pmod(col("o_custkey"), lit(256)).cast("long").as("ha"),
        pmod(col("o_orderkey"), lit(256)).cast("long").as("hb"))
        .withColumn("h",
          graft.core.Layout.hValue(col("ha"), col("hb"), 8))
        .orderBy("o_orderkey")),

    // N-dimensional Hilbert index (round 16, B1.8): the Skilling
    // transform that clusters a 3-column layout
    // ([[graft.core.Layout.writeHilbertN]]), oracle-checked bit-exact
    // against the identical per-step arithmetic generated as SQL
    // (Layout.hilbertNSql — one source, like fn_hilbert's 2-D chain).
    "fn_hilbert_nd" -> ((s, d) =>
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        pmod(col("l_orderkey"), lit(64)).cast("long").as("ha"),
        pmod(col("l_partkey"), lit(64)).cast("long").as("hb"),
        pmod(col("l_suppkey"), lit(64)).cast("long").as("hc"))
        .withColumn("h", graft.core.Layout.hValueN(
          Seq(col("ha"), col("hb"), col("hc")), 6))
        .orderBy("l_orderkey", "l_linenumber"))
  )

  def oracleSql: Map[String, String] = Map(
    "fn_hash" ->
      """SELECT doc_id,
        |  md5(text) AS md5_hex,
        |  sha256(text) AS sha256_hex,
        |  substring(md5(lang), 1, 8) AS lang_bucket
        |FROM documents ORDER BY doc_id""".stripMargin,

    "fn_regex" ->
      """SELECT doc_id,
        |  regexp_extract(text, '([a-z]+)r', 1) AS before_r,
        |  regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled,
        |  CAST(len(regexp_extract_all(text, 'th[a-z]*')) AS INTEGER) AS n_th,
        |  regexp_matches(text, '(spark|batch) [a-z]{3,5} ') AS has_pattern
        |FROM documents ORDER BY doc_id""".stripMargin,

    "fn_string" ->
      """SELECT p_partkey,
        |  lower(p_name) AS lower_name,
        |  upper(p_brand) AS upper_brand,
        |  length(p_name) AS name_len,
        |  substring(p_name, 1, 5) AS name_pfx,
        |  concat_ws('-', p_brand, p_type) AS brand_type,
        |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key,
        |  regexp_replace(p_name, '[aeiou]', '*', 'g') AS starred,
        |  translate(p_name, 'abc', 'xyz') AS translated,
        |  trim('  ' || p_name || '  ') AS trimmed,
        |  string_split(p_name, ' ')[1] AS first_word
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_datetime" ->
      """SELECT event_id,
        |  year(ts) AS yr, month(ts) AS mo, day(ts) AS dom,
        |  hour(ts) AS hr, minute(ts) AS mi,
        |  dayofweek(ts) + 1 AS dow,
        |  CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
        |  CAST(date_trunc('month', ts) AS TIMESTAMP) AS month_start,
        |  make_date(year(ts), month(ts), 1) AS month_date,
        |  datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days_since,
        |  epoch_us(ts) AS epoch_us
        |FROM events ORDER BY event_id""".stripMargin,

    "fn_math" ->
      """SELECT c_custkey,
        |  abs(c_acctbal) AS abs_bal,
        |  CAST(sign(c_acctbal) AS DOUBLE) AS sign_bal,
        |  CAST(ceil(c_acctbal) AS BIGINT) AS ceil_bal,
        |  CAST(floor(c_acctbal) AS BIGINT) AS floor_bal,
        |  sqrt(abs(c_acctbal)) AS sqrt_bal,
        |  c_acctbal * c_acctbal AS bal_sq,
        |  greatest(c_acctbal, 0.0) AS clamped_lo,
        |  least(c_acctbal, 5000.0) AS clamped_hi
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "fn_conditional" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'overdrawn'
        |       WHEN c_acctbal < 5000 THEN 'standard'
        |       ELSE 'premium' END AS tier,
        |  COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment_or_other,
        |  CASE WHEN c_nationkey % 2 = 0 THEN c_acctbal ELSE -c_acctbal END
        |    AS signed_bal,
        |  c_acctbal IS NULL AS bal_missing
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "fn_array" ->
      """SELECT doc_id,
        |  CAST(length(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |  CAST(length(list_distinct(string_split(text, ' '))) AS INTEGER)
        |    AS n_distinct_tokens,
        |  list_contains(string_split(text, ' '), 'data') AS has_data,
        |  array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ' ')
        |    AS first3_sorted,
        |  CAST(list_max(list_transform(string_split(text, ' '), x -> length(x)))
        |    AS INTEGER) AS max_token_len,
        |  CAST(list_sum(list_transform(string_split(text, ' '), x -> length(x)))
        |    AS INTEGER) AS total_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    "fn_map" ->
      """SELECT event_id,
        |  CAST(json_extract(props, '$.k') AS INTEGER) AS k_value,
        |  'k' AS keys,
        |  1 AS n_entries
        |FROM events ORDER BY event_id""".stripMargin,

    "fn_json" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
        |  CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS k_mod
        |FROM events ORDER BY event_id""".stripMargin,

    "fn_xml" ->
      """SELECT event_id, user_id AS u_rt, event_type AS t_rt,
        |  true AS roundtrip_ok
        |FROM events ORDER BY event_id""".stripMargin,

    "fn_csv" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_orderkey AS k_rt,
        |  l_linenumber AS ln_rt,
        |  l_returnflag || ',' || l_linestatus AS tag_rt,
        |  l_quantity AS qty_rt,
        |  l_shipdate AS ship_rt,
        |  true AS roundtrip_ok
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "fn_json_rt" ->
      """SELECT event_id,
        |  user_id AS u_rt,
        |  event_type AS t_rt,
        |  props AS props_rt,
        |  true AS roundtrip_ok
        |FROM events ORDER BY event_id""".stripMargin,

    "fn_variant" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS sum_k,
        |  CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS min_k,
        |  CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS max_k,
        |  COUNT(CAST(json_extract(props, '$.missing') AS BIGINT))
        |    AS n_absent
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "fn_bitip" ->
      """SELECT event_id,
        |  event_id & 255 AS lo_byte,
        |  event_id | 16 AS with_flag,
        |  xor(event_id, 255) AS xored,
        |  ~event_id AS inverted,
        |  event_id << 2 AS shl2,
        |  event_id >> 3 AS shr3,
        |  concat_ws('.', (ip >> 24) & 255, (ip >> 16) & 255, (ip >> 8) & 255,
        |    ip & 255) AS src_ip_str
        |FROM (SELECT event_id,
        |  167772160 + (user_id % 256) * 256 + (event_id % 256) AS ip
        |  FROM events) ORDER BY event_id""".stripMargin,

    // the identical interleave, spliced from Layout.zValueSql — one
    // source for the Spark tree and the oracle arithmetic
    "fn_zorder" ->
      s"""SELECT o_orderkey, za, zb,
        |  ${graft.core.Layout.zValueSql("za", "zb", 8)} AS z
        |FROM (SELECT o_orderkey,
        |    o_custkey % 256 AS za, o_orderkey % 256 AS zb
        |  FROM orders) ORDER BY o_orderkey""".stripMargin,

    // the identical per-level rotation arithmetic, generated from
    // Layout.hilbertSql — one source for the kernel loop and the oracle
    "fn_hilbert" ->
      (graft.core.Layout.hilbertSql("ha", "hb", 8,
        Seq("o_orderkey", "ha", "hb"),
        """(SELECT o_orderkey,
          |    o_custkey % 256 AS ha, o_orderkey % 256 AS hb
          |  FROM orders)""".stripMargin, "h") + " ORDER BY o_orderkey"),

    // the identical Skilling per-step arithmetic, generated from
    // Layout.hilbertNSql — one source for the kernel and the oracle
    "fn_hilbert_nd" ->
      (graft.core.Layout.hilbertNSql(Seq("ha", "hb", "hc"), 6,
        Seq("l_orderkey", "l_linenumber", "ha", "hb", "hc"),
        """(SELECT l_orderkey, l_linenumber,
          |    l_orderkey % 64 AS ha, l_partkey % 64 AS hb,
          |    l_suppkey % 64 AS hc
          |  FROM lineitem)""".stripMargin, "h") +
        " ORDER BY l_orderkey, l_linenumber")
  )
}
