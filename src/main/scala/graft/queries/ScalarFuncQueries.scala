package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{GapFillers, GeoFunctions}

/** §2.9 scalar function surface (SqlFuncTest.scala:52-505): one battery
  * query per family — arithmetic, string, temporal, conditional/logic,
  * JSON, geo — plus the gap-fillers (split_index, BETWEEN SYMMETRIC,
  * OVERLAPS).
  *
  * Cross-engine determinism rules:
  *   - +,-,*,/,floor,ceil,abs,sqrt,mod,sign: bit-exact IEEE → raw.
  *   - transcendental (ln/exp/log/pow/sin/cos/atan2): libm differs in
  *     the last ulp between JVM and C → round(x, 6) on both sides.
  *   - dayofweek: Spark is 1=Sunday, DuckDB 0=Sunday → oracle adds 1.
  *   - no Scala UDFs anywhere — every expression is codegen'd.
  */
object ScalarFuncQueries extends GroupBase {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // arithmetic battery (SqlFuncTest.scala:139-221)
    "fn_math" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        abs(col("p_size").cast("long") - 25).as("abs_v"),
        (col("p_size") % 7).as("mod_v"),
        signum(col("p_size").cast("long") - 25).as("sign_v"),
        floor(col("p_retailprice")).as("floor_v"),
        ceil(col("p_retailprice")).as("ceil_v"),
        // round() on raw doubles is a cross-engine trap (Spark rounds the
        // shortest decimal repr, DuckDB the binary value) — go through
        // DECIMAL where ties are exact and HALF_UP on both engines.
        round(col("p_retailprice").cast("decimal(12,2)"), 1).cast("double").as("round_v"),
        (floor(col("p_retailprice") * 100) / 100).as("trunc_v"),
        round(sqrt(col("p_retailprice")), 6).as("sqrt_v"),
        round(log(col("p_retailprice") + 1), 6).as("ln_v"),
        round(log10(col("p_retailprice") + 1), 6).as("log10_v"),
        round(exp(col("p_size") / lit(10.0)), 6).as("exp_v"),
        round(pow(col("p_size"), 2), 6).as("pow_v"),
        round(sin(col("p_size")), 6).as("sin_v"),
        round(cos(col("p_size")), 6).as("cos_v"),
        round(atan(col("p_size")), 6).as("atan_v"),
        round(lit(1.0) / nullif(tan(col("p_size")), lit(0.0)), 6).as("cot_v"),
        round(lit(Math.E), 6).as("e_v"),
        round(degrees(col("p_size") / lit(100.0)), 6).as("deg_v"),
        round(radians(col("p_size")), 6).as("rad_v"),
        round(lit(Math.PI), 6).as("pi_v"),
        hex(col("p_partkey")).as("hex_v"),
        bin(col("p_partkey")).as("bin_v"))
        .orderBy("p_partkey")),

    // string battery (SqlFuncTest.scala:224-293)
    "fn_string" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_brand")).as("lo"),
        length(col("p_name")).as("len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("cw"),
        substring(col("p_name"), 2, 3).as("sub"),
        regexp_replace(col("p_name"), "[aeiou]", "*").as("rr"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("rx"),
        lpad(col("p_brand"), 12, "#").as("lp"),
        rpad(col("p_brand"), 12, "#").as("rp"),
        trim(lit("  pad  ")).as("tr"),
        reverse(col("p_brand")).as("rev"),
        substring(col("p_name"), 1, 4).as("left4"),
        col("p_name").substr(length(col("p_name")) - 3, lit(4)).as("right4"),
        repeat(col("p_brand"), 2).as("rep"),
        GapFillers.splitIndex(col("p_name"), " ", 1).as("tok1"),
        ascii(col("p_brand")).as("asc"),
        chr(lit(65) + (col("p_partkey") % 26)).as("ch"),
        instr(col("p_name"), "a").as("pos_a"),
        translate(col("p_name"), "abc", "xyz").as("tl"),
        initcap(col("p_name")).as("ic"),
        md5(col("p_name")).as("h_md5"),
        sha2(col("p_name"), 256).as("h_sha"),
        base64(col("p_name").cast("binary")).as("b64"),
        replace(col("p_type"), lit("SMALL"), lit("S")).as("repl"))
        .orderBy("p_partkey")),

    // temporal battery (SqlFuncTest.scala:296-505)
    "fn_temporal" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        dayofweek(col("o_orderdate")).as("dow"),
        dayofyear(col("o_orderdate")).as("doy"),
        quarter(col("o_orderdate")).as("q"),
        date_trunc("month", col("o_orderdate")).as("mon_start"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
        last_day(col("o_orderdate")).as("eom"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("dd"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH").as("fmt"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        (col("o_orderdate") + expr("INTERVAL 5 HOUR")).as("plus5h"),
        floor((unix_timestamp(col("o_orderdate")) -
               unix_timestamp(lit("1995-01-01 00:00:00").cast("timestamp"))) / 3600)
          .as("hours_since"),
        GapFillers.overlaps(
          col("o_orderdate"), col("o_orderdate") + expr("INTERVAL 10 DAY"),
          lit("1998-01-01").cast("timestamp"), lit("1998-06-01").cast("timestamp"))
          .as("overlaps_98h1"))
        .orderBy("o_orderkey")),

    // conditional / logic battery (SqlFuncTest.scala:52-136)
    "fn_conditional" -> ((s, d) =>
      t(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        nullif(col("l_discount"), lit(0.0)).as("nz_disc"),
        coalesce(nullif(col("l_discount"), lit(0.0)), lit(-1.0)).as("co"),
        greatest(col("l_tax"), col("l_discount")).as("gr"),
        least(col("l_tax"), col("l_discount")).as("le"),
        (col("l_quantity") > 25 && col("l_discount") > 0.05).as("andv"),
        (col("l_returnflag") === "A" || col("l_linestatus") === "O").as("orv"),
        (!(col("l_quantity") > 25)).as("notv"),
        col("l_quantity").between(10, 20).as("btw"),
        GapFillers.betweenSymmetric(col("l_quantity"), lit(20), lit(10)).as("btw_sym"),
        col("l_returnflag").isin("A", "N").as("inlist"),
        lit(null).cast("string").isNull.as("isnull_v"))
        .orderBy("l_orderkey", "l_linenumber")),

    // JSON battery (QueryTest.scala:3 fastjson idiom; format=json
    // connectors → from_json/get_json_object)
    "fn_json" -> ((s, d) =>
      t(s, d, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"),
        from_json(col("props"), lit("k LONG")).getField("k").as("k_struct"))
        .orderBy("event_id")),

    // conversion battery: str_to_map, parse_url, unixtime round-trips
    // (SqlFuncTest.scala:269 str_to_map, :224-293 parse_url,
    // CreateTest.scala:58-79 from_unixtime/to_timestamp)
    "fn_convert" -> ((s, d) =>
      t(s, d, "events")
        .withColumn("kv", concat(lit("uid="), col("user_id"),
          lit(",type="), col("event_type")))
        .withColumn("url", concat(lit("https://example.com/p/"),
          col("event_type"), lit("?u="), col("user_id")))
        .select(
          col("event_id"),
          element_at(str_to_map(col("kv"), lit(","), lit("=")), "uid").as("m_uid"),
          element_at(str_to_map(col("kv"), lit(","), lit("=")), "type").as("m_type"),
          // try_parse_url: the URL embeds a data column, and parsing
          // data-derived URLs must tolerate garbage (NULL, not an
          // INVALID_URL throw — TextExec adversarial-text sweep, r10)
          try_parse_url(col("url"), lit("HOST")).as("u_host"),
          try_parse_url(col("url"), lit("PATH")).as("u_path"),
          try_parse_url(col("url"), lit("QUERY")).as("u_query"),
          unix_timestamp(col("ts")).as("epoch_s"),
          from_unixtime(unix_timestamp(col("ts")), "yyyy-MM-dd HH:mm:ss").as("rt"),
          to_timestamp(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")).as("ts_trunc"),
          col("user_id").cast("string").as("uid_str"),
          col("user_id").cast("double").as("uid_dbl"))
        .orderBy("event_id")),

    // nested-type battery (§1.2 ARRAY/MAP/ROW): build nested values,
    // extract scalars back out (the extraction results are what the
    // oracle verifies; the nested construction is the op under test)
    "fn_nested" -> ((s, d) =>
      t(s, d, "part")
        .withColumn("st", struct(col("p_brand").as("b"), col("p_size").as("sz")))
        .withColumn("arr", split(col("p_name"), " "))
        .withColumn("mp", map_from_arrays(
          array(lit("brand"), lit("type")), array(col("p_brand"), col("p_type"))))
        .select(
          col("p_partkey"),
          col("st.b").as("st_brand"),
          (col("st.sz").cast("long") + 1).as("st_size1"),
          element_at(col("arr"), 1).as("arr_first"),
          element_at(col("arr"), -1).as("arr_last"),
          size(col("arr")).as("arr_len"),
          element_at(col("mp"), "brand").as("map_brand"),
          map_keys(col("mp"))(0).as("first_key"),
          array_contains(col("arr"), "widget").as("has_widget"),
          sort_array(col("arr"), asc = false)(0).as("arr_max"))
        .orderBy("p_partkey")),

    // geo battery (GeoUtils.java:60-243), synthetic lon/lat derived
    // deterministically from keys
    "fn_geo" -> ((s, d) => {
      val e = t(s, d, "events")
        .withColumn("lon", lit(-74.04) + (col("user_id") % 20) * 0.015)
        .withColumn("lat", lit(40.55) + (col("event_id") % 30) * 0.012)
      e.select(
        col("event_id"),
        GeoFunctions.isInNYC(col("lon"), col("lat")).as("in_nyc"),
        GeoFunctions.mapToGridCell(col("lon"), col("lat")).as("cell"),
        round(GeoFunctions.gridCellCenterLon(
          GeoFunctions.mapToGridCell(col("lon"), col("lat"))), 6).as("cell_lon"),
        round(GeoFunctions.gridCellCenterLat(
          GeoFunctions.mapToGridCell(col("lon"), col("lat"))), 6).as("cell_lat"),
        round(GeoFunctions.euclideanDistance(
          col("lon"), col("lat"), lit(-73.9), lit(40.75)), 6).as("dist"),
        round(GeoFunctions.directionAngle(
          col("lon"), col("lat"), lit(-73.9), lit(40.75)), 6).as("angle"))
        .orderBy("event_id")
    }),

    // bitwise battery: and/or/xor/not, shifts, popcount — pure
    // projection, codegen'd, no shuffle
    "fn_bitwise" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        col("p_partkey").bitwiseAND(lit(255L)).as("b_and"),
        col("p_partkey").bitwiseOR(lit(1024L)).as("b_or"),
        col("p_partkey").bitwiseXOR(col("p_size").cast("long")).as("b_xor"),
        bitwise_not(col("p_partkey")).as("b_not"),
        shiftleft(col("p_partkey"), 3).as("b_shl"),
        shiftright(col("p_partkey"), 2).as("b_shr"),
        bit_count(col("p_partkey")).as("b_cnt"))
        .orderBy("p_partkey")),

    // regex battery: rlike, anchored extract, global replace, match
    // count, split — patterns chosen to behave identically under Java
    // regex (Spark) and RE2 (DuckDB)
    "fn_regex" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        col("p_name").rlike("^[a-m]").as("re_like"),
        regexp_extract(col("p_name"), "^([a-z]+)", 1).as("re_first"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("re_last"),
        regexp_replace(col("p_name"), lit("[aeiou]"), lit("_")).as("re_repl"),
        size(regexp_extract_all(col("p_name"), lit("[aeiou]"), lit(0))).as("re_vowels"),
        size(split(col("p_name"), " ")).as("re_words"))
        .orderBy("p_partkey")),
  )

  def oracleSql: Map[String, String] = Map(
    "fn_math" ->
      """SELECT p_partkey,
            abs(CAST(p_size AS BIGINT) - 25) AS abs_v,
            p_size % 7 AS mod_v,
            CAST(sign(CAST(p_size AS BIGINT) - 25) AS DOUBLE) AS sign_v,
            CAST(floor(p_retailprice) AS BIGINT) AS floor_v,
            CAST(ceil(p_retailprice) AS BIGINT) AS ceil_v,
            CAST(round(CAST(p_retailprice AS DECIMAL(12,2)), 1) AS DOUBLE) AS round_v,
            floor(p_retailprice * 100) / 100 AS trunc_v,
            round(sqrt(p_retailprice), 6) AS sqrt_v,
            round(ln(p_retailprice + 1), 6) AS ln_v,
            round(log10(p_retailprice + 1), 6) AS log10_v,
            round(exp(p_size / 10.0), 6) AS exp_v,
            round(pow(p_size, 2), 6) AS pow_v,
            round(sin(p_size), 6) AS sin_v,
            round(cos(p_size), 6) AS cos_v,
            round(atan(p_size), 6) AS atan_v,
            round(CAST(1.0 AS DOUBLE) / NULLIF(tan(p_size), 0.0), 6) AS cot_v,
            round(exp(CAST(1.0 AS DOUBLE)), 6) AS e_v,
            round(degrees(p_size / 100.0), 6) AS deg_v,
            round(radians(p_size), 6) AS rad_v,
            round(pi(), 6) AS pi_v,
            upper(to_hex(p_partkey)) AS hex_v,
            bin(p_partkey) AS bin_v
         FROM part ORDER BY p_partkey""",
    "fn_string" ->
      """SELECT p_partkey,
            upper(p_name) AS up,
            lower(p_brand) AS lo,
            CAST(length(p_name) AS INT) AS len,
            concat_ws('|', p_brand, p_type) AS cw,
            substring(p_name, 2, 3) AS sub,
            regexp_replace(p_name, '[aeiou]', '*', 'g') AS rr,
            regexp_extract(p_name, '([a-z]+)', 1) AS rx,
            lpad(p_brand, 12, '#') AS lp,
            rpad(p_brand, 12, '#') AS rp,
            trim('  pad  ') AS tr,
            reverse(p_brand) AS rev,
            substring(p_name, 1, 4) AS left4,
            substring(p_name, length(p_name) - 3, 4) AS right4,
            repeat(p_brand, 2) AS rep,
            string_split(p_name, ' ')[2] AS tok1,
            ascii(p_brand) AS asc,
            chr(CAST(65 + (p_partkey % 26) AS INT)) AS ch,
            CAST(instr(p_name, 'a') AS INT) AS pos_a,
            translate(p_name, 'abc', 'xyz') AS tl,
            array_to_string(list_transform(string_split(p_name, ' '),
              w -> upper(w[1]) || substring(w, 2)), ' ') AS ic,
            md5(p_name) AS h_md5,
            sha256(p_name) AS h_sha,
            to_base64(encode(p_name)) AS b64,
            replace(p_type, 'SMALL', 'S') AS repl
         FROM part ORDER BY p_partkey""",
    "fn_temporal" ->
      """SELECT o_orderkey,
            CAST(year(o_orderdate) AS INT) AS y,
            CAST(month(o_orderdate) AS INT) AS m,
            CAST(dayofmonth(o_orderdate) AS INT) AS dom,
            CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
            CAST(dayofyear(o_orderdate) AS INT) AS doy,
            CAST(quarter(o_orderdate) AS INT) AS q,
            CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon_start,
            CAST(o_orderdate AS DATE) + 30 AS plus30,
            last_day(CAST(o_orderdate AS DATE)) AS eom,
            CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS dd,
            strftime(o_orderdate, '%Y-%m-%d %H') AS fmt,
            CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
            o_orderdate + INTERVAL 5 HOUR AS plus5h,
            CAST(floor((epoch(o_orderdate) - epoch(TIMESTAMP '1995-01-01 00:00:00')) / 3600)
                 AS BIGINT) AS hours_since,
            (o_orderdate < TIMESTAMP '1998-06-01'
             AND TIMESTAMP '1998-01-01' < o_orderdate + INTERVAL 10 DAY) AS overlaps_98h1
         FROM orders ORDER BY o_orderkey""",
    "fn_conditional" ->
      """SELECT l_orderkey, l_linenumber,
            nullif(l_discount, 0.0) AS nz_disc,
            coalesce(nullif(l_discount, 0.0), -1.0) AS co,
            greatest(l_tax, l_discount) AS gr,
            least(l_tax, l_discount) AS le,
            (l_quantity > 25 AND l_discount > 0.05) AS andv,
            (l_returnflag = 'A' OR l_linestatus = 'O') AS orv,
            NOT (l_quantity > 25) AS notv,
            (l_quantity BETWEEN 10 AND 20) AS btw,
            (l_quantity BETWEEN least(20, 10) AND greatest(20, 10)) AS btw_sym,
            (l_returnflag IN ('A', 'N')) AS inlist,
            (NULL IS NULL) AS isnull_v
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "fn_json" ->
      """SELECT event_id,
            CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
            CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_struct
         FROM events ORDER BY event_id""",
    "fn_convert" ->
      """SELECT event_id,
            CAST(user_id AS VARCHAR) AS m_uid,
            event_type AS m_type,
            'example.com' AS u_host,
            '/p/' || event_type AS u_path,
            'u=' || CAST(user_id AS VARCHAR) AS u_query,
            CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP))) AS BIGINT) AS epoch_s,
            strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS rt,
            date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts_trunc,
            CAST(user_id AS VARCHAR) AS uid_str,
            CAST(user_id AS DOUBLE) AS uid_dbl
         FROM events ORDER BY event_id""",
    "fn_nested" ->
      """SELECT p_partkey,
            p_brand AS st_brand,
            CAST(p_size AS BIGINT) + 1 AS st_size1,
            string_split(p_name, ' ')[1] AS arr_first,
            string_split(p_name, ' ')[-1] AS arr_last,
            CAST(len(string_split(p_name, ' ')) AS INT) AS arr_len,
            p_brand AS map_brand,
            'brand' AS first_key,
            list_contains(string_split(p_name, ' '), 'widget') AS has_widget,
            list_sort(string_split(p_name, ' '), 'DESC')[1] AS arr_max
         FROM part ORDER BY p_partkey""",
    "fn_geo" ->
      """WITH e AS (
           -- literals CAST to DOUBLE: DuckDB parses bare decimal
           -- literals as DECIMAL and would do exact decimal math where
           -- Spark does IEEE double
           SELECT event_id,
                  CAST(-74.04 AS DOUBLE) + (user_id % 20) * CAST(0.015 AS DOUBLE) AS lon,
                  CAST(40.55 AS DOUBLE) + (event_id % 30) * CAST(0.012 AS DOUBLE) AS lat
           FROM events),
         c AS (
           SELECT event_id, lon, lat,
                  CAST(floor((lon - CAST(-74.05 AS DOUBLE)) / CAST(0.0014 AS DOUBLE)) AS INT)
                  + CAST(floor((CAST(41.0 AS DOUBLE) - lat) / CAST(0.00125 AS DOUBLE)) AS INT) * 250 AS cell
           FROM e)
         SELECT event_id,
            (lon > -74.05 AND lon < -73.7 AND lat > 40.5 AND lat < 41.0) AS in_nyc,
            cell,
            round(CAST(abs(cell) % 250 AS DOUBLE) * CAST(0.0014 AS DOUBLE)
                  + CAST(-74.05 AS DOUBLE) + CAST(0.0007 AS DOUBLE), 6) AS cell_lon,
            round(CAST(41.0 AS DOUBLE)
                  - floor(CAST(abs(cell) AS DOUBLE) / 250) * CAST(0.00125 AS DOUBLE)
                  - CAST(0.000625 AS DOUBLE), 6) AS cell_lat,
            round(sqrt(pow(CAST(-73.9 AS DOUBLE) - lon, 2) + pow(CAST(40.75 AS DOUBLE) - lat, 2)), 6) AS dist,
            round(degrees(atan2(CAST(40.75 AS DOUBLE) - lat, CAST(-73.9 AS DOUBLE) - lon)), 6) AS angle
         FROM c ORDER BY event_id""",
    "fn_bitwise" ->
      """SELECT p_partkey,
            p_partkey & 255 AS b_and,
            p_partkey | 1024 AS b_or,
            xor(p_partkey, p_size) AS b_xor,
            ~p_partkey AS b_not,
            p_partkey << 3 AS b_shl,
            p_partkey >> 2 AS b_shr,
            CAST(bit_count(p_partkey) AS INT) AS b_cnt
         FROM part ORDER BY p_partkey""",
    "fn_regex" ->
      """SELECT p_partkey,
            regexp_matches(p_name, '^[a-m]') AS re_like,
            regexp_extract(p_name, '^([a-z]+)', 1) AS re_first,
            regexp_extract(p_name, '([a-z]+)$', 1) AS re_last,
            regexp_replace(p_name, '[aeiou]', '_', 'g') AS re_repl,
            CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS INT) AS re_vowels,
            CAST(len(string_split(p_name, ' ')) AS INT) AS re_words
         FROM part ORDER BY p_partkey""",
  )
}
