package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/**
 * DuckDB-oracle-matched analogs of the reference's relational operators
 * (SURVEY.md §2, FIXTURES.md §3), expressed over the driver's testdata.
 * Every aggregate/computed column is aliased identically in the Spark plan
 * and the oracle SQL; arithmetic avoids order-dependent double sums
 * (integral doubles are cast to long; money goes through decimal).
 */
object RelationalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S2/A9/W2 — top-1 max-id cursor (Db.cs:25-37)
    "q_s2_max_cursor" -> ((s, d) =>
      events(s, d).agg(max(col("event_id")).as("last_id"))),

    // S3 — top-1 min (Db.cs:11-23)
    "q_s3_min_cursor" -> ((s, d) =>
      events(s, d).agg(min(col("event_id")).as("first_id"))),

    // S1/W3 — incremental id-window scan (Db.cs:39-64, Worker.cs:141)
    "q_s1_window_scan" -> ((s, d) =>
      events(s, d)
        .where(col("event_id") > 5000 && col("event_id") <= 5100)
        .select(col("event_id"), col("user_id"), col("event_type"))),

    // A1/A9/A11 — per-user batch stats (Worker.cs:139-165)
    "q_a1_user_batches" -> ((s, d) =>
      events(s, d).groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), max(col("event_id")).as("last_id"))),

    // W3 — keyset pagination pages
    "q_w3_batch_pages" -> ((s, d) =>
      events(s, d)
        .groupBy(floor(col("event_id") / 1000).cast("long").as("page"))
        .agg(count(lit(1)).as("n"), max(col("event_id")).as("last_id"))),

    // J1 — 3-way equi inner join (Db.cs:43-50 shape)
    "q_j1_join3" -> ((s, d) =>
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).cast("long").as("sum_qty"))),

    // J2 — semi join (dirty-tile ⋈ index lookup shape, Worker.cs:178)
    "q_j2_semijoin" -> ((s, d) =>
      customer(s, d).join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n"))),

    // anti join — the complement surface (parts never ordered: non-empty)
    "q_j2b_antijoin" -> ((s, d) =>
      part(s, d).join(lineitem(s, d), col("p_partkey") === col("l_partkey"), "left_anti")
        .groupBy(col("p_brand")).agg(count(lit(1)).as("n"))),

    // J3/A3 — full-outer per-key merge with saturating add
    // (Diffs/HeatMapExtensions.cs:49-131)
    "q_j3_fullouter_merge" -> ((s, d) => {
      val e = events(s, d)
      val a = e.where(col("event_id") % 2 === 0)
        .groupBy((col("event_id") % 97).as("cell")).agg(count(lit(1)).as("v1"))
      val b = e.where(col("event_id") % 2 === 1)
        .groupBy((col("event_id") % 97).as("cell")).agg(count(lit(1)).as("v2"))
      a.join(b, Seq("cell"), "full_outer")
        .select(col("cell"),
          least(coalesce(col("v1"), lit(0L)) + coalesce(col("v2"), lit(0L)),
            lit(4294967295L)).as("merged"))
    }),

    // A2 — rasterize-accumulate shape: per-pixel SUM of visit costs
    "q_a2_pixel_sum" -> ((s, d) =>
      events(s, d)
        .groupBy((col("event_id") * 37 % 512).as("px"), (col("event_id") * 101 % 512).as("py"))
        .agg(count(lit(1)).as("trips"))),

    // A4/F7 — exact count-distinct + k-anonymity HAVING (Worker.cs:167-222)
    "q_a4_kanon_cells" -> ((s, d) =>
      events(s, d)
        .groupBy((col("event_id") * 7 % 200).as("cell"))
        .agg(countDistinct(col("user_id")).as("users"), count(lit(1)).as("trips"))
        .where(col("users") >= 3)),

    // A5 — threshold update pass (HeatMapTile.cs:118-137)
    "q_a5_threshold_update" -> ((s, d) =>
      events(s, d)
        .groupBy((col("event_id") * 7 % 200).as("cell"))
        .agg(countDistinct(col("user_id")).as("users"), count(lit(1)).as("trips"))
        .select(col("cell"), col("users"),
          when(col("users") < 3, lit(0L)).otherwise(col("trips")).as("trips"))),

    // A6/A7/A8 — 2×2→1 pyramid rollup, two chained levels
    // (HeatMapExtensions.cs:180-214)
    "q_a6_pyramid_rollup" -> ((s, d) => {
      val px = events(s, d)
        .groupBy((col("event_id") * 37 % 512).as("px"), (col("event_id") * 101 % 512).as("py"))
        .agg(count(lit(1)).as("trips"))
      val l1 = px.groupBy(floor(col("px") / 2).cast("long").as("px"),
          floor(col("py") / 2).cast("long").as("py"))
        .agg(sum(col("trips")).cast("long").as("trips"))
      l1.groupBy(floor(col("px") / 2).cast("long").as("px"),
          floor(col("py") / 2).cast("long").as("py"))
        .agg(sum(col("trips")).cast("long").as("trips"))
    }),

    // G9/F9 — packed u64 encode + decode round trip (Encoder.cs:5-13)
    "q_g9_pack_roundtrip" -> ((s, d) =>
      events(s, d)
        .groupBy((col("event_id") * 7 % 200).as("cell"))
        .agg(countDistinct(col("user_id")).as("users"), count(lit(1)).as("trips"))
        .select(col("cell"),
          shiftleft(col("users"), 32).bitwiseOR(col("trips").bitwiseAND(lit(4294967295L))).as("packed"))
        .select(col("cell"), col("packed"),
          shiftrightunsigned(col("packed"), 32).as("users"),
          col("packed").bitwiseAND(lit(4294967295L)).as("trips"))),

    // U1/A10 — union distinct of key sets (Worker.cs:102,112)
    "q_u1_union_distinct" -> ((s, d) =>
      supplier(s, d).select(col("s_nationkey").as("n"))
        .union(customer(s, d).select(col("c_nationkey"))).distinct()),

    "q_u2_intersect" -> ((s, d) =>
      supplier(s, d).select(col("s_nationkey").as("n"))
        .intersect(customer(s, d).select(col("c_nationkey")))),

    "q_u3_except" -> ((s, d) =>
      events(s, d).select(col("user_id").as("n"))
        .except(customer(s, d).select(col("c_nationkey").cast("long")))),

    // window function top-k per group
    "q_w_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      customer(s, d)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 5)
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"), col("rn"))
    }),

    // BACKWARD AS-OF JOIN (graft.temporal.AsofJoin): odd events play
    // trades, even events play quotes; each trade picks its user's latest
    // quote at-or-before the trade's timestamp (ties → largest quote id),
    // left-outer NULLs for trades before any quote. The engine runs the
    // tagged-union + ONE-window composition (single key exchange, no join,
    // any right-side size); DuckDB recomputes with the classic
    // join + row_number form.
    "q_asof_join" -> ((s, d) => {
      val ev = events(s, d)
      val trades = ev.where(col("event_id") % 2 === 1)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("value").as("trade_value"))
      val quotes = ev.where(col("event_id") % 2 === 0)
        .select(col("user_id"), col("ts"), col("event_id").as("quote_id"),
          col("value").as("quote_value"))
      graft.temporal.AsofJoin.asof(trades, quotes, key = "user_id",
          ts = "ts", rightId = "quote_id", payload = Seq("quote_value"))
        .select(col("event_id"), col("user_id"), col("trade_value"),
          col("quote_id"), col("quote_value"))
    }),

    // G2 — tile localId arithmetic round trip (TileStatic.cs:9-25)
    "q_g2_localid" -> ((s, d) =>
      events(s, d)
        .select(((col("event_id") * 29 % 16384) * 16384 + (col("event_id") * 13 % 16384)).as("tile_id"))
        .agg(sum(col("tile_id")).cast("long").as("sum_ids"), count(lit(1)).as("n"))),

    // G1 — x-tile of slippy WorldToTile (pure arithmetic part)
    "q_g1_tilex" -> ((s, d) =>
      events(s, d)
        .select(floor((((col("event_id") % 3600).cast("double") / 10.0 - 180.0) + 180.0) / 360.0 * 16384)
          .cast("long").as("tx"))
        .groupBy(col("tx")).agg(count(lit(1)).as("n"))),

    // string built-ins
    "q_str_funcs" -> ((s, d) =>
      customer(s, d)
        .groupBy(upper(substring(col("c_name"), 1, 10)).as("pre"))
        .agg(count(lit(1)).as("n"), min(length(col("c_name"))).as("min_len"))),

    // date extraction + decimal-exact money sum
    "q_date_year_revenue" -> ((s, d) =>
      orders(s, d)
        .groupBy(year(col("o_orderdate")).cast("int").as("yr"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))),

    // streaming analog: tumbling event-time window counts (epoch bucketing)
    "q_stream_tumbling" -> ((s, d) =>
      events(s, d)
        .groupBy(floor(unix_micros(col("ts").cast("timestamp")) / 3600000000L).cast("long").as("hour_bucket"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))),

    // per-user sessionization (lag window + running flag sum) — the batch
    // form of the mapGroupsWithState streaming op (stream/Sessionize)
    "q_w_sessions" -> ((s, d) =>
      graft.stream.Sessionize.sessionsBatch(events(s, d))),

    // S13 — tile→users inverted index (Worker.cs:298-338): sorted distinct
    // user set per cell (set semantics = collect_set idempotence, U2).
    // Stringified (array_join) so the driver's pandas compare — which can't
    // hash array cells — sees a plain string column on both sides.
    "q_s13_tile_users" -> ((s, d) =>
      events(s, d)
        .groupBy((col("event_id") * 7 % 200).as("cell"))
        .agg(array_join(sort_array(collect_set(col("user_id"))), ",").as("users"))),

    // F1/F2 analog — type + null filters
    "q_f1_filters" -> ((s, d) =>
      events(s, d)
        .where(col("event_type").isin("click", "view") && col("props").isNotNull)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))),

    // A12 — RemoveAll (HeatMapDiff.cs:112-121): detach selected tiles
    "q_a12_remove_tiles" -> ((s, d) => {
      implicit val sp: SparkSession = s
      graft.agg.TileOps.removeTiles(eventPixels(s, d), Seq((14, 0L, 0L), (14, 1L, 2L))).toDF()
    }),

    // J5 — CopyTilesTo (HeatMapExtensions.cs:23-56): per-pixel upsert of
    // the selected tiles from one map into another
    "q_j5_copy_tiles" -> ((s, d) => {
      implicit val sp: SparkSession = s
      graft.agg.TileOps.copyTilesTo(
        eventPixels(s, d, col("event_id") % 2 === 0),
        eventPixels(s, d, col("event_id") % 2 === 1),
        Seq((14, 1L, 1L))).toDF()
    })
  )

  /** Deterministic z14 pixel relation derived from events (tiles 0..3 in
    * each axis at 512-px grain) — input for the tile-surgery operators. */
  def eventPixels(s: SparkSession, d: String,
                  filter: org.apache.spark.sql.Column = lit(true)): org.apache.spark.sql.Dataset[graft.model.Schemas.GlobalPixel] = {
    implicit val sp: SparkSession = s
    import sp.implicits._
    events(s, d).where(filter)
      .groupBy((col("event_id") * 37 % 2048).as("gx"), (col("event_id") * 101 % 2048).as("gy"))
      .agg(countDistinct(col("user_id")).as("users"), count(lit(1)).as("trips"))
      .select(lit(14).as("z"), col("gx"), col("gy"), col("users"), col("trips"))
      .as[graft.model.Schemas.GlobalPixel]
  }

  val oracleSql: Map[String, String] = Map(
    "q_s2_max_cursor" -> "SELECT max(event_id) AS last_id FROM events",
    "q_s3_min_cursor" -> "SELECT min(event_id) AS first_id FROM events",
    "q_s1_window_scan" ->
      "SELECT event_id, user_id, event_type FROM events WHERE event_id > 5000 AND event_id <= 5100",
    "q_a1_user_batches" ->
      "SELECT user_id, count(*) AS n, max(event_id) AS last_id FROM events GROUP BY user_id",
    "q_w3_batch_pages" ->
      "SELECT CAST(floor(event_id/1000) AS BIGINT) AS page, count(*) AS n, max(event_id) AS last_id FROM events GROUP BY 1",
    "q_j1_join3" ->
      """SELECT c_mktsegment, count(*) AS n, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment""",
    "q_j2_semijoin" ->
      """SELECT c_nationkey, count(*) AS n FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         GROUP BY c_nationkey""",
    "q_j2b_antijoin" ->
      """SELECT p_brand, count(*) AS n FROM part
         WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
         GROUP BY p_brand""",
    "q_j3_fullouter_merge" ->
      """SELECT COALESCE(a.cell, b.cell) AS cell,
                least(COALESCE(v1, 0) + COALESCE(v2, 0), 4294967295) AS merged
         FROM (SELECT event_id % 97 AS cell, count(*) AS v1 FROM events WHERE event_id % 2 = 0 GROUP BY 1) a
         FULL JOIN (SELECT event_id % 97 AS cell, count(*) AS v2 FROM events WHERE event_id % 2 = 1 GROUP BY 1) b
         ON a.cell = b.cell""",
    "q_a2_pixel_sum" ->
      "SELECT (event_id*37) % 512 AS px, (event_id*101) % 512 AS py, count(*) AS trips FROM events GROUP BY 1, 2",
    "q_a4_kanon_cells" ->
      """SELECT (event_id*7) % 200 AS cell, count(DISTINCT user_id) AS users, count(*) AS trips
         FROM events GROUP BY 1 HAVING count(DISTINCT user_id) >= 3""",
    "q_a5_threshold_update" ->
      """SELECT cell, users, CASE WHEN users < 3 THEN 0 ELSE trips END AS trips FROM (
           SELECT (event_id*7) % 200 AS cell, count(DISTINCT user_id) AS users, count(*) AS trips
           FROM events GROUP BY 1)""",
    "q_a6_pyramid_rollup" ->
      """SELECT CAST(floor(px/2) AS BIGINT) AS px, CAST(floor(py/2) AS BIGINT) AS py,
                CAST(sum(trips) AS BIGINT) AS trips FROM (
           SELECT CAST(floor(px/2) AS BIGINT) AS px, CAST(floor(py/2) AS BIGINT) AS py,
                  CAST(sum(trips) AS BIGINT) AS trips FROM (
             SELECT (event_id*37) % 512 AS px, (event_id*101) % 512 AS py, count(*) AS trips
             FROM events GROUP BY 1, 2) GROUP BY 1, 2) GROUP BY 1, 2""",
    "q_g9_pack_roundtrip" ->
      """SELECT cell, (users << 32) | (trips & 4294967295) AS packed,
                ((users << 32) | (trips & 4294967295)) >> 32 AS users,
                ((users << 32) | (trips & 4294967295)) & 4294967295 AS trips FROM (
           SELECT (event_id*7) % 200 AS cell, count(DISTINCT user_id) AS users, count(*) AS trips
           FROM events GROUP BY 1)""",
    "q_u1_union_distinct" ->
      "SELECT DISTINCT n FROM (SELECT s_nationkey AS n FROM supplier UNION ALL SELECT c_nationkey AS n FROM customer)",
    "q_u2_intersect" ->
      "SELECT s_nationkey AS n FROM supplier INTERSECT SELECT c_nationkey FROM customer",
    "q_u3_except" ->
      "SELECT user_id AS n FROM events EXCEPT SELECT CAST(c_nationkey AS BIGINT) FROM customer",
    "q_w_topk_per_group" ->
      """SELECT c_nationkey, c_custkey, c_acctbal, rn FROM (
           SELECT c_nationkey, c_custkey, c_acctbal,
                  row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
           FROM customer) WHERE rn <= 5""",
    // the classic join + row_number spelling of the backward as-of pick —
    // an INDEPENDENT formulation of the engine's union + window plan
    "q_asof_join" ->
      """WITH trades AS (SELECT event_id, user_id, ts, value AS trade_value
                         FROM events WHERE event_id % 2 = 1),
              quotes AS (SELECT event_id AS quote_id, user_id, ts, value AS quote_value
                         FROM events WHERE event_id % 2 = 0)
         SELECT event_id, user_id, trade_value, quote_id, quote_value FROM (
           SELECT t.event_id, t.user_id, t.trade_value, q.quote_id, q.quote_value,
                  row_number() OVER (PARTITION BY t.event_id
                                     ORDER BY q.ts DESC, q.quote_id DESC) AS rn
           FROM trades t LEFT JOIN quotes q ON q.user_id = t.user_id AND q.ts <= t.ts)
         WHERE rn = 1""",
    "q_g2_localid" ->
      """SELECT CAST(sum((event_id*29 % 16384) * 16384 + (event_id*13 % 16384)) AS BIGINT) AS sum_ids,
                count(*) AS n FROM events""",
    "q_g1_tilex" ->
      """SELECT CAST(floor(((CAST(event_id % 3600 AS DOUBLE)/10.0 - 180.0) + 180.0)/360.0*16384) AS BIGINT) AS tx,
                count(*) AS n FROM events GROUP BY 1""",
    "q_str_funcs" ->
      """SELECT upper(substring(c_name, 1, 10)) AS pre, count(*) AS n, min(length(c_name)) AS min_len
         FROM customer GROUP BY 1""",
    "q_date_year_revenue" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, count(*) AS n,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM orders GROUP BY 1""",
    "q_stream_tumbling" ->
      """SELECT CAST(floor(epoch_us(ts)/3600000000) AS BIGINT) AS hour_bucket, event_type,
                count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
         FROM events GROUP BY 1, 2""",
    "q_s13_tile_users" ->
      """SELECT (event_id*7) % 200 AS cell,
                array_to_string(list_sort(list(DISTINCT user_id)), ',') AS users
         FROM events GROUP BY 1""",
    "q_w_sessions" ->
      """SELECT user_id, count(*) AS n_events, CAST(sum(new_session) AS BIGINT) AS n_sessions,
                max(ts_us) AS last_ts_us FROM (
           SELECT user_id, ts_us,
                  CASE WHEN prev IS NULL OR ts_us - prev > 1800000000 THEN 1 ELSE 0 END AS new_session
           FROM (SELECT user_id, epoch_us(ts) AS ts_us,
                        lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS prev
                 FROM events))
         GROUP BY user_id""",
    "q_f1_filters" ->
      """SELECT event_type, count(*) AS n FROM events
         WHERE event_type IN ('click', 'view') AND props IS NOT NULL GROUP BY event_type""",
    "q_a12_remove_tiles" ->
      """WITH px AS (
           SELECT CAST(14 AS INTEGER) AS z, (event_id*37) % 2048 AS gx, (event_id*101) % 2048 AS gy,
                  count(DISTINCT user_id) AS users, count(*) AS trips
           FROM events GROUP BY 2, 3)
         SELECT z, gx, gy, users, trips FROM px
         WHERE NOT ((gx // 512 = 0 AND gy // 512 = 0) OR (gx // 512 = 1 AND gy // 512 = 2))""",
    "q_j5_copy_tiles" ->
      """WITH src AS (
           SELECT CAST(14 AS INTEGER) AS z, (event_id*37) % 2048 AS gx, (event_id*101) % 2048 AS gy,
                  count(DISTINCT user_id) AS users, count(*) AS trips
           FROM events WHERE event_id % 2 = 0 GROUP BY 2, 3),
         tgt AS (
           SELECT CAST(14 AS INTEGER) AS z, (event_id*37) % 2048 AS gx, (event_id*101) % 2048 AS gy,
                  count(DISTINCT user_id) AS users, count(*) AS trips
           FROM events WHERE event_id % 2 = 1 GROUP BY 2, 3),
         copied AS (
           SELECT * FROM src WHERE gx // 512 = 1 AND gy // 512 = 1 AND trips > 0),
         kept AS (
           SELECT t.* FROM tgt t WHERE NOT EXISTS (
             SELECT 1 FROM copied c WHERE c.z = t.z AND c.gx = t.gx AND c.gy = t.gy))
         SELECT * FROM kept UNION ALL SELECT * FROM copied"""
  )
}
