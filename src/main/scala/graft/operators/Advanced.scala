package graft.operators

import graft.core.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Round-2 operator additions: exact grouped percentiles, cube grouping
  * sets, the extended window-function family (ntile / percent_rank /
  * cume_dist, RANGE frames, first/last/nth), salted skew joins,
  * Bloom-filter join pruning, bigram vocabulary, and binary-payload
  * metadata (the multimodal column pattern).
  *
  * Oracle-determinism posture is the same as everywhere else
  * (see [[Relational]] scaladoc): total ORDER BY, identical aliases,
  * integer-exact values wherever a comparison decides membership, and
  * for the float outputs an IEEE-identical expression tree on both
  * sides before the final round().
  */
object Advanced {

  // ---------------------------------------------------------- percentiles

  /** Exact interpolated percentiles per group WITHOUT percentile() /
    * quantile_cont(): engines disagree on interpolation conventions,
    * but both compute IEEE doubles identically for an identical
    * expression tree. So: row_number + count windows, select the two
    * bracketing ranks lo = floor((n-1)q)+1 and lo+1, and interpolate
    * v_lo + (v_hi - v_lo) * frac with the same formula in both engines.
    * Scale shape: one window over the group ordering + one group-agg —
    * both on the same partitioning key, one shuffle total.
    *
    * Opt r21: the group ordering was `Window.partitionBy(flag)` — a
    * 3-task whole-group sort at any scale, the same serial shape the
    * r20 VERDICT flagged on q_agg_approx_percentile ("audit
    * q_agg_median / q_agg_percentiles for the same |groups|-partition
    * window shape"). Both bracketing ranks now come from the
    * distributed histogram selection ([[RankSelect.selectAtRanks]]):
    * the bracket values are the identical rank-lo / rank-lo+1 values
    * (tie-invariant — the output is the ordering value), the absent
    * hi bracket at lo+1 > n stays null, and the interpolation
    * expression tree is untouched, so the IEEE doubles and the oracle
    * hash are unchanged. The tiebreak columns leave the projection —
    * they never influenced the bracket values.
    */
  val aggPercentiles: Relational.Q = (s, d) => {
    val r = lineitem(s, d)
      .select(col("l_returnflag").as("flag"), col("l_extendedprice").as("v"))
    def brackets(q: Double, tag: String): Seq[(String, Column => Column)] = {
      def lo(n: Column) = floor((n - 1) * lit(q)) + 1
      Seq(s"vlo_$tag" -> (n => lo(n)), s"vhi_$tag" -> (n => lo(n) + 1))
    }
    val ranks = brackets(0.25, "p25") ++ brackets(0.5, "p50") ++
      brackets(0.95, "p95")
    def interp(tag: String, q: Double): Column = {
      val idx = (col("n") - 1) * lit(q)
      val f = idx - floor(idx)
      round(col(s"vlo_$tag") +
        (coalesce(col(s"vhi_$tag"), col(s"vlo_$tag")) - col(s"vlo_$tag")) * f, 4)
    }
    RankSelect.selectAtRanks(r, Seq("flag"), "v", ranks)
      .select(col("flag"),
        interp("p25", 0.25).as("p25"),
        interp("p50", 0.5).as("p50"),
        interp("p95", 0.95).as("p95"))
      .orderBy("flag")
  }

  // ------------------------------------------------------------- cube

  /** Shared agg/ALL-sentinel tail of the cube and grouping-sets
    * queries (one definition so the pair and their oracles can't
    * drift).
    */
  private def allRollupTail(
      g: org.apache.spark.sql.RelationalGroupedDataset): DataFrame =
    g.agg(round(sum("l_quantity"), 2).as("qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("qty"), col("n"))
      .orderBy("flag", "status")

  /** Full cube over two grouping keys (rollup's sibling — all four
    * grouping sets in one pass; Spark expands to a single expand+agg).
    */
  val aggCube: Relational.Q = (s, d) =>
    allRollupTail(lineitem(s, d).cube("l_returnflag", "l_linestatus"))

  /** Explicit grouping sets — per-flag and per-status marginals in one
    * pass (the asymmetric sibling of rollup/cube; Spark plans one
    * Expand + single aggregation, same as the others).
    */
  val aggGroupingSets: Relational.Q = (s, d) =>
    allRollupTail(lineitem(s, d).groupingSets(
      Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
      col("l_returnflag"), col("l_linestatus")))

  /** Per-day event-time bucketing: the ts column is Long *nanoseconds*
    * (nanosAsLong read of the parquet TIMESTAMP(NANOS)); truncate to µs
    * exactly, then format in the UTC session zone — identical day
    * boundaries in both engines.
    */
  val timeBucket: Relational.Q = (s, d) =>
    events(s, d)
      .withColumn("day", date_format(expr("timestamp_micros(ts div 1000)"), "yyyy-MM-dd"))
      .groupBy("day")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .orderBy("day")

  /** Set-valued aggregation with a BOUNDED contract: the first
    * `CollectSetCap` distinct statuses per flag (sorted ascending),
    * plus the exact distinct count. A raw `collect_set` buffers every
    * distinct value of the group in one aggregate state — unbounded by
    * definition, an executor OOM when a 100 TB group holds millions of
    * distinct values. Here the distinct set materializes through a
    * spillable hash aggregate (O(1) task state), a rank window caps
    * what gets collected (`collect_list` buffer ≤ cap rows), and the
    * count aggregates the deduped rows without collecting anything —
    * no operator in the plan holds more than `CollectSetCap` values.
    * Output order is canonical (sorted join), so the oracle check is
    * exact.
    */
  val CollectSetCap = 8
  val aggCollectSet: Relational.Q = (s, d) => {
    val w = Window.partitionBy("flag").orderBy(col("status").asc)
    lineitem(s, d)
      .select(col("l_returnflag").as("flag"), col("l_linestatus").as("status"))
      .distinct()
      .withColumn("rn", row_number().over(w))
      .groupBy("flag")
      .agg(
        array_join(sort_array(collect_list(
          when(col("rn") <= CollectSetCap, col("status")))), ",").as("statuses"),
        count(lit(1)).as("n_statuses"))
      .orderBy("flag")
  }

  // ---------------------------------------------------------- windows

  /** W4: distribution windows — ntile quartiles, percent_rank,
    * cume_dist. Ordering is total (µs-truncated ts + unique event_id),
    * so the rank ratios are exact integer divisions in double.
    */
  val w4Distribution: Relational.Q = (s, d) => {
    val w = Window.partitionBy("user_id")
      .orderBy(expr("ts div 1000").asc, col("event_id").asc)
    events(s, d)
      .select(col("user_id"), col("event_id"),
        ntile(4).over(w).cast("long").as("nt"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"))
      .orderBy("user_id", "event_id")
  }

  /** W5: value-RANGE frame — how many of the user's events fall within
    * 10 units below this event's value. Frame membership is a double
    * comparison on raw (unrounded) parquet values — identical in any
    * engine; the count is integer-exact.
    */
  val w5RangeFrame: Relational.Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("value").asc)
      .rangeBetween(-10, Window.currentRow)
    events(s, d)
      .select(col("user_id"), col("event_id"), col("value"),
        count(lit(1)).over(w).as("cnt_in_range"))
      .orderBy("user_id", "event_id")
  }

  /** W6: positional windows — first/last/nth event per user over the
    * full-partition frame.
    */
  val w6FirstLast: Relational.Q = (s, d) => {
    val w = Window.partitionBy("user_id")
      .orderBy(expr("ts div 1000").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    events(s, d)
      .select(col("user_id"), col("event_id"),
        first(col("event_id")).over(w).as("first_event"),
        last(col("event_id")).over(w).as("last_event"),
        nth_value(col("event_id"), 2).over(w).as("second_event"))
      .orderBy("user_id", "event_id")
  }

  // ------------------------------------------------------------ joins

  /** Salted skew join: `events` joined to a 5-row dimension keyed by
    * `event_type` — the classic skew shape where every fact row of one
    * key lands on one task. The dimension is replicated across 16 salt
    * values and the fact side picks a deterministic salt, spreading
    * each hot key over 16 tasks. Result is identical to the unsalted
    * join (the oracle), by construction. (Here the dim would be
    * broadcast anyway; at 100 TB with a dim too big to broadcast and a
    * zipfian fact key, this — or AQE skew-join splitting, which Bench
    * enables — is the shape that keeps the shuffle balanced.)
    */
  val skewSaltedJoin: Relational.Q = (s, d) => {
    val salts = 16
    val ev = events(s, d)
    val dim = ev.groupBy("event_type").agg(count(lit(1)).as("type_total"))
    val dimSalted = dim.withColumn("salt",
      explode(sequence(lit(0), lit(salts - 1))))
    // pmod, not %: Spark's % is negative for negative ids, which would
    // never match the dimension's 0..15 salts and silently drop rows.
    ev.withColumn("salt", pmod(col("event_id"), lit(salts)).cast("int"))
      .join(dimSalted, Seq("event_type", "salt"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), max("type_total").as("type_total"),
        round(sum("value"), 2).as("total_value"))
      .orderBy("event_type")
  }

  /** Bloom-pruned join: sketch the selective orders subset's keys
    * driver-side, prefilter the 4x-larger lineitem scan with it, then
    * exact-join (removing false positives). Result == plain join; at
    * scale the prefilter cuts the probe-side shuffle by the join
    * selectivity. See [[graft.functions.BloomFunctions]].
    */
  val bloomJoin: Relational.Q = (s, d) => {
    val sel = orders(s, d).filter(col("o_totalprice") > 400000)
      .select("o_orderkey")
    val bf = sel.stat.bloomFilter("o_orderkey", 100000, 0.01)
    lineitem(s, d)
      .filter(graft.functions.BloomFunctions.mightContain(bf, col("l_orderkey")))
      .join(sel, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("total"))
      .orderBy("l_returnflag")
  }

  /** Full outer join over partially-overlapping key ranges — both
    * unmatched sides surface (null-extended), coalesced to one key.
    */
  val j4FullOuter: Relational.Q = (s, d) => {
    val c = customer(s, d).filter(col("c_custkey") <= 1000).select("c_custkey")
    val o = orders(s, d).filter(col("o_custkey") >= 500)
      .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
    c.join(o, col("c_custkey") === col("o_custkey"), "full")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_custkey").isNotNull.as("has_cust"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .orderBy("custkey")
  }

  /** Cross join of the two smallest dimensions (5 regions x 25
    * nations) — broadcast nested loop, no shuffle.
    */
  val j5Cross: Relational.Q = (s, d) =>
    region(s, d).select("r_name").crossJoin(nation(s, d).select("n_name"))
      .orderBy("r_name", "n_name")

  /** Correlated scalar subquery, written as SQL so Catalyst's
    * decorrelation actually runs (it rewrites to the aggregate+join the
    * DataFrame formulation would hand-build): each customer's
    * maximum-price orders. max() compares stored doubles without
    * arithmetic, so the threshold is exact in both engines.
    */
  val subScalar: Relational.Q = (s, d) => {
    orders(s, d).createOrReplaceTempView("orders_sub")
    s.sql(
      """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        |FROM orders_sub o
        |WHERE o.o_totalprice = (SELECT max(o2.o_totalprice)
        |                        FROM orders_sub o2
        |                        WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o.o_orderkey""".stripMargin)
  }

  /** LATERAL correlated subplan: top-2 nations (by name) per region —
    * a per-row dependent limit the planner turns into a ranked join.
    */
  val lateralTopN: Relational.Q = (s, d) => {
    region(s, d).createOrReplaceTempView("region_lat")
    nation(s, d).createOrReplaceTempView("nation_lat")
    s.sql(
      """SELECT r.r_name, t.n_name
        |FROM region_lat r
        |JOIN LATERAL (SELECT n_name FROM nation_lat n
        |              WHERE n.n_regionkey = r.r_regionkey
        |              ORDER BY n_name LIMIT 2) t
        |ORDER BY r_name, n_name""".stripMargin)
  }

  /** Approximate percentiles (t-digest-family sketch) — the quantile
    * estimator for when the exact row_number formulation's per-group
    * sort is too hot (its window sorts each whole group on few keys).
    * Sketch VALUES are engine-specific, so the oracle-checked row emits
    * per-group booleans attesting the engine's OWN sketch falls inside
    * a generous exact-quantile band (p50 within [p40, p60], p95 within
    * [p90, p99]). Both engines compute the band edges with the SAME
    * rank-at-ceil(q·n) selection and tiebreak ordering, so the sketch
    * is tested against identical edges — deterministic even though
    * sketch values differ. AdvancedSpec still bounds the raw estimates
    * against q_agg_percentiles' exact values at 5%, far tighter than
    * the attestation band.
    *
    * The exact band values come from the same rank-selection window
    * formulation as [[Relational.aggMedian]] (value at rank
    * `ceil(q·n)`), NOT from Spark's `percentile` aggregate: that
    * aggregate buffers every value of the group in one aggregate state
    * — at 100 TB a single `l_returnflag` group is billions of rows and
    * that buffer is an executor OOM. The window route sorts the group
    * through the shuffle machinery (spillable, O(1) task state) and the
    * final aggregate carries one t-digest sketch plus four scalars per
    * group.
    */
  /** Opt r20: the sketch aggregation is SPLIT from the band window —
    * the previous single pipeline put the `approx_percentile` partial
    * aggregation ABOVE the flag-partitioned rank window, so every
    * sketch insert ran on |distinct flag| = 3 post-window partitions
    * (measured cpu/wall ≈ 3.8 on 32 cores). The sketch branch now
    * aggregates straight off the scan — partial sketches build
    * map-side across every scan partition, the final merge touches 3
    * groups — and joins the unchanged exact-band branch on `flag`
    * (3 rows × 3 rows). This is the oracle's own shape (separate
    * `bands`/`sk` CTEs joined on flag). The attested booleans are
    * unchanged: the sketch estimate may shift within its accuracy
    * envelope when partials merge in a different order, but the
    * attestation bands are ±10 percentiles wide — re-verified against
    * the oracle at both gate scales.
    *
    * Opt r21 (r20 VERDICT next-round #1): the exact-band branch's
    * 3-task `Window.partitionBy(flag)` rank sort — the remaining
    * serial half after r20 fixed the sketch half — is replaced by the
    * distributed histogram rank selection ([[RankSelect.selectAtRanks]],
    * its scaladoc carries the equivalence argument and measurements).
    * The selected band values are the identical rank-ceil(n·q) prices
    * (the rank's value is tie-invariant because the output IS the
    * ordering value), so the attested booleans and the oracle hash are
    * unchanged. The tiebreak columns (l_orderkey, l_linenumber) leave
    * the projection entirely — they never influenced the selected
    * price.
    */
  val aggApproxPercentile: Relational.Q = (s, d) => {
    def base = lineitem(s, d)
      .select(col("l_returnflag").as("flag"), col("l_extendedprice").as("price"))
    val sk = base.groupBy("flag")
      .agg(approx_percentile(col("price"), typedlit(Seq(0.5, 0.95)), lit(1000)).as("ap"))
    def bandAt(q: Double): (String, Column => Column) =
      (s"p${(q * 100).round}", n => ceil(n * q))
    val bands = RankSelect.selectAtRanks(base, Seq("flag"), "price",
      Seq(bandAt(0.4), bandAt(0.6), bandAt(0.90), bandAt(0.99)))
    bands.join(sk, "flag")
      .select(col("flag"), col("n"),
        (col("ap")(0) >= col("p40") && col("ap")(0) <= col("p60")).as("p50_ok"),
        (col("ap")(1) >= col("p90") && col("ap")(1) <= col("p99")).as("p95_ok"))
      .orderBy("flag")
  }

  // ----------------------------------------------------- text/multimodal

  /** T7: bigram vocabulary — the 2-gram sibling of t5's wordcount
    * (vocabulary/BPE-merge preparation). Integer counts only.
    */
  val t7Bigrams: Relational.Q = (s, d) => {
    val toks = TextAnalysis.tokens(col("text"))
    val n1 = greatest(size(toks) - 1, lit(0))
    val bg = zip_with(slice(toks, lit(1), n1), slice(toks, lit(2), n1),
      (a, b) => concat(a, lit(" "), b))
    documents(s, d)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(explode(bg).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 10)
      .orderBy(col("n").desc, col("bigram").asc)
      .limit(100)
  }

  /** M1: binary-payload metadata — the multimodal-column pattern: treat
    * the payload as an opaque `binary`, extract size / digest / typed
    * header fields. (For real image/audio payloads the decode step is
    * the stubbed codec in [[graft.multimodal.Multimodal]]; the
    * metadata/validation pass here is what a 100 TB ingest runs first.)
    */
  val m1BinaryMeta: Relational.Q = (s, d) =>
    documents(s, d)
      .select(col("doc_id"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        md5(col("text").cast("binary")).as("payload_md5"),
        substring(col("text"), 1, 16).as("head"))
      .orderBy("doc_id")

  /** M2 frame-sampling geometry (mirrored in the oracle). */
  val FrameChars = 256
  val MaxFrames = 4

  /** M2: uniform-stride frame sampling over the binary payload — the
    * [[graft.multimodal.Multimodal.frameSample]] geometry made
    * oracle-checkable by treating each document's (ASCII) text bytes
    * as the opaque media column, the same stand-in [[m1BinaryMeta]]
    * uses. Per asset: n_frames = ⌊bytes/256⌋, k = min(4, n_frames)
    * sampled at frame_idx = ⌊j·n_frames/k⌋ (strictly increasing since
    * n ≥ k — no duplicate frames), one output row per sampled frame
    * whose md5 attests the exact byte range. All-integer geometry +
    * md5 strings → hash-exact; per-row fan-out only, media bytes never
    * shuffle (the Generate sits on the scan; the only Exchange is the
    * output sort's).
    */
  val m2FrameSample: Relational.Q = (s, d) =>
    documents(s, d)
      .select(col("doc_id"), col("text"),
        (length(col("text")) / FrameChars).cast("long").as("n_frames"))
      .filter(col("n_frames") >= 1)
      .withColumn("k", least(lit(MaxFrames.toLong), col("n_frames")))
      .select(col("doc_id"), col("text"), col("n_frames"),
        explode(sequence(lit(0L), col("k") - 1)).as("j"), col("k"))
      .withColumn("frame_idx", expr("(j * n_frames) DIV k"))
      .select(col("doc_id"), col("n_frames"), col("frame_idx"),
        md5(expr(s"CAST(substring(text, CAST(frame_idx * $FrameChars + 1 AS INT), $FrameChars) AS BINARY)"))
          .as("frame_md5"))
      .orderBy("doc_id", "frame_idx")

  /** M3: REAL codec decode, oracle-checked. Each document id
    * deterministically generates a genuine binary media asset — a
    * 24bpp BMP for even ids, a RIFF/WAVE PCM16 file for odd ids (with
    * a junk LIST chunk every 5th to force real chunk-walking), every
    * 17th truncated to 10 bytes to exercise per-row corrupt
    * degradation — and the [[graft.multimodal.MediaFormats]] decoders
    * must PARSE the bytes back: header magic, offsets, stride, chunk
    * walk, PCM frames. The DuckDB oracle never sees the bytes: because
    * the generator is deterministic arithmetic on the id, it predicts
    * every decoded field (dimensions, channels, sample rate, integer
    * duration, total file size) and even the payload sums (Σ pixel
    * bytes, Σ |sample|) via `generate_series` sums — so a decoder that
    * misreads stride, padding, sign, or chunk bounds hash-mismatches.
    *
    * Scale shape: generate + decode fuse into one narrow map over the
    * id scan — media bytes live only inside the row mapper, never
    * cross a shuffle, and only the decoded scalars flow to the output
    * sort (the lone Exchange).
    */
  val m3CodecMeta: Relational.Q = (s, d) => {
    import graft.multimodal.MediaFormats
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("ok", BooleanType, nullable = false),
      StructField("width", LongType, nullable = true),
      StructField("height", LongType, nullable = true),
      StructField("channels", LongType, nullable = true),
      StructField("sample_rate", LongType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("payload_sum", LongType, nullable = true),
      StructField("n_media_bytes", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    documents(s, d).select(col("doc_id")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val q = id / 2
        val full =
          if (id % 2 == 0)
            MediaFormats.encodeBmp(id, (4 * (1 + q % 4)).toInt, (2 + q % 3).toInt)
          else
            MediaFormats.encodeWav(id, (1 + q % 2).toInt, (8000 * (1 + q % 3)).toInt,
              (40 + q % 60).toInt, junkChunk = q % 5 == 0)
        val bytes =
          if (id % 17 == 0) java.util.Arrays.copyOf(full, math.min(10, full.length))
          else full
        val n = bytes.length.toLong
        if (id % 2 == 0) MediaFormats.decodeBmp(bytes) match {
          case Some(m) => org.apache.spark.sql.Row(id, "image", true,
            m.width.toLong, m.height.toLong, null, null, null, m.pxSum, n)
          case None => org.apache.spark.sql.Row(id, "image", false,
            null, null, null, null, null, null, n)
        }
        else MediaFormats.decodeWav(bytes) match {
          case Some(m) => org.apache.spark.sql.Row(id, "audio", true,
            null, null, m.channels.toLong, m.sampleRate.toLong, m.durationMs,
            m.ampSum, n)
          case None => org.apache.spark.sql.Row(id, "audio", false,
            null, null, null, null, null, null, n)
        }
      }
    }(enc).orderBy("asset_id")
  }

  /** M4: REAL resize, oracle-checked — the normalize-before-featurize
    * image stage over the same deterministic BMP generator as [[m3CodecMeta]]
    * (even ids only; every 17th truncated → per-row corrupt
    * degradation). Each asset is resized to (w/2, max(h/2,1)) by
    * nearest-neighbor sampling in image coordinates
    * ([[graft.multimodal.MediaFormats.resizeBmp]]) — which CHANGES the
    * stride-padding geometry (e.g. 4-wide stride 12 → 2-wide stride 8)
    * — and the resized file is then RE-DECODED, so the row attests a
    * full encode→resize→decode round trip through a padded layout. The
    * DuckDB oracle predicts the resized dimensions, byte size (stride
    * arithmetic), and Σ resized pixel bytes (the nearest-neighbor
    * source-index arithmetic, bottom-up rows) without seeing any
    * bytes. Same scale shape as m3: one narrow map over the id scan,
    * no media bytes in any shuffle.
    */
  val m4Resize: Relational.Q = (s, d) => {
    import graft.multimodal.MediaFormats
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("ok", BooleanType, nullable = false),
      StructField("dst_w", LongType, nullable = true),
      StructField("dst_h", LongType, nullable = true),
      StructField("resized_px_sum", LongType, nullable = true),
      StructField("n_resized_bytes", LongType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    documents(s, d).select(col("doc_id")).filter(col("doc_id") % 2 === 0)
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val q = id / 2
          val sw = (4 * (1 + q % 4)).toInt
          val sh = (2 + q % 3).toInt
          val full = MediaFormats.encodeBmp(id, sw, sh)
          val bytes =
            if (id % 17 == 0) java.util.Arrays.copyOf(full, math.min(10, full.length))
            else full
          MediaFormats.resizeBmp(bytes, sw / 2, math.max(sh / 2, 1))
            .flatMap(rb => MediaFormats.decodeBmp(rb).map(m =>
              org.apache.spark.sql.Row(id, true, m.width.toLong, m.height.toLong,
                m.pxSum, rb.length.toLong)))
            .getOrElse(org.apache.spark.sql.Row(id, false, null, null, null, null))
        }
      }(enc).orderBy("asset_id")
  }

  /** M5: REAL audio resample, oracle-checked — the audio sibling of
    * [[m4Resize]]: every odd-id WAV from the [[m3CodecMeta]] generator
    * (rates 8/16/24 kHz, junk chunk every 5th — the resampler must
    * chunk-walk) is nearest-neighbor-resampled to a common 8 kHz
    * ([[graft.multimodal.MediaFormats.resampleWav]]) and RE-DECODED.
    * The oracle predicts the resampled frame count (`nf // rate
    * factor`), duration, byte size, and Σ |resampled sample| from the
    * decimation index arithmetic alone. Every 17th asset truncated →
    * per-row corrupt degradation. Same scale shape as m3/m4: one
    * narrow map over the id scan, media bytes in no shuffle.
    */
  val m5ResampleAudio: Relational.Q = (s, d) => {
    import graft.multimodal.MediaFormats
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("ok", BooleanType, nullable = false),
      StructField("channels", LongType, nullable = true),
      StructField("dst_rate", LongType, nullable = true),
      StructField("dst_frames", LongType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("amp_sum", LongType, nullable = true),
      StructField("n_resampled_bytes", LongType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    documents(s, d).select(col("doc_id")).filter(col("doc_id") % 2 === 1)
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val q = id / 2
          val full = MediaFormats.encodeWav(id, (1 + q % 2).toInt,
            (8000 * (1 + q % 3)).toInt, (40 + q % 60).toInt, junkChunk = q % 5 == 0)
          val bytes =
            if (id % 17 == 0) java.util.Arrays.copyOf(full, math.min(10, full.length))
            else full
          MediaFormats.resampleWav(bytes, 8000)
            .flatMap(rb => MediaFormats.decodeWav(rb).map(m =>
              org.apache.spark.sql.Row(id, true, m.channels.toLong,
                m.sampleRate.toLong, m.nFrames, m.durationMs, m.ampSum,
                rb.length.toLong)))
            .getOrElse(org.apache.spark.sql.Row(id, false,
              null, null, null, null, null, null))
        }
      }(enc).orderBy("asset_id")
  }

  /** CDC MERGE: apply a change batch (updates / deletes / inserts) to a
    * base table in ONE full-outer join — the incremental-maintenance
    * primitive behind upsert sinks and slowly-changing tables. The
    * change feed here derives deterministically from the base keys
    * (`key % 10`: 0→update, 7→delete, 3→insert under a fresh key) so
    * both engines construct the identical batch; a real pipeline reads
    * it from a changelog. Scale shape: one hash shuffle of each side on
    * the merge key (or zero with [[Bucketed]]-style co-location of base
    * and changelog); matched-update / matched-delete / unmatched-insert
    * all resolve row-locally in the joined stream — no per-row driver
    * logic, no second pass.
    */
  val cdcMerge: Relational.Q = (s, d) => {
    val base = orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
    val k = col("o_orderkey") % 10
    val changes = base
      .filter(k.isin(0, 3, 7))
      .select(
        when(k === 3, col("o_orderkey") + 10000000L)
          .otherwise(col("o_orderkey")).as("c_key"),
        when(k === 0, "U").when(k === 7, "D").otherwise("I").as("op"),
        // additions only: halving a 2-decimal price would mint exact
        // half-cents and park the group sum ON the round(…,2) boundary,
        // where cross-engine summation order decides the last digit
        when(k === 0, col("o_totalprice") + 100.0)
          .when(k === 3, col("o_totalprice") + 50.25).as("n_price"))
    base.join(changes, col("o_orderkey") === col("c_key"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(
        coalesce(col("c_key"), col("o_orderkey")).as("key"),
        when(col("op") === "U", "U").when(col("op") === "I", "I")
          .otherwise(col("o_orderstatus")).as("status"),
        when(col("op").isin("U", "I"), col("n_price"))
          .otherwise(col("o_totalprice")).as("price"))
      .groupBy("status")
      .agg(count(lit(1)).as("n"), min("key").as("min_key"),
        max("key").as("max_key"), round(sum("price"), 2).as("total"))
      .orderBy("status")
  }

  /** UNPIVOT (wide→long melt): the four lineitem measure columns become
    * (metric, value) rows — the normalization step before generic
    * per-metric aggregation/feature pipelines. Pure per-row expansion
    * (no shuffle until the aggregate), ×4 row fan-out.
    */
  val aggUnpivot: Relational.Q = (s, d) =>
    lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax")
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
          col("l_tax")),
        "metric", "value")
      .groupBy("metric")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"),
        round(min("value"), 2).as("lo"), round(max("value"), 2).as("hi"))
      .orderBy("metric")

  // --------------------------------------------------------- registration

  val queries: Map[String, Relational.Q] = Map(
    "q_cdc_merge" -> cdcMerge,
    "q_agg_unpivot" -> aggUnpivot,
    "q_agg_percentiles" -> aggPercentiles,
    "q_agg_cube" -> aggCube,
    "q_agg_grouping_sets" -> aggGroupingSets,
    "q_time_bucket" -> timeBucket,
    "q_j4_full_outer" -> j4FullOuter,
    "q_j5_cross" -> j5Cross,
    "q_agg_collect_set" -> aggCollectSet,
    "q_sub_scalar" -> subScalar,
    "q_lateral_topn" -> lateralTopN,
    "q_agg_approx_percentile" -> aggApproxPercentile,
    "q_w4_distribution" -> w4Distribution,
    "q_w5_range_frame" -> w5RangeFrame,
    "q_w6_first_last" -> w6FirstLast,
    "q_skew_salted_join" -> skewSaltedJoin,
    "q_bloom_join" -> bloomJoin,
    "q_t7_bigrams" -> t7Bigrams,
    "q_m1_binary_meta" -> m1BinaryMeta,
    "q_m2_frame_sample" -> m2FrameSample,
    "q_m3_codec_meta" -> m3CodecMeta,
    "q_m4_resize" -> m4Resize,
    "q_m5_resample_audio" -> m5ResampleAudio,
  )

  val oracleSql: Map[String, String] = Map(
    "q_agg_unpivot" ->
      """SELECT metric, count(*) AS n, round(CAST(sum(value) AS DOUBLE), 2) AS total,
        |       round(min(value), 2) AS lo, round(max(value), 2) AS hi
        |FROM (
        |  UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |                  l_discount, l_tax FROM lineitem)
        |  ON l_quantity, l_extendedprice, l_discount, l_tax
        |  INTO NAME metric VALUE value
        |)
        |GROUP BY 1 ORDER BY metric""".stripMargin,
    "q_cdc_merge" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |ch AS (
        |  SELECT CASE WHEN o_orderkey % 10 = 3 THEN o_orderkey + 10000000
        |              ELSE o_orderkey END AS c_key,
        |         CASE WHEN o_orderkey % 10 = 0 THEN 'U'
        |              WHEN o_orderkey % 10 = 7 THEN 'D' ELSE 'I' END AS op,
        |         CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100.0
        |              WHEN o_orderkey % 10 = 3 THEN o_totalprice + 50.25 END AS n_price
        |  FROM base WHERE o_orderkey % 10 IN (0, 3, 7)
        |),
        |m AS (
        |  SELECT coalesce(c.c_key, b.o_orderkey) AS key,
        |         CASE WHEN c.op = 'U' THEN 'U' WHEN c.op = 'I' THEN 'I'
        |              ELSE b.o_orderstatus END AS status,
        |         CASE WHEN c.op IN ('U', 'I') THEN c.n_price
        |              ELSE b.o_totalprice END AS price
        |  FROM base b FULL OUTER JOIN ch c ON b.o_orderkey = c.c_key
        |  WHERE c.op IS NULL OR c.op <> 'D'
        |)
        |SELECT status, count(*) AS n, min(key) AS min_key, max(key) AS max_key,
        |       round(sum(price), 2) AS total
        |FROM m GROUP BY 1 ORDER BY status""".stripMargin,
    "q_agg_percentiles" ->
      """WITH r AS (
        |  SELECT l_returnflag AS flag, l_extendedprice AS v,
        |         row_number() OVER (PARTITION BY l_returnflag
        |           ORDER BY l_extendedprice ASC, l_orderkey ASC, l_linenumber ASC) AS rn,
        |         count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem
        |), b AS (
        |  -- quantile literals cast to DOUBLE: DuckDB would otherwise do
        |  -- (n-1)*0.25 in DECIMAL while Spark computes double, and an
        |  -- unlucky group size could flip the lo rank / 4th decimal
        |  SELECT flag, max(n) AS n,
        |    max(CASE WHEN rn = CAST(floor((n-1)*0.25::DOUBLE) AS BIGINT)+1 THEN v END) AS vlo_p25,
        |    max(CASE WHEN rn = CAST(floor((n-1)*0.25::DOUBLE) AS BIGINT)+2 THEN v END) AS vhi_p25,
        |    max(CASE WHEN rn = CAST(floor((n-1)*0.5::DOUBLE)  AS BIGINT)+1 THEN v END) AS vlo_p50,
        |    max(CASE WHEN rn = CAST(floor((n-1)*0.5::DOUBLE)  AS BIGINT)+2 THEN v END) AS vhi_p50,
        |    max(CASE WHEN rn = CAST(floor((n-1)*0.95::DOUBLE) AS BIGINT)+1 THEN v END) AS vlo_p95,
        |    max(CASE WHEN rn = CAST(floor((n-1)*0.95::DOUBLE) AS BIGINT)+2 THEN v END) AS vhi_p95
        |  FROM r GROUP BY flag
        |)
        |SELECT flag,
        |  round(vlo_p25 + (coalesce(vhi_p25, vlo_p25) - vlo_p25) * ((n-1)*0.25::DOUBLE - floor((n-1)*0.25::DOUBLE)), 4) AS p25,
        |  round(vlo_p50 + (coalesce(vhi_p50, vlo_p50) - vlo_p50) * ((n-1)*0.5::DOUBLE  - floor((n-1)*0.5::DOUBLE)),  4) AS p50,
        |  round(vlo_p95 + (coalesce(vhi_p95, vlo_p95) - vlo_p95) * ((n-1)*0.95::DOUBLE - floor((n-1)*0.95::DOUBLE)), 4) AS p95
        |FROM b ORDER BY flag""".stripMargin,
    "q_agg_grouping_sets" ->
      """SELECT coalesce(l_returnflag,'ALL') AS flag,
        |       coalesce(l_linestatus,'ALL') AS status,
        |       round(sum(l_quantity),2) AS qty, count(*) AS n
        |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY flag, status""".stripMargin,
    "q_time_bucket" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n,
        |       round(sum(value), 2) AS total
        |FROM events GROUP BY day ORDER BY day""".stripMargin,
    "q_j4_full_outer" ->
      """SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
        |       c.c_custkey IS NOT NULL AS has_cust,
        |       coalesce(o.n_orders, 0) AS n_orders
        |FROM (SELECT c_custkey FROM customer WHERE c_custkey <= 1000) c
        |FULL JOIN (SELECT o_custkey, count(*) AS n_orders FROM orders
        |           WHERE o_custkey >= 500 GROUP BY o_custkey) o
        |  ON c.c_custkey = o.o_custkey
        |ORDER BY custkey""".stripMargin,
    "q_j5_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,
    // bounded contract: first CollectSetCap distinct statuses (sorted)
    // + exact distinct count — mirrors the engine's capped-rank plan
    "q_agg_collect_set" ->
      s"""WITH d AS (SELECT DISTINCT l_returnflag AS flag, l_linestatus AS status
         |           FROM lineitem),
         |r AS (SELECT flag, status,
         |             row_number() OVER (PARTITION BY flag ORDER BY status) AS rn
         |      FROM d)
         |SELECT flag,
         |       array_to_string(list_sort(list(status) FILTER (rn <= $CollectSetCap)), ',')
         |         AS statuses,
         |       count(*) AS n_statuses
         |FROM r GROUP BY flag ORDER BY flag""".stripMargin,
    "q_sub_scalar" ->
      """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        |FROM orders o
        |WHERE o.o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
        |                        WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o.o_orderkey""".stripMargin,
    "q_lateral_topn" ->
      """SELECT r.r_name, t.n_name
        |FROM region r
        |JOIN LATERAL (SELECT n_name FROM nation n
        |              WHERE n.n_regionkey = r.r_regionkey
        |              ORDER BY n_name LIMIT 2) t ON true
        |ORDER BY r_name, n_name""".stripMargin,
    // each engine attests its OWN t-digest sketch against an exact
    // quantile band BOTH engines compute with the identical rank-at-
    // ceil(q·n) selection (same tiebreak ordering as the Spark window)
    // — interpolated quantile_cont would give DuckDB different band
    // edges than the Spark side's rank formulation, widening the
    // cross-engine disagreement window when a sketch estimate lands
    // between the two conventions' edges
    "q_agg_approx_percentile" ->
      """WITH ranked AS (
        |  SELECT l_returnflag AS flag, l_extendedprice AS price,
        |         row_number() OVER (PARTITION BY l_returnflag
        |             ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
        |         count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem),
        |bands AS (
        |  SELECT flag, max(n) AS n,
        |         min(CASE WHEN rn = CAST(ceil(n * 0.4)  AS BIGINT) THEN price END) AS p40,
        |         min(CASE WHEN rn = CAST(ceil(n * 0.6)  AS BIGINT) THEN price END) AS p60,
        |         min(CASE WHEN rn = CAST(ceil(n * 0.90) AS BIGINT) THEN price END) AS p90,
        |         min(CASE WHEN rn = CAST(ceil(n * 0.99) AS BIGINT) THEN price END) AS p99
        |  FROM ranked GROUP BY flag),
        |sk AS (
        |  SELECT l_returnflag AS flag,
        |         approx_quantile(l_extendedprice, 0.5)  AS a50,
        |         approx_quantile(l_extendedprice, 0.95) AS a95
        |  FROM lineitem GROUP BY 1)
        |SELECT b.flag, b.n,
        |       sk.a50 BETWEEN b.p40 AND b.p60 AS p50_ok,
        |       sk.a95 BETWEEN b.p90 AND b.p99 AS p95_ok
        |FROM bands b JOIN sk USING (flag) ORDER BY flag""".stripMargin,
    "q_agg_cube" ->
      """SELECT coalesce(l_returnflag,'ALL') AS flag,
        |       coalesce(l_linestatus,'ALL') AS status,
        |       round(sum(l_quantity),2) AS qty, count(*) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,
    "q_w4_distribution" ->
      """SELECT user_id, event_id,
        |       CAST(ntile(4) OVER w AS BIGINT) AS nt,
        |       round(percent_rank() OVER w, 6) AS pr,
        |       round(cume_dist() OVER w, 6) AS cd
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |ORDER BY user_id, event_id""".stripMargin,
    "q_w5_range_frame" ->
      """SELECT user_id, event_id, value,
        |       count(*) OVER (PARTITION BY user_id ORDER BY value ASC
        |                      RANGE BETWEEN 10 PRECEDING AND CURRENT ROW) AS cnt_in_range
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q_w6_first_last" ->
      """SELECT user_id, event_id,
        |       first_value(event_id) OVER w AS first_event,
        |       last_value(event_id)  OVER w AS last_event,
        |       nth_value(event_id, 2) OVER w AS second_event
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id, event_id""".stripMargin,
    "q_skew_salted_join" ->
      """SELECT e.event_type, count(*) AS n, max(d.type_total) AS type_total,
        |       round(sum(e.value), 2) AS total_value
        |FROM events e
        |JOIN (SELECT event_type, count(*) AS type_total FROM events GROUP BY event_type) d
        |  ON e.event_type = d.event_type
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    "q_bloom_join" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_extendedprice), 2) AS total
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 400000
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_t7_bigrams" ->
      """SELECT bigram, count(*) AS n FROM (
        |  SELECT unnest(list_transform(range(1, len(w)),
        |           i -> w[i::INT] || ' ' || w[(i+1)::INT])) AS bigram
        |  FROM (SELECT string_split_regex(lower(trim(text)), '\s+') AS w FROM documents) t
        |) z
        |GROUP BY bigram HAVING count(*) >= 10
        |ORDER BY n DESC, bigram ASC LIMIT 100""".stripMargin,
    "q_m1_binary_meta" ->
      """SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes,
        |       md5(text) AS payload_md5, substr(text, 1, 16) AS head
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_m2_frame_sample" ->
      s"""WITH f AS (
         |  SELECT doc_id, text, (length(text) // $FrameChars)::BIGINT AS n_frames
         |  FROM documents
         |),
         |fk AS (
         |  SELECT doc_id, text, n_frames, least($MaxFrames, n_frames) AS k
         |  FROM f WHERE n_frames >= 1
         |),
         |j AS (
         |  SELECT doc_id, text, n_frames, k, unnest(range(0, k)) AS j FROM fk
         |)
         |SELECT doc_id, n_frames, ((j * n_frames) // k)::BIGINT AS frame_idx,
         |       md5(substring(text, ((j * n_frames) // k * $FrameChars + 1)::BIGINT, $FrameChars)) AS frame_md5
         |FROM j ORDER BY doc_id, frame_idx""".stripMargin,
    // the oracle PREDICTS every decoded field (and the payload sums,
    // via generate_series) from the deterministic generator arithmetic
    // — it never parses bytes; only a correct Spark-side binary parse
    // of the generated BMP/WAV can hash-match it
    "q_m3_codec_meta" ->
      """WITH ids AS (
        |  SELECT doc_id AS asset_id, doc_id // 2 AS q,
        |         doc_id % 2 = 0 AS is_img, doc_id % 17 = 0 AS corrupt
        |  FROM documents),
        |img AS (
        |  SELECT asset_id, corrupt, 4*(1 + q%4) AS w, 2 + q%3 AS h
        |  FROM ids WHERE is_img),
        |aud AS (
        |  SELECT asset_id, corrupt, 1 + q%2 AS ch, 8000*(1 + q%3) AS rate,
        |         40 + q%60 AS nf, q%5 = 0 AS junk
        |  FROM ids WHERE NOT is_img)
        |SELECT asset_id, 'image' AS kind, NOT corrupt AS ok,
        |       (CASE WHEN corrupt THEN NULL ELSE w END)::BIGINT AS width,
        |       (CASE WHEN corrupt THEN NULL ELSE h END)::BIGINT AS height,
        |       NULL::BIGINT AS channels, NULL::BIGINT AS sample_rate,
        |       NULL::BIGINT AS duration_ms,
        |       (CASE WHEN corrupt THEN NULL ELSE
        |          list_aggregate(list_transform(range(0, 3*w*h),
        |            g -> (asset_id + g) % 256), 'sum') END)::BIGINT AS payload_sum,
        |       (CASE WHEN corrupt THEN 10 ELSE 54 + 3*w*h END)::BIGINT AS n_media_bytes
        |FROM img
        |UNION ALL
        |SELECT asset_id, 'audio', NOT corrupt,
        |       NULL::BIGINT, NULL::BIGINT,
        |       (CASE WHEN corrupt THEN NULL ELSE ch END)::BIGINT,
        |       (CASE WHEN corrupt THEN NULL ELSE rate END)::BIGINT,
        |       (CASE WHEN corrupt THEN NULL ELSE (nf * 1000) // rate END)::BIGINT,
        |       (CASE WHEN corrupt THEN NULL ELSE
        |          list_aggregate(list_transform(range(0, nf*ch),
        |            g -> abs((asset_id + g) % 512 - 256)), 'sum') END)::BIGINT,
        |       (CASE WHEN corrupt THEN 10
        |             ELSE 44 + (CASE WHEN junk THEN 12 ELSE 0 END) + nf*ch*2 END)::BIGINT
        |FROM aud
        |ORDER BY asset_id""".stripMargin,
    // resized dims / byte size (stride arithmetic incl. the padding the
    // downscale introduces) / Σ resized pixel bytes, all predicted from
    // the generator + nearest-neighbor index arithmetic — the Spark
    // side must encode, resize, and re-decode actual bytes to agree
    "q_m4_resize" ->
      """WITH ids AS (
        |  SELECT doc_id AS asset_id, doc_id // 2 AS q, doc_id % 17 = 0 AS corrupt
        |  FROM documents WHERE doc_id % 2 = 0),
        |dims AS (
        |  SELECT asset_id, corrupt,
        |         4*(1 + q%4) AS sw, 2 + q%3 AS sh,
        |         4*(1 + q%4) // 2 AS dw, greatest((2 + q%3) // 2, 1) AS dh
        |  FROM ids)
        |SELECT asset_id, NOT corrupt AS ok,
        |       (CASE WHEN corrupt THEN NULL ELSE dw END)::BIGINT AS dst_w,
        |       (CASE WHEN corrupt THEN NULL ELSE dh END)::BIGINT AS dst_h,
        |       (CASE WHEN corrupt THEN NULL ELSE
        |          list_aggregate(list_transform(range(0, 3*dw*dh), g ->
        |            (asset_id
        |             + 3*((sh-1 - (g//(3*dw))*sh//dh)*sw + ((g//3)%dw)*sw//dw)
        |             + g%3) % 256), 'sum') END)::BIGINT AS resized_px_sum,
        |       (CASE WHEN corrupt THEN NULL
        |             ELSE 54 + ((3*dw+3)//4*4)*dh END)::BIGINT AS n_resized_bytes
        |FROM dims ORDER BY asset_id""".stripMargin,
    // resampled frame count / duration / byte size / Σ |sample| all
    // predicted from the nearest-neighbor decimation index arithmetic
    // (dst frame j ← src frame j*nf//df, rates 8000k → 8000 so
    // df = nf // k) — the Spark side must chunk-walk, decimate, and
    // re-decode actual bytes to agree
    "q_m5_resample_audio" ->
      """WITH ids AS (
        |  SELECT doc_id AS asset_id, doc_id // 2 AS q, doc_id % 17 = 0 AS corrupt
        |  FROM documents WHERE doc_id % 2 = 1),
        |aud AS (
        |  SELECT asset_id, corrupt, 1 + q%2 AS ch, 1 + q%3 AS k,
        |         40 + q%60 AS nf,
        |         (40 + q%60) // (1 + q%3) AS df
        |  FROM ids)
        |SELECT asset_id, NOT corrupt AS ok,
        |       (CASE WHEN corrupt THEN NULL ELSE ch END)::BIGINT AS channels,
        |       (CASE WHEN corrupt THEN NULL ELSE 8000 END)::BIGINT AS dst_rate,
        |       (CASE WHEN corrupt THEN NULL ELSE df END)::BIGINT AS dst_frames,
        |       (CASE WHEN corrupt THEN NULL ELSE (df * 1000) // 8000 END)::BIGINT AS duration_ms,
        |       (CASE WHEN corrupt THEN NULL ELSE
        |          list_aggregate(list_transform(range(0, df*ch), g ->
        |            abs((asset_id + (g//ch*nf//df)*ch + g%ch) % 512 - 256)), 'sum')
        |        END)::BIGINT AS amp_sum,
        |       (CASE WHEN corrupt THEN NULL ELSE 44 + df*ch*2 END)::BIGINT AS n_resampled_bytes
        |FROM aud ORDER BY asset_id""".stripMargin,
  )
}
