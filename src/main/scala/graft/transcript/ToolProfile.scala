package graft.transcript

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-tool latency / reliability profile — the operational rollup an
  * agent-transcript pipeline needs before mixture decisions: which tools a
  * corpus exercises, how slow they are (exact p50/p95 over the observed
  * call latencies), and how often they fail. A tool whose p95 dwarfs its
  * p50 or whose error rate is high poisons the "successful trajectory"
  * training mix, and the profile is the evidence for dropping or
  * re-weighting those traces (the reference's corpus report —
  * src/CorpusAid.py:2447-2464 — is the same idea at file grain: aggregate
  * operational stats drive the cleaning decisions).
  *
  * Latency of a tool turn = its ts minus the PREVIOUS turn's ts in
  * (conv_id ORDER BY turn_idx) — the time the tool ran after being
  * invoked. Turn 0 tool calls (no predecessor) carry no latency sample.
  *
  * Per tool (all exact integers):
  *   - n_calls     tool turns with a latency sample;
  *   - n_convs     distinct conversations exercising the tool;
  *   - n_errors    calls whose output starts with the `ERROR:` marker;
  *   - p50_lat_ms / p95_lat_ms  exact discrete percentiles — the value at
  *     1-based rank ceil(n/2) / ceil(95n/100) of the sorted latencies,
  *     computed from a (tool, latency) COUNT HISTOGRAM, never a per-tool
  *     sort of raw calls: at 10^12 turns a per-tool global sort is one
  *     reducer per tool (5 tools = 5 straggler partitions), while the
  *     histogram is a partial-aggregated groupBy over (tool, lat) whose
  *     cardinality is bounded by the distinct latency values — the
  *     cumulative-sum window then runs over that tiny table. Integer-only
  *     rank arithmetic ((n+1) div 2, (95n+99) div 100) so both engines
  *     agree bit-for-bit with no IEEE ceil() coupling.
  *   - max_lat_ms  slowest call.
  *
  * Plan shape: one conv_id exchange feeds the lag-1 window; the histogram
  * and base rollups then exchange only (tool, lat)/(tool) — fixed-width
  * keys, never text. The final join is a 5-row broadcast.
  *
  * The generator's clock is perfectly regular (every latency 60 s) and its
  * tool outputs never fail, so the fixture rule applies: [[inject]] plants
  * latency jitter and error outputs as deterministic value mutations keyed
  * only on (convIdx, turn_idx), replayed verbatim by the oracle SQL over
  * the committed raw dump.
  */
object ToolProfile {

  /** Deterministic operational-variance injection, tool turns only:
    *   - latency jitter: ts += (cv*131 + ti*17) mod 240000 ms — spreads
    *     tool latencies over [60 s, 300 s). Tool turns are never adjacent
    *     in the raw dump (the generator only flips assistant slots), so
    *     the mutation changes ONLY the injected turn's own latency sample.
    *   - errors: (cv + ti) mod 5 == 0 → output replaced with the ERROR
    *     marker text.
    */
  def inject(turns: DataFrame): DataFrame = {
    val cv = expr("cast(substring(conv_id, 6) as bigint)")
    val ti = col("turn_idx")
    val isTool = col("role") === "tool"
    turns
      .withColumn("ts_ms",
        col("ts_ms") +
          when(isTool, (cv * 131L + ti * 17L) % 240000L).otherwise(0L))
      .withColumn("text",
        when(isTool && (cv + ti) % 5 === 0, lit("ERROR: tool timeout"))
          .otherwise(col("text")))
  }

  def profile(spark: SparkSession, turns: DataFrame): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    // The error flag is computed BEFORE the conv_id exchange so text never
    // shuffles (guide §2.3 "project before the exchange" — the lag window
    // only reads ts_ms), and the tool-call table is PINNED so the exchange
    // + window run once for the base rollup AND the latency histogram
    // (guide §2.4 — the two aggregations previously re-evaluated the whole
    // input subtree each).
    val calls = graft.run.Materialize.pin(turns
      .select(col("conv_id"), col("turn_idx"), col("role"), col("tool"),
        when(col("text").startsWith("ERROR:"), 1L).otherwise(0L).as("_err"),
        col("ts_ms"))
      .repartition(col("conv_id"))
      .withColumn("_lat", col("ts_ms") - lag(col("ts_ms"), 1).over(w))
      .filter(col("role") === "tool" && col("_lat").isNotNull)
      .select(col("conv_id"), col("tool"), col("_err"), col("_lat")))

    val base = calls
      .groupBy("tool")
      .agg(
        count(lit(1)).as("n_calls"),
        count_distinct(col("conv_id")).as("n_convs"),
        sum(col("_err")).as("n_errors"),
        max(col("_lat")).as("max_lat_ms"))

    // exact discrete percentiles from the latency histogram
    val hist = calls.groupBy(col("tool"), col("_lat").as("lat"))
      .agg(count(lit(1)).as("c"))
    val cumW = Window.partitionBy("tool").orderBy("lat")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum(col("c")).over(cumW))
      .withColumn("n",
        sum(col("c")).over(Window.partitionBy("tool")))
      .withColumn("prev", col("cum") - col("c"))
    val k50 = expr("(n + 1) div 2")
    val k95 = expr("(n * 95 + 99) div 100")
    val pct = cum
      .groupBy("tool")
      .agg(
        min(when(col("prev") < k50 && k50 <= col("cum"), col("lat")))
          .as("p50_lat_ms"),
        min(when(col("prev") < k95 && k95 <= col("cum"), col("lat")))
          .as("p95_lat_ms"))

    // the profile is |tools| rows — pin it eagerly so the calls pin can be
    // released here instead of leaking past the query boundary
    val out = graft.run.Materialize.pin(
      base.join(pct, "tool")
        .select("tool", "n_calls", "n_convs", "n_errors",
          "p50_lat_ms", "p95_lat_ms", "max_lat_ms")
        .orderBy("tool"))
    calls.unpersist(false)
    out
  }

  /** DuckDB oracle over the committed raw dump: injection, lag window,
    * histogram cumulative ranks, and rollup replayed with DuckDB's own
    * engines (integer-only rank arithmetic, `//` = Spark's `div`). */
  def oracleSql(golden: String): String =
    s"""WITH raw AS (
         SELECT conv_id, turn_idx, role, tool, text, epoch_ms(ts) AS ts_ms,
                CAST(substring(conv_id, 6) AS BIGINT) AS cv
         FROM read_parquet('$golden/turns_raw_sf001.parquet')),
       inj AS (
         SELECT conv_id, turn_idx, role, tool,
           CASE WHEN role = 'tool' AND (cv + turn_idx) % 5 = 0
                THEN 'ERROR: tool timeout' ELSE text END AS text,
           ts_ms + (CASE WHEN role = 'tool'
                         THEN (cv * 131 + turn_idx * 17) % 240000
                         ELSE 0 END) AS ts_ms
         FROM raw),
       calls AS (
         SELECT * FROM (
           SELECT conv_id, role, tool, text,
             ts_ms - lag(ts_ms) OVER (PARTITION BY conv_id
               ORDER BY turn_idx) AS lat
           FROM inj)
         WHERE role = 'tool' AND lat IS NOT NULL),
       base AS (
         SELECT tool,
           cast(count(*) AS BIGINT) AS n_calls,
           cast(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
           cast(sum(CASE WHEN text LIKE 'ERROR:%' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_errors,
           cast(max(lat) AS BIGINT) AS max_lat_ms
         FROM calls GROUP BY tool),
       hist AS (
         SELECT tool, lat, cast(count(*) AS BIGINT) AS c
         FROM calls GROUP BY tool, lat),
       cum AS (
         SELECT tool, lat, c,
           cast(sum(c) OVER (PARTITION BY tool ORDER BY lat
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
           cast(sum(c) OVER (PARTITION BY tool) AS BIGINT) AS n
         FROM hist),
       pct AS (
         SELECT tool,
           cast(min(CASE WHEN cum - c < (n + 1) // 2
                          AND (n + 1) // 2 <= cum THEN lat END)
             AS BIGINT) AS p50_lat_ms,
           cast(min(CASE WHEN cum - c < (n * 95 + 99) // 100
                          AND (n * 95 + 99) // 100 <= cum THEN lat END)
             AS BIGINT) AS p95_lat_ms
         FROM cum GROUP BY tool)
       SELECT base.tool, n_calls, n_convs, n_errors,
              p50_lat_ms, p95_lat_ms, max_lat_ms
       FROM base JOIN pct ON base.tool = pct.tool
       ORDER BY base.tool"""
}
