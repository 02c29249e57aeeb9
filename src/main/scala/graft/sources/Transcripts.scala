package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Turn

/** Sources for the transcripts table (BASELINE.json `input_hint` shape:
  * conv_id string, turn_idx int, role string, text string, tool string, ts timestamp).
  *
  * Two providers:
  *  1. `fromEvents`  — a deterministic reshape of the driver-provided `events`
  *     parquet table into transcript shape, expressible 1:1 in DuckDB SQL
  *     (`eventsCte`) so every downstream operator can be oracle-checked.
  *  2. `synthesize`  — a seed-free pure-function-of-(conv,turn) generator used by
  *     ScalaTest fixtures and the Bench scaling runs (no external data).
  */
object Transcripts {

  /** Reshape `events.parquet` into the transcript schema.
    *
    * Every derived column is a deterministic integer/string expression of
    * (event_id, user_id, event_type, props, ts) with an exact DuckDB
    * equivalent in [[eventsCte]] — keep the two in lockstep.
    */
  def fromEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val id = col("event_id")

    val role = when(col("event_type").isin("click", "view"), lit("user"))
      .when(col("event_type") === "signup", lit("assistant"))
      .otherwise(lit("tool"))

    val tool = when(
      col("event_type").isin("purchase", "error"),
      concat(col("event_type"), lit("_t"), (id % 4).cast("string"))
    ).otherwise(lit(""))

    val toolText = concat(
      lit("CALL tool="), tool,
      lit(" k="), (id % 100).cast("string"),
      lit(" note=\"lvl "), (id % 5).cast("string"),
      lit("\" dur="), (id % 997).cast("string"),
      lit("ms status="), when(id % 7 === 0, lit("err")).otherwise(lit("ok"))
    )
    val assistantText = concat(lit("INFO step "), id.cast("string"), lit(" "), col("props"))
    val userText = when(id % 13 === 0, lit(""))
      .otherwise(concat(lit("ask "), id.cast("string"), lit(" "), col("props")))

    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    ev.select(
      concat(lit("conv-"), lpad(col("user_id").cast("string"), 6, "0")).as("conv_id"),
      (row_number().over(w) - 1).cast("int").as("turn_idx"),
      role.as("role"),
      when(role === "tool", toolText)
        .when(role === "assistant", assistantText)
        .otherwise(userText).as("text"),
      tool.as("tool"),
      col("ts")
    )
  }

  /** DuckDB CTE equivalent of [[fromEvents]] — prefixed to every oracle SQL
    * that consumes transcripts. Must produce byte-identical values.
    */
  val eventsCte: String =
    """WITH transcripts_ev AS (
      |  SELECT
      |    event_id,
      |    'conv-' || lpad(CAST(user_id AS VARCHAR), 6, '0') AS conv_id,
      |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS INTEGER) AS turn_idx,
      |    CASE WHEN event_type IN ('click','view') THEN 'user'
      |         WHEN event_type = 'signup' THEN 'assistant'
      |         ELSE 'tool' END AS role,
      |    CASE WHEN event_type IN ('purchase','error')
      |         THEN 'CALL tool=' || event_type || '_t' || CAST(event_id % 4 AS VARCHAR)
      |              || ' k=' || CAST(event_id % 100 AS VARCHAR)
      |              || ' note="lvl ' || CAST(event_id % 5 AS VARCHAR)
      |              || '" dur=' || CAST(event_id % 997 AS VARCHAR)
      |              || 'ms status=' || (CASE WHEN event_id % 7 = 0 THEN 'err' ELSE 'ok' END)
      |         WHEN event_type = 'signup' THEN 'INFO step ' || CAST(event_id AS VARCHAR) || ' ' || props
      |         ELSE (CASE WHEN event_id % 13 = 0 THEN ''
      |               ELSE 'ask ' || CAST(event_id AS VARCHAR) || ' ' || props END)
      |    END AS text,
      |    CASE WHEN event_type IN ('purchase','error')
      |         THEN event_type || '_t' || CAST(event_id % 4 AS VARCHAR)
      |         ELSE '' END AS tool,
      |    ts
      |  FROM events
      |),
      |transcripts AS (
      |  SELECT conv_id, turn_idx, role, text, tool, ts FROM transcripts_ev
      |)
      |""".stripMargin

  /** Deterministic synthetic transcript table: every column is a pure
    * function of (conv, turn) — reproducible across runs and parallelism
    * levels (FIXTURES.md §1). Includes parseable CALL/INFO/ask markers,
    * blank user turns (blank-record accounting,
    * reference internal/tailer/tail_reader.go:272-279), and whitespace-led
    * continuation turns to exercise multiline segment assembly.
    *
    * @param megaTurns if > 0, conversation 0 gets this many turns (skew
    *                  fixture for the salted-repartition path).
    */
  def synthesize(
      spark: SparkSession,
      numConvs: Long,
      turnsPerConv: Int,
      megaTurns: Long = 0L,
      numPartitions: Int = 32
  ): Dataset[Turn] = {
    import spark.implicits._

    def shape(df: DataFrame): DataFrame = {
      val c = col("conv")
      val t = col("turn")
      // Deterministic per-(conv,turn) mixer — cheap LCG-ish integer hash,
      // fully codegen'd (no Math.random / wall clock anywhere).
      val h = pmod(c * 1315423911L + t * 2654435761L + (c + 3) * (t + 7), lit(1000003L))
      val role = element_at(
        array(lit("user"), lit("assistant"), lit("tool")), (pmod(h, lit(3)) + 1).cast("int"))
      val toolName = element_at(
        array(lit("search"), lit("exec"), lit("read"), lit("write"),
          lit("browse"), lit("eval"), lit("plan"), lit("reply")),
        (pmod(h, lit(8)) + 1).cast("int"))
      val tool = when(role === "tool", toolName).otherwise(lit(""))
      val toolText = concat(
        lit("CALL tool="), tool,
        lit(" k="), pmod(h, lit(100)).cast("string"),
        lit(" note=\"lvl "), pmod(h, lit(5)).cast("string"),
        lit("\" dur="), pmod(h, lit(997)).cast("string"),
        lit("ms status="), when(pmod(h, lit(7)) === 0, lit("err")).otherwise(lit("ok")))
      val assistantText = when(pmod(h, lit(4)) === 0,
        // whitespace-led continuation line (multiline fixture)
        concat(lit("    at frame "), pmod(h, lit(50)).cast("string")))
        .otherwise(concat(lit("INFO step "), h.cast("string"), lit(" of conv "), c.cast("string")))
      val userText = when(pmod(h, lit(13)) === 0, lit(""))
        .otherwise(concat(lit("ask "), h.cast("string"), lit(" about topic "), pmod(h, lit(20)).cast("string")))

      df.select(
        concat(lit("conv-"), lpad(c.cast("string"), 8, "0")).as("conv_id"),
        t.cast("int").as("turn_idx"),
        role.as("role"),
        when(role === "tool", toolText)
          .when(role === "assistant", assistantText)
          .otherwise(userText).as("text"),
        tool.as("tool"),
        timestamp_seconds(lit(1700000000L) + c * 3600L + t).as("ts")
      )
    }

    val base = spark.range(0, numConvs * turnsPerConv, 1, numPartitions)
      .select((col("id") / turnsPerConv).cast("long").as("conv"),
        (col("id") % turnsPerConv).as("turn"))
    val uniform = shape(base)
    val out =
      if (megaTurns > turnsPerConv) {
        // conversation 0 is the mega-conversation: extend it past turnsPerConv
        val extra = spark.range(turnsPerConv, megaTurns, 1, numPartitions)
          .select(lit(0L).as("conv"), col("id").as("turn"))
        uniform.unionByName(shape(extra))
      } else uniform
    out.as[Turn]
  }
}
