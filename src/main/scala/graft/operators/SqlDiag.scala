package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * sqldiag — slow-query duration prediction (reference: the gs_dbmind
 * sqldiag tool under src/gausskernel/dbmind: normalize historical SQL
 * into TEMPLATES, learn per-template duration statistics, predict a
 * new query from its template's history, and fall back to the most
 * text-similar known template for never-seen shapes).
 *
 * Spark-first decomposition:
 *  - `normalize` is ONE compiled single-pass scanner per row
 *    (literals → '?', case/whitespace folding) — a map-only scan at
 *    any history size;
 *  - `train` is ONE map-side-combined groupBy(template): 100 TB of
 *    query logs shuffle one row per template, never the history;
 *  - `predict` broadcasts the MODEL (templates are model-sized —
 *    thousands, not billions): exact template hits join broadcast;
 *    misses score pg_trgm word-trigram similarity against every
 *    template via the same broadcast (|templates| × misses, never
 *    history × probes) and take the argmax with a deterministic
 *    tie-break.
 *
 * Durations aggregate as exact integer sums; the only double is the
 * final single division (the suite's cross-engine discipline).
 */
object SqlDiag {

  /** SQL-template normalization: lowercase, string and numeric
    * literals → '?', whitespace folded and end-trimmed. ONE compiled
    * single-pass scanner per row ([[SqlTemplateExpr]]) — the original
    * three-regex chain was the dominant cost of the sqldiag gate
    * (3 java-regex passes over every history and probe row). */
  def normalize(q: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(SqlTemplateExpr(
      org.apache.spark.sql.graft.Bridge.expression(q)))

  /** Per-template duration statistics over a (query, duration) history:
    * (template, n_samples, total_ms, avg_ms). */
  def train(history: DataFrame, qCol: String, durCol: String): DataFrame =
    history
      .select(normalize(col(qCol)).as("template"),
        col(durCol).cast("long").as("d"))
      .groupBy(col("template"))
      .agg(count(lit(1)).as("n_samples"), sum(col("d")).as("total_ms"))
      .withColumn("avg_ms",
        round(col("total_ms").cast("double") / col("n_samples"), 4))

  /** Predict each probe's duration: exact template match first, else
    * the most trigram-similar template (ties: higher similarity, then
    * lexicographically smallest template — deterministic).
    *
    * The trained model is MODEL-SIZED (templates, not history), so it
    * collects to the driver once and re-enters the plan as a local
    * broadcast relation — otherwise the lazy model aggregate re-runs
    * for every branch that references it (measured 2× on the gate).
    * Similarity is scored per DISTINCT miss shape (shapes are also
    * model-sized even when the probe log is 100 TB), with each side's
    * trigram set computed ONCE — the HOF trigram builder per pair was
    * a measured 10× cliff. */
  def predict(model: DataFrame, probes: DataFrame, idCol: String,
      qCol: String): DataFrame = {
    val spark = probes.sparkSession
    val localModel = model.select(col("template"),
      col("avg_ms").cast("double")).collect()
    val m = broadcast(spark.createDataFrame(
      java.util.Arrays.asList(localModel: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("template",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("avg_ms",
          org.apache.spark.sql.types.DoubleType, nullable = false)))))
    val p = probes.select(col(idCol), normalize(col(qCol)).as("ptpl"))
    val exact = p.join(m, p("ptpl") === m("template"), "left")
    val mg = broadcast(m.withColumn("mtg", Trgm.trigrams(col("template"))))
    val shapeBest = exact.filter(col("template").isNull)
      .select(col("ptpl")).distinct()
      .withColumn("ptg", Trgm.trigrams(col("ptpl")))
      .crossJoin(mg)
      .withColumn("sim",
        round(Trgm.similarityOfSets(col("ptg"), col("mtg")), 6))
      .groupBy(col("ptpl"))
      .agg(min(struct((col("sim") * -1).as("negsim"),
        col("template").as("template"), col("avg_ms").as("avg_ms")))
        .as("best"))
      .select(col("ptpl").as("s_ptpl"), col("best.template").as("s_template"),
        col("best.avg_ms").as("s_avg"))
    exact.join(broadcast(shapeBest), col("ptpl") === col("s_ptpl"), "left")
      .select(col(idCol),
        coalesce(col("template"), col("s_template")).as("template"),
        when(col("template").isNotNull, lit("template"))
          .otherwise(lit("similar")).as("method"),
        coalesce(col("avg_ms"), col("s_avg")).as("pred_ms"))
  }
}

/**
 * The template scanner: one pass over the lowercased text — a
 * ''-quoted literal collapses to `?` (an unterminated quote stays, as
 * a literal-matching regex would leave it), a digit run with an
 * optional fraction collapses to `?`, a whitespace run folds to one
 * space (leading/trailing runs drop). Codegen'd as a static call.
 */
case class SqlTemplateExpr(
    child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.unsafe.types.UTF8String

  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sql_template"

  def template(in: UTF8String): UTF8String = {
    val t = in.toLowerCase.toString
    val n = t.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var pendingSpace = false
    def emit(c: Char): Unit = {
      if (pendingSpace && sb.length > 0) sb.append(' ')
      pendingSpace = false
      sb.append(c)
    }
    def isWs(c: Char): Boolean = c == ' ' || c == '\t' || c == '\n' ||
      c == '\r' || c == '\f' || c == '\u000B'
    while (i < n) {
      val c = t.charAt(i)
      if (c == '\'') {
        var j = i + 1
        while (j < n && t.charAt(j) != '\'') j += 1
        if (j < n) { emit('?'); i = j + 1 } // complete literal
        else { emit(c); i += 1 } // unterminated: the quote stands
      } else if (c >= '0' && c <= '9') {
        emit('?')
        while (i < n && t.charAt(i) >= '0' && t.charAt(i) <= '9') i += 1
        if (i + 1 < n && t.charAt(i) == '.' &&
            t.charAt(i + 1) >= '0' && t.charAt(i + 1) <= '9') {
          i += 1
          while (i < n && t.charAt(i) >= '0' && t.charAt(i) <= '9') i += 1
        }
      } else if (isWs(c)) { pendingSpace = true; i += 1 }
      else { emit(c); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }

  override def nullSafeEval(a: Any): Any = template(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sqlTemplate", this,
      classOf[SqlTemplateExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.template($a);")
  }

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = copy(child = c)
}
