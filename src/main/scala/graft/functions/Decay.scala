package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Recency-decay (EWMA) over a daily-count table — ONE definition
  * shared by the oracle-checked batch query (x59) and the streaming
  * recency monitor, so the two surfaces cannot drift (the same
  * contract as `Text.gopherGate` for x52 / qualityGateMonitor).
  *
  * ewma_t = Σ_{lag<Taps} n_{t−lag} · 2^−(lag+1) (α = 1/2), truncated
  * at 20 taps (tap 20 would contribute < 1e-6 of tap 0 — the
  * truncation IS the scale design, bounding the per-row explode).
  * Spark has no weighted-frame window and the running-state recursion
  * is order-sequential, so the distributed form is a map-side
  * probe-key explode with LITERAL power-of-two weights + one
  * target-day aggregation. All-integer arithmetic: the numerator
  * accumulates in 2^−20 units, the output converts to micro-units by
  * the reduced fraction 15625/16384 (= 1e6/2^20; the shared factor 64
  * keeps the ANSI-checked multiply 64× further from a Long overflow).
  * Accumulation order therefore cannot perturb a single bit — the
  * DuckDB twin replays the pipeline exactly.
  */
object Decay {

  /** NOT a free tuning knob: the micro-unit conversion below is the
    * reduced fraction of 1e6/2^Taps (= 15625/16384 only at Taps=20),
    * and the x59 DuckDB twin plus the StreamingSpec pin both replay 20
    * literal taps. Changing Taps alone would compile and run while
    * silently mis-scaling every ewma_micro — hence private. */
  private val Taps = 20

  /** Literal (lag, weight = 2^(Taps−1−lag)) tap matrix. */
  def taps: Column = array((0 until Taps).map(l =>
    struct(lit(l).as("lag"), lit(1L << (Taps - 1 - l)).as("w"))): _*)

  /** (day, n) → (day, n, ewma_micro), ordered by day. Each input row
    * emits its `Taps` forward contributions map-side; one groupBy on
    * the target day sums them; the inner join back to observed days
    * drops the phantom tail after the last day. */
  def ewma(daily: DataFrame): DataFrame = {
    val contrib = daily
      .select(col("day"), col("n"), explode(taps).as("t"))
      .select(date_add(col("day"), col("t.lag")).as("day"),
        (col("n") * col("t.w")).as("c"))
      .groupBy("day").agg(sum("c").as("num"))
    daily.join(contrib, Seq("day"))
      .select(col("day"), col("n"),
        expr("(num * 15625L) div 16384").as("ewma_micro"))
      .orderBy("day")
  }
}
