package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Customer-value segmentation over an order ledger — the classic RFM
  * (recency / frequency / monetary) quintile scoring (Hughes, *Strategic
  * Database Marketing* 1994 — public), the workhorse "who are my best
  * customers" rollup beside the event-stream analytics in
  * [[EventAnalytics]].
  */
object Segmentation {

  /** Per-customer RFM quintile scores:
    *
    *  - recency_days = days between the customer's last order and the
    *    ledger's last order (integer day grain — exact cross-engine),
    *  - frequency = order count,
    *  - monetary = exact DECIMAL(18,2) spend fold,
    *
    * each scored 1–5 against the ledger's own quintile thresholds
    * (20/40/60/80th percentiles, rounded to 6 — the t17 parity recipe).
    * Recency scores REVERSED (recent = 5); a quintile is
    * 1 + Σ(v > t_k), so ties at a threshold fall into the lower bucket
    * deterministically in both engines.
    *
    * Scale shape: one groupBy(customer) shuffle with map-side combine,
    * ONE 12-cell exact-percentile aggregate over the customer-grain
    * table, thresholds broadcast back — no windows, no self-joins.
    * Exact percentile sorts the customer table once; past ~10⁹
    * customers swap in approx_percentile (documented trade: the
    * threshold is then rank-approximate, scores near a boundary can
    * shift by one).
    *
    * Rows with a null customer, date, or amount are excluded. Returns
    * (cust, recency_days, frequency, monetary, r_score, f_score,
    * m_score) ordered by customer key. */
  def rfmScores(
      orders: DataFrame, custCol: String, dateCol: String,
      amountCol: String): DataFrame = {
    val day = expr(
      s"unix_micros(cast($dateCol as timestamp)) div ${86400L * 1000000L}")
    val cust = orders
      .filter(col(custCol).isNotNull && col(dateCol).isNotNull &&
        col(amountCol).isNotNull)
      .select(col(custCol).as("cust"), day.as("od"), col(amountCol).as("amt"))
      .groupBy("cust").agg(
        max(col("od")).as("last_day"),
        count(lit(1)).as("frequency"),
        round(sum(col("amt").cast("decimal(18,2)")).cast("double"), 2)
          .as("monetary"))
    val mx = cust.agg(max(col("last_day")).as("__mxd"))
    val base = cust.crossJoin(broadcast(mx))
      .select(col("cust"), (col("__mxd") - col("last_day")).as("recency_days"),
        col("frequency"), col("monetary"))
    val qs = Seq(20, 40, 60, 80)
    val thAggs = Seq("recency_days", "frequency", "monetary").flatMap { c =>
      qs.map(q =>
        round(percentile(col(c).cast("double"), lit(q / 100.0)), 6)
          .as(s"__${c.head}$q"))
    }
    val th = base.agg(thAggs.head, thAggs.tail: _*)
    def quintile(c: String) =
      qs.map(q => (col(c).cast("double") > col(s"__${c.head}$q"))
        .cast("int")).reduce(_ + _) + 1
    base.crossJoin(broadcast(th))
      .select(col("cust"), col("recency_days"), col("frequency"),
        col("monetary"),
        (lit(6) - quintile("recency_days")).as("r_score"),
        quintile("frequency").as("f_score"),
        quintile("monetary").as("m_score"))
      .orderBy("cust")
  }
}
