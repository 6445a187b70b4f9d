package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.ops.Sampling

/** Streaming sampling operators. */
object SampleStreams {

  /** LIVE TEMPERATURE-SAMPLING GATE — the ingest-side twin of
    * [[Sampling.temperatureApply]] (the lmGateStream refresh
    * contract: the per-source rate table is fitted out-of-band on a
    * batch corpus — [[Sampling.temperatureRates]] — and swapped in):
    * every arriving document carries its keep/drop verdict from the
    * same 16-level md5-nibble test the batch materializer uses, via
    * a stream-static broadcast join to the |sources|-row rate table.
    * Fully STATELESS — identical verdicts at any parallelism, exact
    * replay under at-least-once delivery (keep/drop is a pure
    * function of (rates, doc_id)), and the batch and live paths
    * cannot drift because they share one projection
    * ([[Sampling.applyTemperatureRates]]). A source absent from the
    * rate table drops its docs from the gate output (inner join) —
    * the conservative verdict for a source the fit never saw; route
    * unmatched sources to a quarantine sink before the gate if they
    * must surface.
    */
  def temperatureGateStream(docs: DataFrame, rates: DataFrame): DataFrame =
    Sampling.applyTemperatureRates(docs, rates)
}
