"""inform_spark — a PySpark-native URL-frontier + fetch-scheduler engine.

A from-scratch reimplementation of the capabilities of fwdslsh/inform
(reference: /root/reference, a Bun web crawler / HTML->Markdown converter)
as an idiomatic Spark engine:

- the crawl loop (reference src/WebCrawler.js:244-273) becomes iterative
  DataFrame micro-batches checkpointed to snapshot tables
  (:mod:`inform_spark.plans.crawl`);
- the in-memory ``visited`` set (src/WebCrawler.js:54) becomes an exact
  ``seen`` table probed with a left anti-join, plus a sharded bloom filter
  for the 10^10-URL scale path (:mod:`inform_spark.operators.bloom`);
- politeness pacing (src/WebCrawler.js:265-267) becomes a per-host
  token-bucket admission window (:mod:`inform_spark.operators.politeness`);
- HTML->markdown (src/WebCrawler.js:75-118,363-479) becomes vectorized
  pandas UDF batches emitting interleaved text+media spans
  (:mod:`inform_spark.functions.html`, :mod:`inform_spark.functions.spans`).

All data-plane logic is DataFrame ops + pandas/Arrow UDFs — no per-row
Python UDFs, no RDDs.
"""

__version__ = "0.1.0"
