"""Structured Streaming surface — explicit non-goal in v1 (SURVEY.md 2.8).

The reference's RabbitMQ bus is event-driven plumbing, but its crawl
*semantics* are batch-iterative per site: a finite level-synchronous BFS.
The exact-ordering and exact-resume contracts (BASELINE.json `metric`)
require deterministic wave iteration, so the wave loop is batch
(plans/crawl.py), not a streaming query.

Mapping kept on file for a future streaming mode:
  * frontier as a Delta/Iceberg streaming source, wave loop in
    foreachBatch (the batch body is run_crawl's wave, unchanged);
  * watermark column = wave id; late data impossible by construction
    (each wave's inputs are the previous checkpoint);
  * per-host fetch sessions = session windows over (host, fetch_ts);
  * custom stateful politeness = applyInPandasWithState keyed by host,
    state = tokens remaining in the budget window.

Nothing here is imported by the engine; the module documents that the
category was considered and why it is deliberately absent (SURVEY.md 7.3).
"""
