"""sylk — a Ray-Data-native RFC 5424 log pipeline engine.

Brand-new engine with the query/data-processing capabilities of the
reference crate ``syslog_rfc5424`` (``/root/reference``), re-expressed as
``ray.data.Dataset`` pipelines: vectorized parse -> actor-pool enrich ->
hash-partitioned route -> groupby aggregate, plus training-data operators
(dedup, similarity search, text analysis) over Parquet tables.

Layout:
  functions/  scalar semantics: the faithful parser oracle, enum lookups,
              canonical JSON, SD accessors
  stages/     map_batches stages: parse, enrich, route, aggregate, text,
              dedup, similarity, multimodal
  sources/    transcript synthesizer + conformance corpus + readers
  pipelines/  end-to-end composed pipelines (flagship parse->aggregate)
  state/      checkpoint/resume manifest
"""

__version__ = "0.1.0"
