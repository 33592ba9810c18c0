/** graft — Spark-native trace analytics engine.
  *
  * Package map (see SURVEY.md §2 for the capability inventory and
  * README.md for the reference→graft table):
  *
  *  - [[graft.model]]      span/trace data model
  *  - [[graft.trace]]      per-trace pipeline (transformers, validators,
  *                         call graph) + distributed wrappers and the
  *                         unified store writer
  *  - [[graft.operators]]  columnar operators: span stream, search
  *                         expression trees, layouts (time-partitioned,
  *                         bucketed), text/dedup, vectors/ANN, skew,
  *                         multimodal
  *  - [[graft.functions]]  native Catalyst expressions + typed
  *                         aggregators (fnv_hash64, simhash48,
  *                         minhash_sig, json_tags_map, lsh_band_keys,
  *                         pack_blob/unpack_blob, bounded-heap top-k)
  *  - [[graft.plans]]      custom logical/physical plans (AS-OF join)
  *  - [[graft.streaming]]  Structured Streaming ingest: buffer assembly,
  *                         dedup, windowed index docs, latency
  *                         percentile sketches, kafka source/sink wiring
  *  - [[graft.queries]]    the driver-facing query packs with their
  *                         DuckDB oracles
  *
  * Session integration: `spark.sql.extensions=graft.GraftExtensions`, or
  * programmatic `GraftExtensions.register(spark)` /
  * `graft.plans.AsOfJoin.register(spark)`.
  */
package object graft
