"""tiktok_whisper_spark — a from-scratch PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
(`daymade/tiktok-whisper`, a Go transcription CLI + web app) as an idiomatic
Spark engine:

* relational operators (filters / aggregations / windows / joins / exports)
  over transcript-shaped tables — see :mod:`.operators.relational`;
* a link-graph analytics core (PageRank, connected components, label
  propagation, triangle counting) over edge tables derived from multi-turn
  transcripts — see :mod:`.graph`;
* vector similarity / duplicate detection / clustering — see
  :mod:`.operators.similarity` and :mod:`.operators.dedup`;
* text-analysis and training-data-pipeline utilities — see
  :mod:`.operators.text`;
* checkpointed, resumable iterative jobs with per-superstep lineage and
  metrics — see :mod:`.sources.catalog` and :mod:`.graph.runner`.

Design rules (enforced across the package):

* DataFrame/SQL first — Catalyst plans everything; Python touches data only
  through Arrow-vectorized pandas UDFs (``pandas_udf`` / ``applyInPandas`` /
  ``mapInPandas``). No row-at-a-time Python UDFs, no ``rdd.map``.
* float64 accumulation for all numeric kernels (1e-6 correctness bar).
* determinism: fixed seeds, explicit tie-breaks, canonical orderings.
"""

__version__ = "0.1.0"
