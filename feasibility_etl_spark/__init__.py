"""feasibility_etl_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of nathan-hega/feasibility-etl
(reference at /root/reference, studied for behavior only) re-expressed as a
library over ``pyspark.sql``:

- the reference's imperative JS dataflow (projection, per-key joins, grouped
  sums, scalar math — ``etl.js``, ``lib/helpers.js``) becomes native Column /
  DataFrame expressions (zero row-at-a-time Python UDFs in the core);
- the PostgreSQL-delegated pieces (CTE view ``lib/database/schema.sql:66-94``,
  lookup-or-insert surrogate keys ``schema.sql:105-134``, INSTEAD OF INSERT
  trigger decomposition ``schema.sql:141-173``) become engine features:
  ``plans.feasibility_view`` and ``writer.denormalized``;
- large-scale training-data operators (dedup, similarity search, text
  analysis, event windowing) extend the same engine (``operators.dedup``,
  ``operators.similarity``, ``operators.text``, ``streaming.windows``).

Design stance (SURVEY.md §7.0): DataFrame everywhere, explicit schemas,
Catalyst does the optimizing, broadcast for dims, Pandas UDFs only where
built-ins genuinely cannot express the semantics.
"""

__version__ = "0.1.0"
