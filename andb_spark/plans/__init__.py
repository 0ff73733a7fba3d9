"""Plan-level components: statistics and access-path selection.

The reference ships an optimizer skeleton it never fills in: empty
``sql/optimizer/statistic/__init__.py`` and ``catalog/statistic.py``
stubs, unused cost fields (``physical/base.py:7-10``), and a rule-based
access-path chooser that picks an index scan when equality predicates
match a B+tree prefix (``executor/operator/logical/implementations.py:
80-142``). Catalyst subsumes the relational side of that chooser
(partition pruning, min/max skipping, join selection) — but Catalyst
knows nothing about VECTOR search, the reference's declared AI-native
direction ("we will support vector index in the future here",
implementations.py:108).

This package fills both stubs Spark-side:

- ``stats``: ANALYZE-style table statistics (row count, per-column
  min/max/ndv/null-count) computed in one scan and stored in the engine
  catalog — the content the reference's empty ``statistic`` modules
  were reserved for.
- ``ann``: access-path selection for cosine top-k — exact scan vs
  sign-LSH bucket probe — decided by rule + statistics, the direct
  analog of the reference's index-vs-seq-scan choice applied to the
  one access structure Spark lacks natively.
"""
