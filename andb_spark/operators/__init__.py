"""Custom operators the Spark builtins don't ship directly.

Implemented per the preference order in SURVEY.md §7 / the build brief:
(1) composition of built-in DataFrame ops (dedup, similarity, as-of);
(2) Arrow-batched pandas UDFs only where unavoidable (multimodal decode
stubs). Nothing here uses row-at-a-time Python UDFs or driver-side
loops — every operator is a DataFrame→DataFrame transform that scales
with the cluster.
"""
