"""Pure-Python semantic core. No pyspark imports allowed in this package:
these functions define the pinned reference semantics (SURVEY.md §7.0) and
are used both by the Spark operators (inside Arrow-batched pandas UDFs) and
by the single-node parity oracle that generates golden fixtures."""
