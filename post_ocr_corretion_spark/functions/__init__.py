"""Column-level functions: pure Catalyst expressions in ``text`` (zero
UDFs — whole-stage-codegen'd), Arrow-batched pandas UDFs in ``udfs``."""
