"""Pure-Python JSON-LD 1.1 processor core.

Implements the W3C JSON-LD 1.1 API algorithms (context processing,
expansion, flattening/node-map, deserialization to RDF, serialization
from RDF, compaction) from the public spec, with semantics matching the
reference implementation at /root/reference/lib/json/ld/ (file:line
citations in each module's docstrings).

These are deliberately Spark-free pure functions: per-document tree
recursions (see SURVEY.md §3.3 — the reference's own streaming reader
proves triple emission is a single pass per document). The Spark layer
batches them inside Arrow-vectorized UDFs.
"""

from json_ld_spark.core.api import (  # noqa: F401
    compact,
    expand,
    flatten,
    frame,
    from_rdf,
    to_rdf,
)
from json_ld_spark.core.errors import JsonLdError  # noqa: F401
from json_ld_spark.core.rdf import Triple  # noqa: F401
