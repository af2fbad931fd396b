"""Streaming JSON-LD writer: an incremental statement → text stream.

Parity: StreamingWriter.stream_{prologue,statement,epilogue}
(/root/reference/lib/json/ld/streaming_writer.rb:14-125):
  - consecutive same-subject statements merge into one node object;
    a subject change closes the current node (runs, not global merge)
  - a graph-name change closes the current graph block and opens
    `{"@id": g, "@graph": [...]}`
  - rdf:type collects into @type; literals become value objects
    (@json literals re-parse); resources become references
  - an optional context compacts each node as it is closed

The Spark counterpart of the sink side is
operators/output_docs.triples_to_documents (grouped, not streaming);
this writer is the constant-memory text-emission path for exporting a
sorted triple table partition as JSON-LD without materializing nodes.
"""

from __future__ import annotations

import json
from typing import Any, Iterable, Iterator, Optional

from json_ld_spark.core.keywords import RDF_JSON, RDF_LANGSTRING, RDF_TYPE, XSD_STRING
from json_ld_spark.core.rdf import Triple


def _term_ref(term) -> Any:
    """Resource term → @id value (quoted triples become embedded nodes)."""
    if term.kind == "quoted":
        from json_ld_spark.core.from_rdf import _quoted_repr

        return _quoted_repr(term, False, None)
    return ("_:" + term.value) if term.kind == "bnode" else term.value


def _object_json(t) -> Any:
    o = t.obj
    if o.kind != "literal":
        return {"@id": _term_ref(o)}
    if o.datatype == RDF_JSON:
        return {"@value": json.loads(o.value), "@type": "@json"}
    lit: dict[str, Any] = {"@value": o.value}
    if o.datatype == RDF_LANGSTRING and o.language:
        lit["@language"] = o.language
    elif o.datatype and o.datatype != XSD_STRING:
        lit["@type"] = o.datatype
    return lit


def stream_write_jsonld(
    triples: Iterable[Triple],
    context: Optional[dict] = None,
) -> Iterator[str]:
    """Yield JSON-LD text chunks for a statement stream.

    Constant memory: only the current node definition is held. With
    ``context``, each node compacts as it closes and the stream is
    wrapped in {"@context": ..., "@graph": [...]}.
    """
    from json_ld_spark.core import api

    if context is not None:
        yield '{"@context": %s, "@graph": [\n' % json.dumps(context)
    else:
        yield "[\n"

    current_graph: Optional[str] = None
    node: Optional[dict] = None
    wrote_any = False

    def close_node() -> Iterator[str]:
        nonlocal node, wrote_any
        if node is None:
            return
        out = node
        if context is not None:
            compacted = api.compact(out, {"@context": context},
                                    expanded_input=False)
            compacted.pop("@context", None)
            out = compacted
        if wrote_any:
            yield ",\n"
        yield json.dumps(out, sort_keys=True)
        wrote_any = True
        node = None

    def close_graph() -> Iterator[str]:
        nonlocal current_graph
        yield from close_node()
        if current_graph is not None:
            yield "]}"
            current_graph = None

    for t in triples:
        g = None
        if t.graph is not None:
            g = ("_:" + t.graph.value) if t.graph.kind == "bnode" else t.graph.value
        if g != current_graph:
            yield from close_graph()
            if g is not None:
                if wrote_any:
                    yield ",\n"
                yield '{"@id": %s, "@graph": [\n' % json.dumps(g)
                wrote_any = False
            current_graph = g
        subj = _term_ref(t.subject)
        if node is not None and node.get("@id") != subj:
            yield from close_node()
        if node is None:
            node = {"@id": subj}
        if t.predicate.value == RDF_TYPE and t.obj.kind != "literal" \
                and t.obj.kind != "quoted":
            node.setdefault("@type", []).append(t.obj.value)
        else:
            node.setdefault(t.predicate.value, []).append(_object_json(t))

    yield from close_graph()
    yield "\n]}" if context is not None else "\n]"
