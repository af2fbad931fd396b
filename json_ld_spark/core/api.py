"""Public pure-Python API: expand / compact / flatten / toRdf / fromRdf.

Parity targets (reference, read-only):
  - API.expand    /root/reference/lib/json/ld/api.rb:171-214
  - API.compact   api.rb:235-264
  - API.flatten   api.rb:290-352
  - API.toRdf     api.rb:525-562
  - API.fromRdf   api.rb:584-600

All functions are pure: (document, options) → result. The Spark layer
calls them per document inside Arrow-batched UDFs; conformance tests
call them directly.
"""

from __future__ import annotations

import json
from typing import Any, Iterable, Optional

from json_ld_spark.core import compact as compact_mod
from json_ld_spark.core import errors as err
from json_ld_spark.core import expand as expand_mod
from json_ld_spark.core import flatten as flatten_mod
from json_ld_spark.core import from_rdf as from_rdf_mod
from json_ld_spark.core import to_rdf as to_rdf_mod
from json_ld_spark.core.context import Context, Options
from json_ld_spark.core.errors import JsonLdError
from json_ld_spark.core.keywords import BlankNodeNamer
from json_ld_spark.core.rdf import Triple


def _load(document: Any) -> Any:
    if isinstance(document, (str, bytes)):
        return json.loads(document)
    return document


def _make_options(options: Optional[Options], **kwargs) -> Options:
    if options is not None:
        return options
    return Options(**kwargs)


def expand(document: Any, options: Optional[Options] = None, **kwargs) -> list:
    """JSON-LD document → expanded array. Parity: api.rb:171-214."""
    options = _make_options(options, **kwargs)
    doc = _load(document)
    context = Context(options)
    if options.expand_context is not None:
        ec = options.expand_context
        if isinstance(ec, dict) and "@context" in ec:
            ec = ec["@context"]
        context = context.parse(ec, base_url=options.base)
    expanded = expand_mod.expand(
        doc, None, context, ordered=options.ordered, base_url=options.base
    )
    # unwrap top-level {"@graph": ...}-only object (api.rb:191-195)
    if (
        isinstance(expanded, dict)
        and "@graph" in expanded
        and set(expanded.keys()) == {"@graph"}
    ):
        expanded = expanded["@graph"]
    if expanded is None:
        return []
    return expanded if isinstance(expanded, list) else [expanded]


def compact(
    document: Any,
    ctx: Any,
    options: Optional[Options] = None,
    expanded_input: bool = False,
    **kwargs,
) -> dict:
    """Compact a document. Parity: api.rb:235-264."""
    options = _make_options(options, **kwargs)
    expanded = _load(document) if expanded_input else expand(document, options)
    ctx_val = ctx
    if isinstance(ctx_val, (str, bytes)):
        ctx_val = json.loads(ctx_val)
    if isinstance(ctx_val, dict) and "@context" in ctx_val:
        ctx_val = ctx_val["@context"]
    context = Context(options).parse(ctx_val, base_url=options.base)
    compacted = compact_mod.compact(
        expanded, None, context,
        ordered=options.ordered, compact_arrays=options.compact_arrays,
    )
    result: dict[str, Any] = {}
    if isinstance(compacted, list):
        if compacted:
            alias = context.compact_iri("@graph", vocab=True)
            result = {alias: compacted}
    elif compacted:
        result = compacted
    if ctx_val not in (None, {}, []) and result:
        result = {"@context": ctx_val, **result}
    elif ctx_val not in (None, {}, []):
        result = {"@context": ctx_val, **result}
    return result


def flatten(
    document: Any,
    ctx: Any = None,
    options: Optional[Options] = None,
    create_annotations: bool = False,
    **kwargs,
) -> Any:
    """Flatten a document. Parity: api.rb:290-352."""
    options = _make_options(options, **kwargs)
    expanded = expand(document, options)
    flattened = flatten_mod.flatten_expanded(
        expanded, ordered=options.ordered,
        create_annotations_flag=create_annotations,
    )
    if ctx is None:
        return flattened
    return compact(flattened, ctx, options, expanded_input=True)


def expand_with_context(document: Any, context: "Context", ordered: bool = False,
                        base_url: Optional[str] = None) -> list:
    """Expand against a pre-parsed active context (hot path for the
    Spark UDFs: the pipeline context parses once per worker, parity
    with Context.cache, context.rb:138-149)."""
    expanded = expand_mod.expand(_load(document), None, context, ordered=ordered,
                                 base_url=base_url)
    if (
        isinstance(expanded, dict)
        and set(expanded.keys()) == {"@graph"}
    ):
        expanded = expanded["@graph"]
    if expanded is None:
        return []
    return expanded if isinstance(expanded, list) else [expanded]


def expanded_to_rdf(
    expanded: list,
    namer: Optional[BlankNodeNamer] = None,
    produce_generalized_rdf: bool = False,
    rdf_direction: Optional[str] = None,
) -> list[Triple]:
    """Expanded document → triples (node map + emission)."""
    namer = namer or BlankNodeNamer()
    renamed = flatten_mod.rename_bnodes(expanded, namer)
    graph_map: dict[str, dict[str, dict]] = {"@default": {}}
    flatten_mod.create_node_map(renamed, graph_map, namer=namer)
    return list(
        to_rdf_mod.node_map_to_rdf(
            graph_map,
            namer,
            produce_generalized_rdf=produce_generalized_rdf,
            rdf_direction=rdf_direction,
        )
    )


def expanded_to_rdf_stream(
    expanded: list,
    namer: Optional[BlankNodeNamer] = None,
    produce_generalized_rdf: bool = False,
    rdf_direction: Optional[str] = None,
) -> list[Triple]:
    """Single-pass expanded document → triples (no node map).

    The Spark UDF hot path; parity with the reference's streaming
    reader (streaming_reader.rb:29-54): same graph as
    ``expanded_to_rdf`` up to triple order, duplicate assertions, and
    bnode-label interleaving (always isomorphic)."""
    namer = namer or BlankNodeNamer()
    return to_rdf_mod.stream_expanded_to_rdf(
        expanded, namer,
        produce_generalized_rdf=produce_generalized_rdf,
        rdf_direction=rdf_direction,
    )


def frame(document: Any, frame_doc: Any, options: Optional[Options] = None,
          embed: str = "@once", explicit: bool = False,
          require_all: bool = False, omit_default: bool = False,
          omit_graph: Optional[bool] = None,
          prune_blank_node_identifiers: Optional[bool] = None,
          **kwargs) -> dict:
    """Frame a document. Parity: API.frame, api.rb:383-510."""
    from json_ld_spark.core import framing as frame_mod

    options = _make_options(options, **kwargs)
    frame_loaded = _load(frame_doc)
    if not isinstance(frame_loaded, dict):
        raise JsonLdError(err.INVALID_FRAME, repr(frame_loaded))
    expanded = expand(document, options)
    frame_options = Options(
        base=options.base,
        processing_mode=options.processing_mode,
        contexts=options.contexts,
        ordered=options.ordered,
        frame_expansion=True,
    )
    expanded_frame = expand(frame_loaded, frame_options)

    ctx_val = frame_loaded.get("@context")
    context = Context(options)
    if ctx_val is not None:
        cv = ctx_val
        if isinstance(cv, dict) and "@context" in cv:
            cv = cv["@context"]
        context = context.parse(cv, base_url=options.base)
    mode_11 = context.processing_mode != "json-ld-1.0"
    if omit_graph is None:
        omit_graph = mode_11  # api.rb:448
    if prune_blank_node_identifiers is None:
        prune_blank_node_identifiers = mode_11  # api.rb:473-475

    namer = BlankNodeNamer()
    renamed = flatten_mod.rename_bnodes(expanded, namer)
    graph_map: dict[str, dict[str, dict]] = {"@default": {}}
    flatten_mod.create_node_map(renamed, graph_map, namer=namer)

    # graph selection (api.rb:455-464): frame with @graph key frames
    # the default graph, otherwise the merged graph
    frame_keys = {context.expand_iri(k, vocab=True) for k in frame_loaded}
    if "@graph" in frame_keys:
        graph = "@default"
    else:
        graph = "@merged"
        graph_map["@merged"] = flatten_mod.merge_node_map_graphs(graph_map)

    state = frame_mod.FrameState(
        graph_map, graph=graph, embed=embed, explicit=explicit,
        require_all=require_all, omit_default=omit_default,
    )
    results: list = []
    subjects = (
        sorted(state.subjects.keys())
        if options.ordered
        else list(state.subjects.keys())
    )
    frame_mod.frame_node(
        state, subjects,
        [expanded_frame[0] if expanded_frame else {}], results, None,
        ordered=options.ordered,
    )

    if prune_blank_node_identifiers:
        counts: dict = {}
        frame_mod.count_bnode_identifiers(results, counts)
        results = frame_mod.prune_bnodes(results, counts)
    results = frame_mod.cleanup_preserve(results)

    compacted = compact_mod.compact(
        results, None, context,
        ordered=options.ordered, compact_arrays=options.compact_arrays,
    )
    compacted = frame_mod.cleanup_null(compacted)
    if not omit_graph and not isinstance(compacted, list):
        compacted = [compacted]
    if isinstance(compacted, list):
        kwgraph = context.compact_iri("@graph", vocab=True)
        result: dict = {kwgraph: compacted}
    else:
        result = compacted if isinstance(compacted, dict) else {}
    if ctx_val is not None and result:
        result = {"@context": ctx_val, **result}
    elif ctx_val is not None:
        result = {"@context": ctx_val, **result}
    return result


def to_rdf(
    document: Any,
    options: Optional[Options] = None,
    namer: Optional[BlankNodeNamer] = None,
    **kwargs,
) -> list[Triple]:
    """JSON-LD document → triples. Parity: api.rb:525-562 (flatten to a
    node map first, then per-node emission)."""
    options = _make_options(options, **kwargs)
    expanded = expand(document, options)
    namer = namer or BlankNodeNamer()
    renamed = flatten_mod.rename_bnodes(expanded, namer)
    graph_map: dict[str, dict[str, dict]] = {"@default": {}}
    flatten_mod.create_node_map(renamed, graph_map, namer=namer)
    return list(
        to_rdf_mod.node_map_to_rdf(
            graph_map,
            namer,
            produce_generalized_rdf=options.produce_generalized_rdf,
            rdf_direction=options.rdf_direction,
        )
    )


def from_rdf(
    triples: Iterable[Triple],
    options: Optional[Options] = None,
    use_native_types: bool = False,
    use_rdf_type: bool = False,
    **kwargs,
) -> list:
    """Triples → expanded JSON-LD. Parity: api.rb:584-600."""
    options = _make_options(options, **kwargs)
    return from_rdf_mod.from_rdf(
        list(triples),
        ordered=options.ordered,
        use_native_types=use_native_types,
        use_rdf_type=use_rdf_type,
        rdf_direction=options.rdf_direction,
    )
