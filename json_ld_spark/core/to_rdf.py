"""Deserialize JSON-LD to RDF: expanded/flattened document → triples.

Implements W3C JSON-LD 1.1 §8 (Deserialize JSON-LD to RDF Algorithm).
Parity targets (reference, read-only):
  - API.toRdf driver      /root/reference/lib/json/ld/api.rb:525-562
  - item_to_rdf           /root/reference/lib/json/ld/to_rdf.rb:19-156
  - parse_list            to_rdf.rb:167-187
  - literal forms         to_rdf.rb:23-79 (see core/rdf.py)

Design note (SURVEY §3.3): the reference's own streaming reader proves
triple emission needs no global state — this function is pure per
document, which is what makes the Spark job embarrassingly parallel
until canonicalization.
"""

from __future__ import annotations

from typing import Any, Iterator, Optional

from json_ld_spark.core.keywords import (
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    BlankNodeNamer,
    is_absolute_iri,
    is_blank_node_id,
    is_list_object,
    is_value_object,
)
from json_ld_spark.core.rdf import (
    QUOTED,
    Term,
    Triple,
    as_term,
    bnode,
    iri,
    object_to_rdf_literal,
)


def _valid_subject(t: Term) -> bool:
    if t.kind == QUOTED:
        return True  # embedded statements validated at expansion
    return t.kind == "bnode" or (t.kind == "iri" and is_absolute_iri(t.value))


def _valid_predicate(t: Term, generalized: bool) -> bool:
    if t.kind == "bnode":
        return generalized  # api.rb:550
    return t.kind == "iri" and is_absolute_iri(t.value)


def _valid_object(t: Term) -> bool:
    return t.kind == "literal" or _valid_subject(t)


def node_map_to_rdf(
    graph_map: dict[str, dict[str, dict]],
    namer: BlankNodeNamer,
    produce_generalized_rdf: bool = False,
    rdf_direction: Optional[str] = None,
) -> Iterator[Triple]:
    """Node map → triples. Parity: api.rb:544-560."""
    for graph_name in sorted(graph_map.keys()):
        if graph_name == "@default":
            graph_term: Optional[Term] = None
        elif is_blank_node_id(graph_name):
            graph_term = bnode(graph_name)
        elif is_absolute_iri(graph_name):
            graph_term = iri(graph_name)
        else:
            continue  # relative graph names are skipped
        nodes = graph_map[graph_name]
        for subject_id in sorted(nodes.keys()):
            node = nodes[subject_id]
            for triple in _node_to_rdf(node, namer, rdf_direction):
                s, p, o = triple
                if (
                    _valid_subject(s)
                    and _valid_predicate(p, produce_generalized_rdf)
                    and _valid_object(o)
                ):
                    yield Triple(s, p, o, graph_term)


def _subject_term(node: dict, namer: BlankNodeNamer) -> Term:
    sid = node.get("@id")
    if sid is None:
        return bnode(namer.get_name())
    if isinstance(sid, dict):
        return _quoted_term(sid, namer)
    return as_term(sid)


def _quoted_term(embedded: dict, namer: BlankNodeNamer,
                 rdf_direction: "Optional[str]" = None) -> Term:
    """Embedded node → RDF-star quoted-triple term (its single
    statement; cardinality was validated during expansion,
    to_rdf.rb:89-92)."""
    first = next(iter(_node_to_rdf(embedded, namer, rdf_direction)), None)
    if first is None:
        raise ValueError(f"embedded node emits no statement: {embedded!r}")
    s, p, o = first
    return Term(QUOTED, Triple(s, p, o, None))


def _node_to_rdf(
    node: dict, namer: BlankNodeNamer, rdf_direction: Optional[str]
) -> Iterator[tuple[Term, Term, Term]]:
    """One node-map node → (s, p, o) tuples. Parity: item_to_rdf,
    to_rdf.rb:19-156, operating on node-map entries (values are already
    node references / value objects / list objects)."""
    subject = _subject_term(node, namer)
    for prop in sorted(node.keys()):
        values = node[prop]
        if prop == "@type":
            values = values if isinstance(values, list) else [values]
            for t in values:
                yield subject, iri(RDF_TYPE), as_term(t)
            continue
        if prop in ("@id", "@index", "@graph", "@included", "@annotation"):
            continue
        if prop == "@reverse":
            # node maps resolve @reverse during creation; handle raw
            # expanded input defensively (to_rdf.rb:109-123)
            for rprop, rvalues in values.items():
                for rv in rvalues:
                    o = _object_term(rv, namer, rdf_direction)
                    if o is not None:
                        obj_term, extra = o
                        yield from extra
                        yield obj_term, iri(rprop), subject
            continue
        if prop.startswith("@"):
            continue
        values = values if isinstance(values, list) else [values]
        pred = as_term(prop)
        for value in values:
            res = _object_term(value, namer, rdf_direction)
            if res is None:
                continue
            obj_term, extra = res
            yield from extra
            yield subject, pred, obj_term


def _object_term(
    value: Any, namer: BlankNodeNamer, rdf_direction: Optional[str]
) -> Optional[tuple[Term, list]]:
    """Value → (object term, [list-chain triples])."""
    if is_value_object(value):
        lit = object_to_rdf_literal(
            value["@value"],
            value.get("@type"),
            value.get("@language"),
            value.get("@direction"),
            rdf_direction,
        )
        return lit, []
    if is_list_object(value):
        chain: list[tuple[Term, Term, Term]] = []
        head = _parse_list(value["@list"], namer, rdf_direction, chain)
        return head, chain
    if isinstance(value, dict):
        sid = value.get("@id")
        if sid is None:
            return bnode(namer.get_name()), []
        if isinstance(sid, dict):
            return _quoted_term(sid, namer, rdf_direction), []
        if not (is_blank_node_id(sid) or is_absolute_iri(sid)):
            return None  # relative IRIs don't survive toRDF
        return as_term(sid), []
    return None


def stream_expanded_to_rdf(
    expanded: list,
    namer: BlankNodeNamer,
    produce_generalized_rdf: bool = False,
    rdf_direction: Optional[str] = None,
) -> list[Triple]:
    """Single-pass expanded document → triples, skipping rename_bnodes
    and create_node_map entirely.

    Parity: the reference's own streaming reader
    (streaming_reader.rb:29-54, 74-423) emits statements in one pass
    without flattening — proof the node map is not required for
    emission. Semantics equal the node-map path up to (a) triple order,
    (b) duplicate assertions when one @id node appears twice in the
    tree (the node map dedups eagerly; the stream — like the streaming
    reader — relies on RDF set semantics downstream), and (c) bnode
    label interleaving (anonymous nodes are named in visit order, not
    after all labeled ones) — graphs are always isomorphic.

    This is the Spark UDF hot path: one traversal instead of three
    (~30% of per-document CPU at the measured profile).

    RDF-star: embedded @id subjects/objects emit quoted-triple terms;
    @annotation reification is a node-map concern (flatten.rb:60-151)
    and is NOT performed here — use the node-map path (api.to_rdf)
    for annotated documents. Pipeline turn docs carry no annotations.
    """
    out: list[Triple] = []
    for element in expanded:
        if isinstance(element, dict):
            _stream_node(element, None, namer, produce_generalized_rdf,
                         rdf_direction, out)
    return out


def _stream_subject(element: dict, namer: BlankNodeNamer) -> Term:
    sid = element.get("@id")
    if sid is None:
        return as_term(namer.get_name())
    if isinstance(sid, dict):
        return _quoted_term(sid, namer)
    if isinstance(sid, str) and is_blank_node_id(sid):
        return as_term(namer.get_name(sid))
    return as_term(sid)  # relative IRIs filtered at emit time


def _stream_node(
    element: dict,
    graph_term: Optional[Term],
    namer: BlankNodeNamer,
    generalized: bool,
    rdf_direction: Optional[str],
    out: list,
) -> Term:
    """Emit one expanded node object's triples; return its subject term.

    Mirrors item_to_rdf (to_rdf.rb:19-156) but recurses into nested
    node objects (expanded trees are not flattened here)."""
    subject = _stream_subject(element, namer)
    s_ok = _valid_subject(subject)
    for prop, values in element.items():
        if prop == "@type":
            if s_ok:
                p = iri(RDF_TYPE)
                for t in values if isinstance(values, list) else [values]:
                    o = as_term(namer.get_name(t) if is_blank_node_id(t) else t)
                    if _valid_object(o):
                        out.append(Triple(subject, p, o, graph_term))
            continue
        if prop == "@graph":
            # nested graph: contents named by this node's subject
            # (to_rdf.rb:104-108); relative graph names drop contents
            # (node_map_to_rdf parity)
            if subject.kind == "bnode" or (
                subject.kind == "iri" and is_absolute_iri(subject.value)
            ):
                for item in values:
                    if isinstance(item, dict):
                        _stream_node(item, subject, namer, generalized,
                                     rdf_direction, out)
            continue
        if prop == "@included":
            for item in values:
                if isinstance(item, dict):
                    _stream_node(item, graph_term, namer, generalized,
                                 rdf_direction, out)
            continue
        if prop == "@reverse":
            for rprop, rvalues in values.items():
                p = as_term(rprop)
                p_ok = _valid_predicate(p, generalized)
                for rv in rvalues:
                    if not isinstance(rv, dict) or is_value_object(rv):
                        continue  # expansion guarantees node objects here
                    child = _stream_node(rv, graph_term, namer, generalized,
                                         rdf_direction, out)
                    if p_ok and s_ok and _valid_subject(child):
                        out.append(Triple(child, p, subject, graph_term))
            continue
        if prop.startswith("@"):
            continue  # @id/@index/@annotation handled or skipped
        p = as_term(prop)
        if not _valid_predicate(p, generalized):
            # still recurse: nested nodes own their triples regardless
            for value in values if isinstance(values, list) else [values]:
                if isinstance(value, dict) and not is_value_object(value) \
                        and not is_list_object(value):
                    _stream_node(value, graph_term, namer, generalized,
                                 rdf_direction, out)
            continue
        for value in values if isinstance(values, list) else [values]:
            o = _stream_object(value, graph_term, namer, generalized,
                               rdf_direction, out)
            if o is not None and s_ok and _valid_object(o):
                out.append(Triple(subject, p, o, graph_term))
    return subject


def _stream_object(
    value: Any,
    graph_term: Optional[Term],
    namer: BlankNodeNamer,
    generalized: bool,
    rdf_direction: Optional[str],
    out: list,
) -> Optional[Term]:
    if is_value_object(value):
        return object_to_rdf_literal(
            value["@value"], value.get("@type"), value.get("@language"),
            value.get("@direction"), rdf_direction,
        )
    if is_list_object(value):
        return _stream_list(value["@list"], graph_term, namer, generalized,
                            rdf_direction, out)
    if isinstance(value, dict):
        return _stream_node(value, graph_term, namer, generalized,
                            rdf_direction, out)
    return None


def _stream_list(
    items: list,
    graph_term: Optional[Term],
    namer: BlankNodeNamer,
    generalized: bool,
    rdf_direction: Optional[str],
    out: list,
) -> Term:
    """rdf:first/rdf:rest chain (to_rdf.rb:167-187), streaming items."""
    if not items:
        return iri(RDF_NIL)
    nodes = [bnode(namer.get_name()[2:]) for _ in items]
    first_iri, rest_iri = iri(RDF_FIRST), iri(RDF_REST)
    for i, item in enumerate(items):
        o = _stream_object(item, graph_term, namer, generalized,
                           rdf_direction, out)
        first: Term = o if o is not None and _valid_object(o) else iri(RDF_NIL)
        out.append(Triple(nodes[i], first_iri, first, graph_term))
        rest: Term = nodes[i + 1] if i + 1 < len(nodes) else iri(RDF_NIL)
        out.append(Triple(nodes[i], rest_iri, rest, graph_term))
    return nodes[0]


def _parse_list(
    items: list,
    namer: BlankNodeNamer,
    rdf_direction: Optional[str],
    out: list,
) -> Term:
    """rdf:first/rdf:rest chain. Parity: parse_list, to_rdf.rb:167-187."""
    if not items:
        return iri(RDF_NIL)
    nodes = [bnode(namer.get_name()) for _ in items]
    for i, item in enumerate(items):
        res = _object_term(item, namer, rdf_direction)
        first: Term = iri(RDF_NIL)
        if res is not None:
            obj_term, extra = res
            out.extend(extra)
            first = obj_term
        out.append((nodes[i], iri(RDF_FIRST), first))
        rest: Term = nodes[i + 1] if i + 1 < len(nodes) else iri(RDF_NIL)
        out.append((nodes[i], iri(RDF_REST), rest))
    return nodes[0]
