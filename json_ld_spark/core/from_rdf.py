"""Serialize RDF as JSON-LD: triples → expanded document.

Implements W3C JSON-LD 1.1 §9 (Serialize RDF as JSON-LD Algorithm):
group by graph → subject, rdf:type → @type, rdf:first/rest chain
collapse to @list, native-type round-trips, compound i18n literals.

Parity targets (reference, read-only):
  - from_statements        /root/reference/lib/json/ld/from_rdf.rb:22-188
  - list reconstitution    from_rdf.rb:134-166
  - resource_representation from_rdf.rb:194-251

This stage is genuinely relational (SURVEY §2.6) — the Spark layer has
an equivalent DataFrame implementation (operators/from_rdf_ops.py);
this pure version is the semantic oracle for it.
"""

from __future__ import annotations

import json
from typing import Any, Optional

from json_ld_spark.core.keywords import (
    I18N_BASE,
    RDF_DIRECTION,
    RDF_FIRST,
    RDF_JSON,
    RDF_LANGSTRING,
    RDF_LANGUAGE,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    RDF_VALUE,
    XSD_BOOLEAN,
    XSD_DOUBLE,
    XSD_INTEGER,
    XSD_STRING,
)
from json_ld_spark.core.rdf import Term, Triple, canonical_double


def _term_id(t: Term) -> str:
    return ("_:" + t.value) if t.kind == "bnode" else t.value


def _quoted_repr(t: Term, use_native_types: bool,
                 rdf_direction: Optional[str]) -> dict:
    """Quoted-triple term → embedded node dict (from_rdf.rb:51,66 via
    resource_representation on RDF-star statements)."""
    tr = t.value
    subj = (
        _quoted_repr(tr.subject, use_native_types, rdf_direction)
        if tr.subject.kind == "quoted"
        else _term_id(tr.subject)
    )
    obj = resource_representation(tr.obj, use_native_types, rdf_direction)
    return {"@id": subj, _term_id(tr.predicate): [obj]}


def _subject_key(t: Term, use_native_types: bool,
                 rdf_direction: Optional[str]):
    """(node-map key, @id value) for a subject/object term."""
    from json_ld_spark.core.rdf import jcs_canonicalize

    if t.kind == "quoted":
        rep = _quoted_repr(t, use_native_types, rdf_direction)
        return jcs_canonicalize(rep), rep
    return _term_id(t), _term_id(t)


def resource_representation(
    t: Term, use_native_types: bool, rdf_direction: Optional[str]
) -> dict:
    """Term → JSON object. Parity: from_rdf.rb:194-251."""
    if t.kind == "quoted":
        return {"@id": _quoted_repr(t, use_native_types, rdf_direction)}
    if t.kind != "literal":
        return {"@id": _term_id(t)}
    dt = t.datatype or XSD_STRING
    if dt == RDF_JSON:
        return {"@value": json.loads(t.value), "@type": "@json"}
    if rdf_direction == "i18n-datatype" and dt.startswith(I18N_BASE):
        lang_dir = dt[len(I18N_BASE) :]
        lang, _, direction = lang_dir.partition("_")
        result: dict[str, Any] = {"@value": t.value}
        if lang:
            result["@language"] = lang
        if direction:
            result["@direction"] = direction
        return result
    if dt == RDF_LANGSTRING:
        return {"@value": t.value, "@language": t.language}
    if use_native_types:
        if dt == XSD_BOOLEAN and t.value in ("true", "false"):
            return {"@value": t.value == "true"}
        if dt == XSD_INTEGER:
            try:
                return {"@value": int(t.value)}
            except ValueError:
                pass
        if dt == XSD_DOUBLE:
            try:
                f = float(t.value)
                if canonical_double(f):  # parses
                    return {"@value": f}
            except ValueError:
                pass
        if dt == XSD_STRING:
            return {"@value": t.value}
    value = t.value
    if dt == XSD_DOUBLE:
        # valid non-native doubles re-canonicalize (from_rdf.rb:239)
        try:
            value = canonical_double(float(value))
        except ValueError:
            pass
    result = {"@value": value}
    if dt != XSD_STRING:
        result["@type"] = dt
    return result


def from_rdf(
    triples: list[Triple],
    ordered: bool = False,
    use_native_types: bool = False,
    use_rdf_type: bool = False,
    rdf_direction: Optional[str] = None,
) -> list:
    """Statements → expanded JSON-LD array. Parity: from_rdf.rb:22-188."""
    default_graph: dict[str, dict] = {}
    graph_map: dict[str, dict[str, dict]] = {"@default": default_graph}
    referenced_once: dict[str, Any] = {}

    for t in triples:
        graph_name = _term_id(t.graph) if t.graph is not None else "@default"
        node_map = graph_map.setdefault(graph_name, {})
        if graph_name != "@default":
            default_graph.setdefault(graph_name, {"@id": graph_name})
        sid, sid_val = _subject_key(t.subject, use_native_types, rdf_direction)
        pid = _term_id(t.predicate)
        node = node_map.setdefault(sid, {"@id": sid_val})
        if t.obj.kind != "literal":
            okey, oval = _subject_key(t.obj, use_native_types, rdf_direction)
            node_map.setdefault(okey, {"@id": oval})
        if pid == RDF_TYPE and t.obj.kind != "literal" and not use_rdf_type:
            types = node.setdefault("@type", [])
            if _term_id(t.obj) not in types:
                types.append(_term_id(t.obj))
            continue
        value = resource_representation(t.obj, use_native_types, rdf_direction)
        values = node.setdefault(pid, [])
        if value not in values:
            values.append(value)
        # list-usage tracking (from_rdf.rb:95-103)
        if _term_id(t.obj) == RDF_NIL:
            usages = node_map[RDF_NIL].setdefault("usages", [])
            usages.append({"node": node, "property": pid, "value": value})
        elif t.obj.kind == "bnode":
            oid = _term_id(t.obj)
            if oid in referenced_once:
                referenced_once[oid] = False
            else:
                referenced_once[oid] = {"node": node, "property": pid, "value": value}

    # compound-literal reconstitution (from_rdf.rb:108-132)
    if rdf_direction == "compound-literal":
        for graph_name, node_map in graph_map.items():
            for cl_id in list(node_map.keys()):
                cl = referenced_once.get(cl_id)
                if not isinstance(cl, dict):
                    continue
                cl_node = node_map.get(cl_id)
                if cl_node is None or RDF_VALUE not in cl_node:
                    continue
                if RDF_LANGUAGE in cl_node or RDF_DIRECTION in cl_node:
                    value = cl["value"]
                    value.pop("@id", None)
                    value["@value"] = cl_node[RDF_VALUE][0]["@value"]
                    if RDF_LANGUAGE in cl_node:
                        value["@language"] = cl_node[RDF_LANGUAGE][0]["@value"]
                    if RDF_DIRECTION in cl_node:
                        value["@direction"] = cl_node[RDF_DIRECTION][0]["@value"]
                    node_map.pop(cl_id, None)

    # list reconstitution (from_rdf.rb:134-166)
    for graph_name, node_map in graph_map.items():
        nil_node = node_map.get(RDF_NIL)
        if nil_node is None:
            continue
        rdf_list_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#List"

        def _well_formed_list_node(n: dict) -> bool:
            nid = n.get("@id")
            return (
                isinstance(nid, str)
                and nid.startswith("_:")
                and isinstance(referenced_once.get(nid), dict)
                and len(n.get(RDF_FIRST, [])) == 1
                and len(n.get(RDF_REST, [])) == 1
                and n.get("@type", [rdf_list_type]) == [rdf_list_type]
                and set(n.keys()) <= {"@id", "@type", RDF_FIRST, RDF_REST, "usages"}
            )

        for usage in nil_node.get("usages", []):
            node, prop, head = usage["node"], usage["property"], usage["value"]
            lst: list = []
            list_nodes: list[str] = []
            while prop == RDF_REST and _well_formed_list_node(node):
                lst.append(node[RDF_FIRST][0])
                list_nodes.append(node["@id"])
                ref = referenced_once[node["@id"]]
                node, prop, head = ref["node"], ref["property"], ref["value"]
            head.pop("@id", None)
            lst.reverse()
            head["@list"] = lst
            for nid in list_nodes:
                node_map.pop(nid, None)
        nil_node.pop("usages", None)

    # fold rdfstar reifications back into @annotation (from_rdf.rb:169)
    from json_ld_spark.core.flatten import create_annotations

    for node_map in graph_map.values():
        create_annotations(node_map)

    result = []
    for sid in sorted(default_graph.keys()) if ordered else default_graph.keys():
        node = default_graph[sid]
        if sid in graph_map and sid != "@default":
            graph_nodes = graph_map[sid]
            node["@graph"] = [
                n
                for gid, n in (
                    sorted(graph_nodes.items()) if ordered else graph_nodes.items()
                )
                if not (set(n.keys()) <= {"@id", "usages"})
            ]
            for n in node["@graph"]:
                n.pop("usages", None)
        node.pop("usages", None)
        if set(node.keys()) <= {"@id"}:
            continue
        result.append(node)
    return result
