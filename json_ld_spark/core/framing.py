"""JSON-LD 1.1 Framing: declarative match-and-reshape over the node
map (the reference's "query language", SURVEY §2.8).

Implements the W3C JSON-LD 1.1 Framing algorithm core: frame matching
(@id set / @type exact+wildcard+match-none / property patterns /
@requireAll), embed policies @once/@always/@never, @explicit,
@default, @embed/@omitDefault flags, @preserve/null cleanup, and
pruning of single-use blank-node identifiers.

Parity targets (reference, read-only):
  - frame                 /root/reference/lib/json/ld/frame.rb:26-215
  - filter_subjects       frame.rb:326-457
  - value_match?/node_match?  frame.rb:592-620
  - prune_bnodes          frame.rb:220-266
  - cleanup_preserve/null frame.rb:273-311
"""

from __future__ import annotations

import json
from typing import Any, Optional

from json_ld_spark.core.keywords import (
    BlankNodeNamer,
    add_value,
    is_blank_node_id,
    is_list_object,
    is_value_object,
)


class FrameState:
    def __init__(self, graph_map: dict, embed: str = "@once",
                 explicit: bool = False, require_all: bool = False,
                 omit_default: bool = False, omit_graph: bool = True):
        self.graph_map = graph_map
        self.graph = "@default"
        self.embed = embed
        self.explicit = explicit
        self.require_all = require_all
        self.omit_default = omit_default
        self.embedded = set()  # subjects embedded on the current path
        self.uniquely_embedded: dict[str, bool] = {}
        self.bnodes_to_clear: set[str] = set()
        self.link: dict[str, Any] = {}

    @property
    def subjects(self) -> dict:
        return self.graph_map.get(self.graph, {})


def _as_list(v: Any) -> list:
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


def _frame_value(frame: dict, key: str, default: Any) -> Any:
    v = frame.get(key)
    if isinstance(v, list):
        v = v[0] if v else None
    if isinstance(v, dict) and "@value" in v:
        v = v["@value"]
    return v if v is not None else default


def _is_wildcard(v: Any) -> bool:
    return v == {} or v == [{}] or (isinstance(v, list) and v and v[0] == {})


def value_match(pattern: dict, value: dict) -> bool:
    """Parity: frame.rb:592-606."""
    v1, t1, l1 = value.get("@value"), value.get("@type"), value.get("@language")
    v2 = _as_list(pattern.get("@value"))
    t2 = _as_list(pattern.get("@type"))
    l2 = _as_list(pattern.get("@language"))
    l2 = [x.lower() if isinstance(x, str) else x for x in l2]
    if not v2 and not t2 and not l2:
        return True
    if v2 and not (v1 in v2 or v2 == [{}]):
        return False
    if t2 and not (t1 in t2 or (t1 is not None and t2 == [{}])):
        return False
    if l2 and not (
        (l1.lower() if isinstance(l1, str) else l1) in l2
        or (l1 is not None and l2 == [{}])
    ):
        return False
    return True


def node_match(state: FrameState, pattern: dict, value: dict) -> bool:
    if "@id" not in value:
        return False
    node = state.subjects.get(value["@id"])
    return node is not None and filter_subject(state, node, pattern)


def filter_subject(state: FrameState, subject: dict, frame: dict,
                   require_all: bool = False) -> bool:
    """Parity: filter_subject, frame.rb:350-457 (condensed)."""
    types = _as_list(frame.get("@type"))
    if types:
        node_types = _as_list(subject.get("@type"))
        if types == [{}]:
            if not node_types:
                return False
        elif len(types) == 1 and isinstance(types[0], dict) and types[0].get("@default") is not None:
            pass  # type with @default always matches
        elif not set(t for t in types if isinstance(t, str)) & set(node_types):
            return False
        return True

    ids = [v for v in _as_list(frame.get("@id")) if isinstance(v, str)]
    if ids:
        return subject.get("@id") in ids
    if _is_wildcard(frame.get("@id")):
        pass  # wildcard @id matches anything

    # property matching
    matched_any = False
    for prop, pattern in frame.items():
        if prop in ("@id", "@type") or (prop.startswith("@") and prop not in ("@reverse",)):
            continue
        node_values = _as_list(subject.get(prop))
        pat_list = _as_list(pattern)
        pat = pat_list[0] if pat_list else {}
        is_empty_pat = isinstance(pat, dict) and not any(
            k for k in pat if k not in ("@default",)
        )
        has_default = isinstance(pat, dict) and "@default" in pat
        if node_values:
            if isinstance(pat, dict) and not is_empty_pat:
                ok = any(
                    (is_value_object(v) and value_match(pat, v))
                    or (isinstance(v, dict) and "@id" in v and node_match(state, pat, v))
                    or (is_list_object(v) and any(
                        (is_value_object(li) and value_match(
                            _as_list(pat.get("@list", [{}]))[0] if pat.get("@list") else {}, li))
                        or (isinstance(li, dict) and "@id" in li)
                        for li in v.get("@list", [])
                    ))
                    for v in node_values
                )
                if not ok and require_all:
                    return False
                if ok:
                    matched_any = True
            else:
                matched_any = True
        else:
            if has_default:
                matched_any = True
            elif require_all:
                return False

    if require_all:
        return True
    # match if no property constraints, or any matched
    constrained = [
        p for p in frame
        if not p.startswith("@") or p == "@reverse"
    ]
    return matched_any or not constrained


def filter_subjects(state: FrameState, subjects: list[str], frame: dict) -> list[str]:
    """Parity: frame.rb:326-343."""
    return [
        sid
        for sid in subjects
        if sid in state.subjects
        and filter_subject(state, state.subjects[sid], frame, state.require_all)
    ]


def frame_node(state: FrameState, subjects: list[str], frame: dict,
               parent: Any, active_property: Optional[str]) -> None:
    """Parity: frame, frame.rb:26-215 (the @once/@never/@always subset)."""
    embed = _frame_value(frame, "@embed", state.embed)
    explicit = bool(_frame_value(frame, "@explicit", state.explicit))
    require_all = bool(_frame_value(frame, "@requireAll", state.require_all))
    state =_clone_state(state, require_all)

    matches = filter_subjects(state, subjects, frame)
    for sid in sorted(matches):
        subject = state.subjects[sid]
        output: dict[str, Any] = {"@id": sid}
        if is_blank_node_id(sid):
            state.bnodes_to_clear.discard(sid)

        if embed == "@never" or sid in state.embedded:
            _add_output(parent, active_property, {"@id": sid})
            continue
        if embed == "@once" and state.uniquely_embedded.get(sid):
            _add_output(parent, active_property, {"@id": sid})
            continue
        state.embedded = state.embedded | {sid}
        state.uniquely_embedded[sid] = True

        for prop in sorted(subject.keys()):
            values = subject[prop]
            if prop == "@id":
                continue
            if prop == "@type":
                output["@type"] = list(values)
                continue
            if prop.startswith("@"):
                output[prop] = values
                continue
            if explicit and prop not in frame:
                continue
            sub_frame = frame.get(prop)
            sub_frame = (
                sub_frame[0]
                if isinstance(sub_frame, list) and sub_frame
                else sub_frame
            )
            if not isinstance(sub_frame, dict):
                sub_frame = {}
            for value in values:
                if is_list_object(value):
                    list_out: dict[str, Any] = {"@list": []}
                    for item in value["@list"]:
                        if isinstance(item, dict) and "@id" in item and not is_value_object(item):
                            lf = sub_frame.get("@list", [{}])
                            lf = lf[0] if isinstance(lf, list) and lf else {}
                            frame_node(
                                state, [item["@id"]],
                                lf if isinstance(lf, dict) else {},
                                list_out, "@list",
                            )
                        else:
                            add_value(list_out, "@list", item, property_is_array=True)
                    add_value(output, prop, list_out, property_is_array=True)
                elif isinstance(value, dict) and "@id" in value and not is_value_object(value):
                    frame_node(state, [value["@id"]], sub_frame, output, prop)
                else:
                    if not sub_frame or value_match(sub_frame, value) or not is_value_object(value):
                        add_value(output, prop, value, property_is_array=True)

        # defaults (@default in frame properties not on subject)
        for prop in sorted(frame.keys()):
            if prop.startswith("@") or prop in output:
                continue
            pat = frame[prop]
            pat = pat[0] if isinstance(pat, list) and pat else pat
            if not isinstance(pat, dict):
                continue
            if bool(_frame_value(pat, "@omitDefault", state.omit_default)):
                continue
            if "@default" in pat:
                default = pat["@default"]
                default = default if isinstance(default, list) else [default]
                output[prop] = [{"@preserve": default}]

        _add_output(parent, active_property, output)
        state.embedded = state.embedded - {sid}


def _clone_state(state: FrameState, require_all: bool) -> FrameState:
    ns = FrameState(
        state.graph_map, state.embed, state.explicit, require_all,
        state.omit_default,
    )
    ns.graph = state.graph
    ns.embedded = state.embedded
    ns.uniquely_embedded = state.uniquely_embedded
    ns.bnodes_to_clear = state.bnodes_to_clear
    ns.link = state.link
    return ns


def _add_output(parent: Any, prop: Optional[str], value: Any) -> None:
    if isinstance(parent, list):
        parent.append(value)
    else:
        add_value(parent, prop, value, property_is_array=True)


def count_bnode_identifiers(element: Any, counts: dict) -> None:
    """Parity: frame.rb:220-236."""
    if isinstance(element, list):
        for e in element:
            count_bnode_identifiers(e, counts)
    elif isinstance(element, dict):
        for k, v in element.items():
            if k == "@id" and isinstance(v, str) and is_blank_node_id(v):
                counts[v] = counts.get(v, 0) + 1
            else:
                count_bnode_identifiers(v, counts)


def prune_bnodes(element: Any, counts: dict) -> Any:
    """Strip @id from bnodes used exactly once. Parity: frame.rb:243-266."""
    if isinstance(element, list):
        return [prune_bnodes(e, counts) for e in element]
    if isinstance(element, dict):
        out = {}
        for k, v in element.items():
            if (
                k == "@id"
                and isinstance(v, str)
                and is_blank_node_id(v)
                and counts.get(v, 0) == 1
            ):
                continue
            out[k] = prune_bnodes(v, counts)
        return out
    return element


def cleanup_preserve(element: Any) -> Any:
    """Parity: frame.rb:273-296."""
    if isinstance(element, list):
        return [cleanup_preserve(e) for e in element]
    if isinstance(element, dict):
        if "@preserve" in element and len(element) == 1:
            pres = element["@preserve"]
            pres = cleanup_preserve(pres)
            if isinstance(pres, list) and len(pres) == 1:
                return pres[0]
            return pres
        return {k: cleanup_preserve(v) for k, v in element.items()}
    return element
