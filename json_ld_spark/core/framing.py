"""JSON-LD 1.1 Framing: declarative match-and-reshape over the node
map (the reference's "query language", SURVEY §2.8).

Faithful port of the reference algorithm:
  - frame                  /root/reference/lib/json/ld/frame.rb:26-215
  - filter_subject(s)      frame.rb:326-457
  - validate_frame         frame.rb:459-478
  - get_frame_flag         frame.rb:493-512
  - remove_embed           frame.rb:516-562
  - create_implicit_frame  frame.rb:583-589
  - node_match?/value_match?  frame.rb:592-620
  - count/prune bnodes     frame.rb:218-266
  - cleanup_preserve/null  frame.rb:273-311
"""

from __future__ import annotations

import copy as _copy
from typing import Any, Optional

from json_ld_spark.core import errors as err
from json_ld_spark.core.errors import JsonLdError
from json_ld_spark.core.keywords import (
    is_blank_node_id,
    is_list_object,
    is_node_object,
    is_node_reference,
    is_value_object,
)

FRAMING_KEYWORDS = ("@default", "@embed", "@explicit", "@omitDefault", "@requireAll")

_EMBED_VALUES = ("@always", "@first", "@last", "@link", "@once", "@never")


class FrameState:
    """Mutable framing state (frame.rb:396-403 in api.rb driver).

    ``with_()`` mirrors Ruby's ``state.merge`` — the scalar fields
    (graph, embedded) fork, the mutable maps are SHARED."""

    def __init__(self, graph_map: dict, graph: str = "@default",
                 embed: str = "@once", explicit: bool = False,
                 require_all: bool = False, omit_default: bool = False):
        self.graph_map = graph_map
        self.graph = graph
        self.embed = embed
        self.explicit = explicit
        self.require_all = require_all
        self.omit_default = omit_default
        self.link: dict[str, dict] = {}
        self.unique_embeds: dict[str, dict] = {}
        self.subject_stack: list[dict] = []
        self.embedded = False

    @property
    def subjects(self) -> dict:
        return self.graph_map.get(self.graph, {})

    def with_(self, graph: Optional[str] = None,
              embedded: Optional[bool] = None) -> "FrameState":
        ns = FrameState.__new__(FrameState)
        ns.__dict__.update(self.__dict__)
        if graph is not None:
            ns.graph = graph
        if embedded is not None:
            ns.embedded = embedded
        return ns


def _as_array(v: Any) -> list:
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


def validate_frame(frame: Any) -> None:
    """Parity: frame.rb:459-478."""
    if not (
        isinstance(frame, dict)
        or (isinstance(frame, list) and len(frame) == 1 and isinstance(frame[0], dict))
    ):
        raise JsonLdError(err.INVALID_FRAME, f"frame must be an object: {frame!r}")
    f = frame[0] if isinstance(frame, list) else frame
    ids = _as_array(f.get("@id"))
    if ids != [{}] and not all(isinstance(v, str) for v in ids):
        raise JsonLdError(err.INVALID_FRAME, f"invalid @id: {f.get('@id')!r}")
    for v in _as_array(f.get("@type")):
        if isinstance(v, dict) and set(v.keys()) <= {"@default"}:
            continue
        if not isinstance(v, str):
            raise JsonLdError(err.INVALID_FRAME, f"invalid @type: {f.get('@type')!r}")


def get_frame_flag(frame: dict, state: FrameState, name: str) -> Any:
    """Parity: frame.rb:493-512 (embed true/false aliases, validation)."""
    defaults = {
        "embed": state.embed,
        "explicit": state.explicit,
        "requireAll": state.require_all,
        "omitDefault": state.omit_default,
    }
    vals = frame.get("@" + name, [defaults[name]])
    rval = vals[0] if isinstance(vals, list) and vals else vals
    if is_value_object(rval):
        rval = rval["@value"]
    if name == "embed":
        if rval is True:
            rval = "@once"
        elif rval is False:
            rval = "@never"
        elif rval not in _EMBED_VALUES:
            raise JsonLdError(err.INVALID_EMBED_VALUE, repr(rval))
    return rval


def value_match(pattern: dict, value: dict) -> bool:
    """Parity: value_match?, frame.rb:600-618."""
    v1 = value.get("@value")
    t1 = value.get("@type")
    l1 = value.get("@language")
    v2 = _as_array(pattern.get("@value"))
    t2 = _as_array(pattern.get("@type"))
    l2 = [x.lower() if isinstance(x, str) else x
          for x in _as_array(pattern.get("@language"))]
    if not v2 and not t2 and not l2:
        return True
    if not (v1 in v2 or v2 == [{}]):
        return False
    if not (t1 in t2 or (t1 is not None and t2 == [{}]) or (t1 is None and not t2)):
        return False
    l1n = l1.lower() if isinstance(l1, str) else ""
    if not (l1n in l2 or (l1 is not None and l2 == [{}]) or (l1 is None and not l2)):
        return False
    return True


def node_match(pattern: dict, value: dict, state: FrameState, flags: dict) -> bool:
    """Parity: node_match?, frame.rb:593-598."""
    if not value.get("@id"):
        return False
    node_object = state.subjects.get(value["@id"])
    return node_object is not None and filter_subject(
        node_object, pattern, state, flags
    )


def filter_subject(subject: dict, frame: dict, state: FrameState,
                   flags: dict) -> bool:
    """Parity: filter_subject, frame.rb:346-457."""
    wildcard = True
    matches_some = False
    for k, v in frame.items():
        node_values = subject.get(k, [])
        if k == "@id":
            ids = v or []
            match_this = (
                True if ids in ([], [{}]) else subject.get("@id") in ids
            )
            if not flags["requireAll"]:
                return match_this
        elif k == "@type":
            wildcard = False
            if v == []:
                if node_values:
                    return False
                match_this = True
            elif v == [{}]:
                match_this = bool(node_values)
            elif v and isinstance(v[0], dict) and set(v[0].keys()) == {"@default"}:
                match_this = True
            else:
                match_this = bool(set(x for x in v if isinstance(x, str))
                                  & set(node_values))
            if not flags["requireAll"]:
                return match_this
        elif k.startswith("@"):
            continue
        else:
            is_empty = v == []
            vf = v[0] if isinstance(v, list) and v else None
            has_default = False
            if vf is not None:
                validate_frame(vf)
                has_default = isinstance(vf, dict) and "@default" in vf
            wildcard = False
            # skip, but allow match, if node has no value and frame has
            # a default
            if not node_values and has_default:
                continue
            # frame value [] means match none
            if node_values and is_empty:
                return False
            if vf is None:
                if node_values:
                    return False
                match_this = True
            elif isinstance(vf, dict) and not (
                set(vf.keys()) - set(FRAMING_KEYWORDS)
            ):
                # wildcard subframe (only framing keywords)
                match_this = bool(node_values)
            elif is_value_object(vf):
                match_this = any(
                    is_value_object(nv) and value_match(vf, nv)
                    for nv in node_values
                )
            elif is_node_object(vf) or is_node_reference(vf):
                match_this = any(
                    isinstance(nv, dict)
                    and node_match(vf, nv, state, flags)
                    for nv in node_values
                )
            elif is_list_object(vf):
                vv = vf["@list"][0] if vf["@list"] else None
                inner = (
                    node_values[0]["@list"]
                    if node_values and is_list_object(node_values[0])
                    else None
                )
                if inner is None:
                    match_this = False
                elif is_value_object(vv):
                    match_this = any(
                        is_value_object(nv) and value_match(vv, nv)
                        for nv in inner
                    )
                elif is_node_object(vv) or is_node_reference(vv):
                    match_this = any(
                        isinstance(nv, dict)
                        and node_match(vv, nv, state, flags)
                        for nv in inner
                    )
                else:
                    match_this = False
            else:
                match_this = False
        if not match_this and flags["requireAll"]:
            return False
        matches_some = matches_some or match_this
    return wildcard or matches_some


def filter_subjects(state: FrameState, subjects: list[str], frame: dict,
                    flags: dict) -> dict:
    """Parity: filter_subjects, frame.rb:326-331."""
    out = {}
    for sid in subjects:
        subject = state.subjects.get(sid)
        if subject is not None and filter_subject(subject, frame, state, flags):
            out[sid] = subject
    return out


def create_implicit_frame(flags: dict) -> dict:
    """Parity: frame.rb:583-589."""
    return {"@" + k: [v] for k, v in flags.items()}


def _creates_circular_reference(subject: dict, graph: str,
                                subject_stack: list) -> bool:
    """Parity: frame.rb:485-490."""
    return any(
        s["graph"] == graph and s["subject"].get("@id") == subject.get("@id")
        for s in subject_stack[:-1]
    )


def add_frame_output(parent: Any, prop: Optional[str], output: Any) -> None:
    """Parity: frame.rb:570-577."""
    if isinstance(parent, dict):
        parent.setdefault(prop, []).append(output)
    else:
        parent.append(output)


def remove_embed(state: FrameState, sid: str) -> None:
    """Parity: remove_embed, frame.rb:516-562 (@embed:@last)."""
    embeds = state.unique_embeds[state.graph]
    embed = embeds.get(sid)
    if embed is None:
        return
    prop = embed["property"]
    subject_ref = {"@id": sid}
    parent = embed["parent"]
    if isinstance(parent, list):
        for i, p in enumerate(parent):
            if p == subject_ref or (isinstance(p, dict) and p.get("@id") == sid):
                parent[i] = subject_ref
    else:
        vals = parent.get(prop)
        if isinstance(vals, list):
            parent[prop] = [
                v for v in vals
                if not (isinstance(v, dict) and v.get("@id") == sid)
            ] + [subject_ref]
        elif isinstance(vals, dict) and vals.get("@id") == sid:
            parent[prop] = subject_ref

    def remove_dependents(dep_id: str) -> None:
        for id_dep in list(embeds.keys()):
            e = embeds.get(id_dep)
            if not isinstance(e, dict):
                continue
            p = e.get("parent", {})
            if isinstance(p, dict) and p.get("@id") == dep_id:
                del embeds[id_dep]
                remove_dependents(id_dep)

    remove_dependents(sid)


def frame_node(state: FrameState, subjects: list[str], frame: Any,
               parent: Any, property: Optional[str],
               ordered: bool = False) -> None:
    """Parity: frame, frame.rb:26-215."""
    validate_frame(frame)
    if isinstance(frame, list):
        frame = frame[0]
    flags = {
        "embed": get_frame_flag(frame, state, "embed"),
        "explicit": get_frame_flag(frame, state, "explicit"),
        "requireAll": get_frame_flag(frame, state, "requireAll"),
    }
    link = state.link.setdefault(state.graph, {})
    matches = filter_subjects(state, subjects, frame, flags)

    # opt_sort semantics (extensions.rb:46-53): insertion order unless
    # ordered — the order decides which occurrence wins @embed:@once
    for sid in (sorted(matches) if ordered else matches):
        subject = matches[sid]
        # top-level matches are compartmentalized (frame.rb:49-54)
        if property is None:
            state.unique_embeds = {state.graph: {}}
        else:
            state.unique_embeds.setdefault(state.graph, {})
        embeds = state.unique_embeds[state.graph]

        if flags["embed"] == "@link" and sid in link:
            add_frame_output(parent, property, link[sid])
            continue

        output: dict[str, Any] = {"@id": sid}
        link[sid] = output

        if not state.embedded and sid in embeds:
            continue  # already included in another node object
        if state.embedded and (
            flags["embed"] == "@never"
            or _creates_circular_reference(subject, state.graph,
                                           state.subject_stack)
        ):
            add_frame_output(parent, property, output)
            continue
        if (
            state.embedded
            and flags["embed"] in ("@first", "@once")
            and sid in embeds
        ):
            add_frame_output(parent, property, output)
            continue
        if flags["embed"] == "@last" and sid in embeds:
            remove_embed(state, sid)

        embeds[sid] = {"parent": parent, "property": property}
        state.subject_stack.append({"subject": subject, "graph": state.graph})

        # subject is also the name of a graph (frame.rb:106-128)
        if sid in state.graph_map:
            recurse = False
            subframe: Any = {}
            if "@graph" in frame:
                gf = frame["@graph"]
                subframe = gf[0] if isinstance(gf, list) and gf else {}
                recurse = sid not in ("@merged", "@default")
                if not isinstance(subframe, dict):
                    subframe = {}
            else:
                recurse = state.graph != "@merged"
            if recurse:
                frame_node(
                    state.with_(graph=sid, embedded=False),
                    list(state.graph_map[sid].keys()),
                    [subframe], output, "@graph", ordered,
                )

        # @included recursion (frame.rb:129-133)
        if frame.get("@included"):
            frame_node(state.with_(embedded=False), subjects,
                       frame["@included"], output, "@included", ordered)

        for prop in (sorted(subject.keys()) if ordered else subject.keys()):
            objects = subject[prop]
            if prop.startswith("@"):
                output[prop] = _copy.deepcopy(objects)
                continue
            if flags["explicit"] and prop not in frame:
                continue
            for o in objects:
                fv = frame.get(prop)
                subframe = (
                    fv[0] if isinstance(fv, list) and fv else None
                ) or create_implicit_frame(flags)
                if is_list_object(o):
                    if isinstance(fv, list) and fv and isinstance(fv[0], dict):
                        subframe = fv[0].get("@list") or create_implicit_frame(flags)
                    else:
                        subframe = create_implicit_frame(flags)
                    lst: dict[str, Any] = {"@list": []}
                    add_frame_output(output, prop, lst)
                    for oo in o["@list"]:
                        if is_node_reference(oo):
                            frame_node(state.with_(embedded=True),
                                       [oo["@id"]], subframe, lst, "@list",
                                       ordered)
                        else:
                            add_frame_output(lst, "@list", _copy.deepcopy(oo))
                elif is_node_reference(o):
                    frame_node(state.with_(embedded=True), [o["@id"]],
                               subframe, output, prop, ordered)
                else:
                    sf = subframe if isinstance(subframe, dict) else {}
                    if value_match(sf, o if isinstance(o, dict) else {"@value": o}):
                        add_frame_output(output, prop, _copy.deepcopy(o))

        # defaults (frame.rb:179-193)
        for prop in (sorted(frame.keys()) if ordered else frame.keys()):
            fv = frame[prop]
            if (
                prop == "@type"
                and isinstance(fv, list) and fv
                and isinstance(fv[0], dict)
                and set(fv[0].keys()) == {"@default"}
            ):
                pass  # treat as default
            elif prop.startswith("@"):
                continue
            n = fv[0] if isinstance(fv, list) and fv else {}
            if not isinstance(n, dict):
                n = {}
            omit_default_on = get_frame_flag(n, state, "omitDefault")
            if not omit_default_on and prop not in output:
                preserve = _copy.deepcopy(_as_array(n.get("@default", "@null")))
                output[prop] = [{"@preserve": preserve}]

        # @reverse framing (frame.rb:196-206)
        for reverse_prop, subframe in frame.get("@reverse", {}).items():
            if isinstance(subframe, list):
                subframe = subframe[0] if subframe else {}
            for r_id, node in state.subjects.items():
                refs = _as_array(node.get(reverse_prop))
                if any(isinstance(v, dict) and v.get("@id") == sid for v in refs):
                    rev = output.setdefault("@reverse", {})
                    rev.setdefault(reverse_prop, [])
                    frame_node(state.with_(embedded=True), [r_id], subframe,
                               rev[reverse_prop], property, ordered)

        add_frame_output(parent, property, output)
        state.subject_stack.pop()


# ---------------------------------------------------------------------------
# post-processing passes
# ---------------------------------------------------------------------------

def count_bnode_identifiers(element: Any, counts: dict) -> None:
    """Parity: frame.rb:218-240 (counts bnode STRINGS anywhere)."""
    if isinstance(element, list):
        for e in element:
            count_bnode_identifiers(e, counts)
    elif isinstance(element, dict):
        for v in element.values():
            count_bnode_identifiers(v, counts)
    elif isinstance(element, str) and element.startswith("_:"):
        counts[element] = counts.get(element, 0) + 1


def prune_bnodes(element: Any, counts: dict) -> Any:
    """Strip @id of bnodes used exactly once. Parity: frame.rb:243-266."""
    if isinstance(element, list):
        return [x for x in (prune_bnodes(e, counts) for e in element)
                if x is not None]
    if isinstance(element, dict):
        out = {}
        for k, v in element.items():
            if k == "@id" and isinstance(v, str) and is_blank_node_id(v) \
                    and counts.get(v, 0) == 1:
                continue
            out[k] = prune_bnodes(v, counts)
        return out
    return element


def cleanup_preserve(element: Any) -> Any:
    """Parity: frame.rb:273-291: a hash with @preserve is REPLACED by
    the first member of its @preserve value."""
    if isinstance(element, list):
        return [cleanup_preserve(e) for e in element]
    if isinstance(element, dict):
        if "@preserve" in element:
            pres = element["@preserve"]
            first = pres[0] if isinstance(pres, list) and pres else pres
            return cleanup_preserve(first)
        return {k: cleanup_preserve(v) for k, v in element.items()}
    return element


def cleanup_null(element: Any) -> Any:
    """Parity: frame.rb:298-311: '@null' → null, dropped from arrays."""
    if isinstance(element, list):
        return [x for x in (cleanup_null(e) for e in element) if x is not None]
    if isinstance(element, dict):
        return {k: cleanup_null(v) for k, v in element.items()}
    if element == "@null":
        return None
    return element
