"""Framing tests: reference golden fixture test-8 + feature cases."""

from __future__ import annotations

import json

from json_ld_spark.core import api
from tests.test_core_golden import json_multiset_eq, load


def test_frame_golden_test8():
    doc = load("test-8-input.jsonld")
    frame_doc = load("test-8-frame.jsonld")
    expected = load("test-8-framed.jsonld")
    framed = api.frame(doc, frame_doc)
    assert json_multiset_eq(framed, expected), (
        f"framed mismatch:\n{json.dumps(framed, indent=1)}\n"
        f"expected:\n{json.dumps(expected, indent=1)}"
    )


def test_frame_by_type():
    doc = [
        {"@id": "http://e/a", "@type": ["http://e/T"],
         "http://e/p": [{"@value": "x"}]},
        {"@id": "http://e/b", "@type": ["http://e/U"],
         "http://e/p": [{"@value": "y"}]},
    ]
    framed = api.frame(doc, {"@type": "http://e/T"}, omit_graph=False)
    nodes = framed["@graph"]
    assert len(nodes) == 1 and nodes[0]["@id"] == "http://e/a"


def test_frame_by_id():
    doc = [
        {"@id": "http://e/a", "http://e/p": [{"@value": "x"}]},
        {"@id": "http://e/b", "http://e/p": [{"@value": "y"}]},
    ]
    framed = api.frame(doc, {"@id": "http://e/b"}, omit_graph=False)
    nodes = framed["@graph"]
    assert [n["@id"] for n in nodes] == ["http://e/b"]


def test_frame_embed_never():
    doc = {
        "@id": "http://e/a",
        "http://e/child": {"@id": "http://e/b", "http://e/p": "v"},
    }
    framed = api.frame(
        doc, {"@id": "http://e/a", "http://e/child": {"@embed": "@never"}},
        omit_graph=False,
    )
    node = [n for n in framed["@graph"] if n["@id"] == "http://e/a"][0]
    # compaction collapses the single-element array
    assert node["http://e/child"] in ([{"@id": "http://e/b"}], {"@id": "http://e/b"})


def test_frame_default_value():
    doc = {"@id": "http://e/a", "@type": "http://e/T"}
    framed = api.frame(
        doc, {"@type": "http://e/T", "http://e/missing": {"@default": "dflt"}},
        omit_graph=False,
    )
    node = framed["@graph"][0]
    # expanded form: the default value appears as a value object
    assert node["http://e/missing"] in (
        [{"@value": "dflt"}], {"@value": "dflt"}, ["dflt"], "dflt"
    )


def test_frame_explicit_drops_unframed_props():
    doc = {
        "@id": "http://e/a",
        "@type": "http://e/T",
        "http://e/p": "keep",
        "http://e/q": "drop",
    }
    framed = api.frame(
        doc, {"@explicit": True, "@type": "http://e/T", "http://e/p": {}},
        omit_graph=False,
    )
    node = framed["@graph"][0]
    assert "http://e/q" not in node
    # compacted form: scalar value
    assert node["http://e/p"] in ([{"@value": "keep"}], {"@value": "keep"}, "keep")
