"""Single-pass (streaming) toRDF emitter vs the node-map path.

The stream path (core/to_rdf.py::stream_expanded_to_rdf, parity with
streaming_reader.rb:29-54) must produce a graph isomorphic to the
node-map path for every document shape, and *identical* labels for
the pipeline's turn documents (whose bnodes are all labeled).
"""

from __future__ import annotations

import json
import os

import pytest

from json_ld_spark.core import api
from json_ld_spark.core.keywords import BlankNodeNamer
from json_ld_spark.core.rdf import isomorphic

GOLDEN = "/root/reference/spec/test-files"


def both_paths(doc, base=None):
    expanded = api.expand(doc, base=base)
    nm = api.expanded_to_rdf(expanded, namer=BlankNodeNamer())
    st = api.expanded_to_rdf_stream(expanded, namer=BlankNodeNamer())
    return nm, st


@pytest.mark.parametrize("n", range(1, 10))
def test_stream_matches_node_map_golden(n):
    with open(os.path.join(GOLDEN, f"test-{n}-input.jsonld")) as f:
        doc = json.load(f)
    nm, st = both_paths(doc, base=f"http://example.com/test-{n}-input.jsonld")
    assert isomorphic(nm, st), f"golden test-{n}: stream != node-map"


FEATURE_DOCS = [
    # nested nodes + anonymous bnodes
    {"@id": "http://e/a", "http://e/p": [{"http://e/q": [{"@value": 1}]}]},
    # lists, incl. nested list
    {
        "@id": "http://e/a",
        "http://e/p": [{"@list": [{"@value": 1}, {"@list": [{"@value": 2}]}]}],
    },
    # empty list
    {"@id": "http://e/a", "http://e/p": [{"@list": []}]},
    # named graph with contents
    {
        "@id": "http://e/g",
        "@type": ["http://e/G"],
        "@graph": [{"@id": "http://e/a", "http://e/p": [{"@value": "x"}]}],
    },
    # anonymous graph
    {"@graph": [{"@id": "http://e/a", "http://e/p": [{"@value": "x"}]}]},
    # @reverse with full child node
    {
        "@id": "http://e/a",
        "@reverse": {
            "http://e/p": [{"@id": "http://e/b", "http://e/q": [{"@value": 3}]}]
        },
    },
    # labeled bnodes shared across positions
    {
        "@id": "_:x",
        "@type": ["_:t"],
        "http://e/p": [{"@id": "_:y"}, {"@id": "_:x"}],
    },
    # typed + language literals + @json
    {
        "@id": "http://e/a",
        "http://e/p": [
            {"@value": True},
            {"@value": 1.5},
            {"@value": "s", "@language": "en"},
            {"@value": {"k": [1, 2]}, "@type": "@json"},
        ],
    },
    # relative-IRI object dropped, bnode predicate dropped
    {
        "@id": "http://e/a",
        "http://e/p": [{"@id": "relative"}],
        "_:bp": [{"@value": "dropped"}],
    },
    # @included side-car nodes
    {
        "@id": "http://e/a",
        "http://e/p": [{"@value": 1}],
        "@included": [{"@id": "http://e/b", "http://e/q": [{"@value": 2}]}],
    },
]


@pytest.mark.parametrize("i", range(len(FEATURE_DOCS)))
def test_stream_matches_node_map_features(i):
    expanded = [FEATURE_DOCS[i]]
    nm = api.expanded_to_rdf(expanded, namer=BlankNodeNamer())
    st = api.expanded_to_rdf_stream(expanded, namer=BlankNodeNamer())
    assert isomorphic(nm, st), (
        f"doc {i}: node-map={sorted(map(str, nm))} stream={sorted(map(str, st))}"
    )


def test_stream_identical_labels_for_turn_docs():
    """Pipeline turn docs: labels must match exactly (the SQL oracle
    asserts literal bnode names)."""
    from json_ld_spark.core.context import parse_context_cached
    from json_ld_spark.operators.jsonld_ops import (
        _NEXT_TURN_CONTEXT,
        build_turn_document,
    )

    ctx = parse_context_cached(_NEXT_TURN_CONTEXT)
    doc = build_turn_document(
        "conv00000001", 2, "assistant", "Paris and Berlin.", "search",
        "2024-01-01T00:02:00", 3, [(1, "Paris", 1), (4, "Berlin", 2)],
    )
    expanded = api.expand_with_context(doc, ctx)
    nm = api.expanded_to_rdf(expanded, namer=BlankNodeNamer(prefix="conv00000001t2m"))
    st = api.expanded_to_rdf_stream(
        expanded, namer=BlankNodeNamer(prefix="conv00000001t2m")
    )
    assert sorted(map(str, nm)) == sorted(map(str, st))
