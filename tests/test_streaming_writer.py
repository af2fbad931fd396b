"""Streaming writer (streaming_writer.rb:14-125 parity)."""

from __future__ import annotations

import json

from json_ld_spark.core import api
from json_ld_spark.core.rdf import isomorphic
from json_ld_spark.core.streaming_writer import stream_write_jsonld

E = "http://ex.org/"


def _roundtrip(doc, **kw):
    triples = api.to_rdf(doc, **kw)
    text = "".join(stream_write_jsonld(triples))
    parsed = json.loads(text)
    re_emitted = api.to_rdf(parsed)
    assert isomorphic(triples, re_emitted), text
    return text, parsed


def test_stream_write_roundtrip():
    doc = {
        "@id": E + "a",
        "@type": E + "T",
        E + "p": [{"@value": "x"}, {"@value": 3}],
        E + "child": {"@id": E + "b", E + "q": "y"},
    }
    text, parsed = _roundtrip(doc)
    assert text.startswith("[\n") and text.endswith("\n]")


def test_stream_write_subject_runs_merge():
    triples = api.to_rdf({"@id": E + "a", E + "p": "1", E + "q": "2"})
    triples = sorted(triples, key=lambda t: t.predicate.value)
    chunks = list(stream_write_jsonld(triples))
    parsed = json.loads("".join(chunks))
    # one subject run → exactly one node object
    assert len(parsed) == 1 and parsed[0]["@id"] == E + "a"


def test_stream_write_named_graphs():
    doc = {
        "@id": E + "g",
        "@graph": [{"@id": E + "a", E + "p": "in-graph"}],
    }
    triples = api.to_rdf(doc)
    parsed = json.loads("".join(stream_write_jsonld(triples)))
    g = [n for n in parsed if "@graph" in n]
    assert g and g[0]["@id"] == E + "g"
    assert g[0]["@graph"][0]["@id"] == E + "a"


def test_stream_write_with_context_compacts():
    ctx = {"p": E + "p"}
    triples = api.to_rdf({"@id": E + "a", E + "p": "v"})
    text = "".join(stream_write_jsonld(triples, context=ctx))
    parsed = json.loads(text)
    assert parsed["@context"] == ctx
    assert parsed["@graph"][0]["p"] == "v"
