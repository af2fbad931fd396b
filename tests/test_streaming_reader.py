"""Raw streaming key-order reader vs the node-map path (SURVEY §2.9).

Parity target: streaming_reader.rb:74-643 — same graphs (isomorphic)
as API.toRdf on ordinary documents, plus the streaming-specific
behaviors: key-order errors and provisional-statement rewriting.
"""

from __future__ import annotations

import json
import os

import pytest

from json_ld_spark.core import api as core_api
from json_ld_spark.core.errors import JsonLdError
from json_ld_spark.core.rdf import isomorphic
from json_ld_spark.core.streaming_reader import stream_to_rdf

GOLDEN_DIR = "/root/reference/spec/test-files"


def _iso(doc, **kw):
    a = stream_to_rdf(doc, **kw)
    b = core_api.to_rdf(doc, **kw)
    assert isomorphic(a, b), (
        f"stream:\n{sorted(map(str, a))}\nnode-map:\n{sorted(map(str, b))}"
    )
    return a


def test_golden_fixtures_match_node_map_path():
    """Fixtures in streaming-compatible key order must stream to the
    same graph; fixtures violating streaming order must raise the
    streaming error — both are reference behavior. Most goldens use
    conventional (@id, @type) order, which the W3C streaming profile
    — and the reference (streaming_reader.rb:152-156: @id moves state
    to :properties, @type then raises) — rejects."""
    streamed = 0
    for n in range(1, 10):
        path = f"{GOLDEN_DIR}/test-{n}-input.jsonld"
        if not os.path.exists(path):
            continue
        with open(path) as f:
            doc = json.load(f)
        try:
            _iso(doc, base="http://example.com/")
            streamed += 1
        except JsonLdError as e:
            assert e.code in ("invalid streaming key order",
                              "colliding keywords")
    assert streamed >= 2


def test_basic_node_and_value_objects():
    _iso({
        "@context": {"ex": "http://e/", "name": "http://e/name",
                     "age": {"@id": "http://e/age",
                             "@type": "http://www.w3.org/2001/XMLSchema#integer"}},
        "@type": "ex:T",
        "@id": "http://e/s",
        "name": "Alice",
        "age": 42,
        "http://e/knows": {"@id": "http://e/o", "name": "Bob"},
    })


def test_containers_language_list_set():
    _iso({
        "@context": {
            "label": {"@id": "http://e/label", "@container": "@language"},
            "items": {"@id": "http://e/items", "@container": "@list"},
            "tags": {"@id": "http://e/tags", "@container": "@set"},
        },
        "@id": "http://e/s",
        "label": {"en": "hi", "fr": "salut"},
        "items": ["a", "b", "c"],
        "tags": ["x", "y"],
    })


def test_index_id_type_maps():
    _iso({
        "@context": {
            "byidx": {"@id": "http://e/byidx", "@container": "@index"},
            "byid": {"@id": "http://e/byid", "@container": "@id"},
            "bytype": {"@id": "http://e/bytype", "@container": "@type",
                       "@type": "@id"},
        },
        "@id": "http://e/s",
        "byidx": {"i1": {"http://e/p": "v1"}, "i2": {"http://e/p": "v2"}},
        "byid": {"http://e/a": {"http://e/p": "va"}},
        "bytype": {"http://e/T": {"@id": "http://e/b"}},
    })


def test_reverse_and_nest():
    _iso({
        "@context": {
            "children": {"@reverse": "http://e/parent"},
            "meta": "@nest",
            "name": "http://e/name",
        },
        "@id": "http://e/s",
        "children": [{"@id": "http://e/c1"}, {"@id": "http://e/c2"}],
        "meta": {"name": "nested"},
    })


def test_graph_and_lists_of_lists():
    _iso({
        "@context": {"p": "http://e/p"},
        "@id": "http://e/g",
        "@graph": [{"@id": "http://e/s", "p": "in-graph"}],
    })
    _iso({
        "@id": "http://e/s",
        "http://e/p": {"@list": [{"@list": ["a", "b"]}, "c"]},
    })


def test_json_literal_coercion():
    _iso({
        "@context": {"meta": {"@id": "http://e/meta", "@type": "@json"}},
        "@id": "http://e/s",
        "meta": {"b": 2, "a": [1, True, None]},
    })


def test_provisional_rewrite_id_after_type():
    """@type before @id: type statements buffer provisionally under a
    provisional bnode and are rewritten once @id arrives (parity:
    streaming_reader.rb:97-137,199-216)."""
    triples = stream_to_rdf({
        "@context": {"name": "http://e/name"},
        "@type": "http://e/T",
        "@id": "http://e/real",
        "name": "x",
    })
    subjects = {t.subject.value for t in triples}
    assert subjects == {"http://e/real"}


def test_no_id_keeps_bnode():
    triples = stream_to_rdf({"http://e/p": "v"})
    assert len(triples) == 1
    assert triples[0].subject.kind == "bnode"


@pytest.mark.parametrize("doc,code", [
    # @id moves the machine to `properties`; late streaming keys fail
    ({"@id": "http://e/s", "@context": {"x": "http://e/x"}},
     "invalid streaming key order"),
    ({"@id": "http://e/s", "@type": "http://e/T"},
     "invalid streaming key order"),
    ({"@id": "http://e/s", "@value": "x"},
     "invalid streaming key order"),
    # a second @id (via an alias) = colliding keywords
    ({"@context": {"id": "@id"}, "id": "http://e/a", "@id": "http://e/b"},
     "colliding keywords"),
])
def test_key_order_violations(doc, code):
    with pytest.raises(JsonLdError) as exc:
        stream_to_rdf(doc)
    assert exc.value.code == code


def test_streaming_order_does_not_raise():
    """Streaming-profile order (@context, @type, @id, properties)
    never trips the order check; properties BEFORE @id are legal too
    (buffered provisionally, rewritten when @id arrives)."""
    out = stream_to_rdf({
        "@context": {"name": "http://e/name"},
        "@type": "http://e/T",
        "@id": "http://e/s",
        "name": "ok",
    })
    assert len(out) == 2
    late = stream_to_rdf({"http://e/p": "v", "@id": "http://e/s"})
    assert {t.subject.value for t in late} == {"http://e/s"}


def test_typed_value_skips_scalar_check():
    """Reference elsif chain (streaming_reader.rb:395-410): a present
    non-@json @type IRI SKIPS the scalar-@value check — the value is
    handed to literal construction, not rejected."""
    out = stream_to_rdf({
        "@id": "http://e/s",
        "http://e/p": {"@type": "http://e/T", "@value": {"a": 1}},
    })
    assert len(out) == 1
    assert out[0].obj.datatype == "http://e/T"


def test_non_iri_type_on_value_object_raises_invalid_typed_value():
    """A non-IRI @type on a value object is InvalidTypedValue, not
    InvalidValueObjectValue (streaming_reader.rb:398-403)."""
    with pytest.raises(JsonLdError) as exc:
        stream_to_rdf({
            "@id": "http://e/s",
            "http://e/p": {"@type": "_:b0", "@value": "x"},
        })
    assert exc.value.code == "invalid typed value"


def test_list_entry_with_multiple_objects_keeps_last():
    """An @list entry expanding to multiple objects retains the LAST
    (entry_value reassigned per statement, streaming_reader.rb:627-634)."""
    out = stream_to_rdf({
        "@id": "http://e/s",
        "http://e/p": {"@list": [{"@set": ["a", "b"]}]},
    })
    firsts = [t.obj.value for t in out
              if t.predicate.value.endswith("#first")]
    assert firsts == ["b"]


def test_turn_document_matches_pipeline_emitter():
    """The pipeline's own turn documents stream identically (same
    graph) through the raw reader."""
    from json_ld_spark.operators.jsonld_ops import (
        _NEXT_TURN_CONTEXT,
        build_turn_document,
    )

    doc = build_turn_document(
        "c1", 3, "user", "hello spark", "search",
        "2024-01-01T00:00:00", 4, [(16, "spark", 1)],
    )
    doc = {"@context": _NEXT_TURN_CONTEXT, **doc}
    a = stream_to_rdf(doc)
    b = core_api.to_rdf(doc)
    assert isomorphic(a, b)
