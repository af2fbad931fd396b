"""JSON-LD-star: embedded nodes, annotations, quoted triples.

Parity: expand.rb:295-341 (embedded @id), expand.rb:617-623 +
flatten.rb:60-151 (@annotation reification), to_rdf.rb:85-92 (quoted
statements), from_rdf.rb:51,66 (statement terms)."""

from __future__ import annotations

import pytest

from json_ld_spark.core import api
from json_ld_spark.core.errors import JsonLdError
from json_ld_spark.core.rdf import QUOTED, isomorphic, triple_to_nquads

E = "http://ex.org/"


def test_embedded_subject_emits_quoted_triple():
    doc = {"@id": {"@id": E + "bob", E + "age": 23}, E + "certainty": 0.8}
    triples = api.to_rdf(doc, rdfstar=True)
    assert len(triples) == 1
    t = triples[0]
    assert t.subject.kind == QUOTED
    inner = t.subject.value
    assert inner.subject.value == E + "bob"
    assert inner.predicate.value == E + "age"
    assert "<< <http://ex.org/bob>" in triple_to_nquads(t)


def test_annotation_reifies():
    doc = {
        "@id": E + "bob",
        E + "knows": {"@id": E + "fred", "@annotation": {E + "certainty": 0.8}},
    }
    triples = api.to_rdf(doc, rdfstar=True)
    asserted = [t for t in triples if t.subject.kind != QUOTED]
    annotated = [t for t in triples if t.subject.kind == QUOTED]
    assert len(asserted) == 1 and len(annotated) == 1
    assert annotated[0].subject.value.predicate.value == E + "knows"
    assert annotated[0].predicate.value == E + "certainty"


def test_annotation_on_value_object():
    doc = {
        "@id": E + "bob",
        E + "age": {"@value": 23, "@annotation": {E + "certainty": 0.8}},
    }
    triples = api.to_rdf(doc, rdfstar=True)
    assert len(triples) == 2
    assert any(t.subject.kind == QUOTED for t in triples)


def test_from_rdf_roundtrip_star():
    doc = {"@id": {"@id": E + "bob", E + "age": 23}, E + "certainty": 0.8}
    triples = api.to_rdf(doc, rdfstar=True)
    back = api.from_rdf(triples, use_native_types=True)
    re_emitted = api.to_rdf(back, rdfstar=True)
    assert isomorphic(triples, re_emitted)


def test_compact_embedded_id():
    doc = {"@id": {"@id": E + "bob", E + "age": 23}, E + "certainty": 0.8}
    exp = api.expand(doc, rdfstar=True)
    compacted = api.compact(exp, {"ex": E}, expanded_input=True, rdfstar=True)
    assert compacted["@id"] == {"@id": "ex:bob", "ex:age": 23}


def test_star_rejected_without_option():
    with pytest.raises(JsonLdError) as e:
        api.expand({"@id": {"@id": E + "b", E + "p": 1}, E + "q": 2})
    assert e.value.code == "invalid @id value"


@pytest.mark.parametrize(
    "doc,code",
    [
        # multi-statement embedded node
        ({"@id": {"@id": E + "b", E + "p": 1, E + "q": 2}, E + "r": 3},
         "invalid embedded node"),
        # embedded node with @reverse
        ({"@id": {"@id": E + "b", "@reverse": {E + "p": [{"@id": E + "c"}]}},
          E + "r": 3},
         "invalid embedded node"),
        # annotation on a top-level object
        ({"@id": E + "b", "@annotation": {E + "p": 1}}, "invalid annotation"),
        # annotation containing @id
        ({"@id": E + "b",
          E + "p": {"@id": E + "c",
                    "@annotation": {"@id": E + "bad", E + "q": 1}}},
         "invalid annotation"),
    ],
)
def test_star_validation_errors(doc, code):
    with pytest.raises(JsonLdError) as e:
        api.to_rdf(doc, rdfstar=True)
    assert e.value.code == code, f"got {e.value.code}"


def test_from_rdf_folds_annotations_back():
    """create_annotations (flatten.rb:216-246): the fromRDF of an
    annotated graph nests @annotation instead of a separate reified
    node."""
    doc = {
        "@id": E + "bob",
        E + "knows": {"@id": E + "fred", "@annotation": {E + "certainty": 0.8}},
    }
    triples = api.to_rdf(doc, rdfstar=True)
    back = api.from_rdf(triples, use_native_types=True)
    assert len(back) == 1, back
    val = back[0][E + "knows"][0]
    assert val["@id"] == E + "fred"
    assert val["@annotation"][0][E + "certainty"] == [{"@value": 0.8}]
    assert isomorphic(triples, api.to_rdf(back, rdfstar=True))


def test_flatten_folds_annotations():
    doc = {
        "@id": E + "bob",
        E + "knows": {"@id": E + "fred", "@annotation": {E + "certainty": 0.8}},
    }
    flat = api.flatten(doc, rdfstar=True, create_annotations=True)
    hosts = [n for n in flat if n.get("@id") == E + "bob"]
    assert hosts and "@annotation" in hosts[0][E + "knows"][0]
