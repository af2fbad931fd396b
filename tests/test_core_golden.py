"""Golden quintuple fixtures (reference: spec/test-files/test-N-*)
through the pure core: expand → (compare expanded), toRDF → (compare
triples under bnode isomorphism), compact → (compare compacted).

Expected triples are hand-derived N-Quads transcriptions of the
reference's test-N-rdf.ttl files (tests 1-8; test-9 ships no ttl).
Comparison is graph-isomorphic, mirroring the reference harness
(spec/suite_helper.rb:268-274).
"""

from __future__ import annotations

import json
import os

import pytest

from json_ld_spark.core import api
from json_ld_spark.core.rdf import isomorphic, parse_nquads, triple_to_nquads

GOLDEN = "/root/reference/spec/test-files"

FOAF = "http://xmlns.com/foaf/0.1/"
RDFNS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
EXV = "http://example.org/vocab#"
DCE = "http://purl.org/dc/elements/1.1/"
DCT = "http://purl.org/dc/terms/"

EXPECTED_NQUADS = {
    1: f"""
_:b0 <{FOAF}avatar> "http://twitter.com/account/profile_image/manusporny" .
_:b0 <{FOAF}homepage> "http://manu.sporny.org/" .
_:b0 <{FOAF}name> "Manu Sporny" .
""",
    2: f"""
<http://example.org/library> <{RDFNS}type> <{EXV}Library> .
<http://example.org/library> <{EXV}contains> <http://example.org/library/the-republic> .
<http://example.org/library/the-republic> <{RDFNS}type> <{EXV}Book> .
<http://example.org/library/the-republic> <{EXV}contains> <http://example.org/library/the-republic#introduction> .
<http://example.org/library/the-republic> <{DCE}creator> "Plato" .
<http://example.org/library/the-republic> <{DCE}title> "The Republic" .
<http://example.org/library/the-republic#introduction> <{RDFNS}type> <{EXV}Chapter> .
<http://example.org/library/the-republic#introduction> <{DCE}description> "An introductory chapter on The Republic." .
<http://example.org/library/the-republic#introduction> <{DCE}title> "The Introduction" .
""",
    3: f"""
_:b0 <{FOAF}age> "41"^^<http://www.w3.org/2001/XMLSchema#integer> .
_:b0 <{FOAF}homepage> <http://manu.sporny.org/> .
_:b0 <{FOAF}name> "Manu Sporny" .
""",
    4: f"""
<http://manu.sporny.org/#me> <{RDFNS}type> <{FOAF}Person> .
<http://manu.sporny.org/#me> <{FOAF}homepage> <http://manu.sporny.org/> .
<http://manu.sporny.org/#me> <{FOAF}name> "Manu Sporny" .
""",
    5: f"""
<http://manu.sporny.org/#me> <{RDFNS}type> <{FOAF}Person> .
<http://manu.sporny.org/#me> <{FOAF}knows> _:b0 .
<http://manu.sporny.org/#me> <{FOAF}name> "Manu Sporny" .
_:b0 <{RDFNS}type> <{FOAF}Person> .
_:b0 <{FOAF}name> "Gregg Kellogg" .
""",
    6: f"""
<http://example.org/people#joebob> <{RDFNS}type> <{FOAF}Person> .
<http://example.org/people#joebob> <{FOAF}name> "Joe Bob" .
<http://example.org/people#joebob> <{FOAF}nick> _:l0 .
_:l0 <{RDFNS}first> "joe" .
_:l0 <{RDFNS}rest> _:l1 .
_:l1 <{RDFNS}first> "bob" .
_:l1 <{RDFNS}rest> _:l2 .
_:l2 <{RDFNS}first> "jaybe" .
_:l2 <{RDFNS}rest> <{RDFNS}nil> .
""",
    7: f"""
_:b0 <{RDFNS}type> <{FOAF}Person> .
_:b0 <{FOAF}homepage> "http://example.com/bob/" .
_:b0 <{FOAF}name> "Bob" .
_:b1 <{RDFNS}type> <{FOAF}Person> .
_:b1 <{FOAF}homepage> "http://example.com/eve/" .
_:b1 <{FOAF}name> "Eve" .
_:b2 <{RDFNS}type> <{FOAF}Person> .
_:b2 <{FOAF}homepage> "http://example.com/manu/" .
_:b2 <{FOAF}name> "Manu" .
""",
    8: f"""
<http://example.com/library> <{RDFNS}type> <{EXV}Library> .
<http://example.com/library> <{EXV}contains> <http://example.org/library/the-republic> .
<http://example.org/library/the-republic> <{RDFNS}type> <{EXV}Book> .
<http://example.org/library/the-republic> <{EXV}contains> <http://example.org/library/the-republic#introduction> .
<http://example.org/library/the-republic> <{DCT}creator> "Plato" .
<http://example.org/library/the-republic> <{DCT}title> "The Republic" .
<http://example.org/library/the-republic#introduction> <{RDFNS}type> <{EXV}Chapter> .
<http://example.org/library/the-republic#introduction> <{DCT}description> "An introductory chapter on The Republic." .
<http://example.org/library/the-republic#introduction> <{DCT}title> "The Introduction" .
""",
}


def load(name: str):
    path = os.path.join(GOLDEN, name)
    with open(path) as f:
        return json.load(f)


def json_multiset_eq(a, b) -> bool:
    """Order-insensitive JSON comparison (arrays as multisets), like the
    reference's produce_jsonld matcher (spec/matchers.rb:6)."""
    if isinstance(a, dict) and isinstance(b, dict):
        return set(a) == set(b) and all(json_multiset_eq(a[k], b[k]) for k in a)
    if isinstance(a, list) and isinstance(b, list):
        if len(a) != len(b):
            return False
        unused = list(b)
        for item in a:
            for i, other in enumerate(unused):
                if json_multiset_eq(item, other):
                    unused.pop(i)
                    break
            else:
                return False
        return True
    if type(a) is bool or type(b) is bool:
        return a is b
    return a == b


@pytest.mark.parametrize("n", range(1, 10))
def test_expand_golden(n):
    expanded = api.expand(load(f"test-{n}-input.jsonld"))
    expected = load(f"test-{n}-expanded.jsonld")
    assert json_multiset_eq(expanded, expected), (
        f"test-{n} expand mismatch:\n{json.dumps(expanded, indent=1)}\n"
        f"expected:\n{json.dumps(expected, indent=1)}"
    )


@pytest.mark.parametrize("n", sorted(EXPECTED_NQUADS))
def test_to_rdf_golden(n):
    triples = api.to_rdf(load(f"test-{n}-input.jsonld"))
    expected = parse_nquads(EXPECTED_NQUADS[n])
    assert isomorphic(triples, expected), (
        f"test-{n} toRDF mismatch:\n"
        + "\n".join(sorted(triple_to_nquads(t) for t in triples))
        + "\nexpected:\n"
        + "\n".join(sorted(triple_to_nquads(t) for t in expected))
    )


@pytest.mark.parametrize("n", range(1, 10))
def test_compact_golden(n):
    doc = load(f"test-{n}-input.jsonld")
    expected = load(f"test-{n}-compacted.jsonld")
    ctx = expected.get("@context")
    compacted = api.compact(doc, {"@context": ctx})
    assert json_multiset_eq(compacted, expected), (
        f"test-{n} compact mismatch:\n{json.dumps(compacted, indent=1)}\n"
        f"expected:\n{json.dumps(expected, indent=1)}"
    )


@pytest.mark.parametrize("n", range(1, 10))
def test_roundtrip_rdf(n):
    """toRDF → fromRDF → toRDF must be a fixpoint (graph-isomorphic)."""
    doc = load(f"test-{n}-input.jsonld")
    triples = api.to_rdf(doc)
    expanded2 = api.from_rdf(triples)
    triples2 = api.to_rdf(expanded2)
    assert isomorphic(triples, triples2), f"test-{n} RDF roundtrip not a fixpoint"
