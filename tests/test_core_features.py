"""Feature-coverage fixtures per FIXTURES.md §2 — each case targets a
reference algorithm branch (citations in SURVEY §2.2-§2.6). Expected
triples are hand-computed per the JSON-LD 1.1 spec.
"""

from __future__ import annotations

import json

import pytest

from json_ld_spark.core import api
from json_ld_spark.core.errors import JsonLdError
from json_ld_spark.core.rdf import (
    canonical_double,
    isomorphic,
    jcs_canonicalize,
    parse_nquads,
    triple_to_nquads,
)

EX = "http://example.org/"
XSD = "http://www.w3.org/2001/XMLSchema#"
RDFNS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def check(doc, expected_nq, **opts):
    triples = api.to_rdf(doc, **opts)
    expected = parse_nquads(expected_nq)
    assert isomorphic(triples, expected), (
        "got:\n"
        + "\n".join(sorted(triple_to_nquads(t) for t in triples))
        + "\nexpected:\n"
        + "\n".join(sorted(triple_to_nquads(t) for t in expected))
    )


# ---- value objects: @type / @language / @direction ----------------------

def test_typed_and_language_values():
    doc = {
        "@context": {"ex": EX},
        "@id": "http://a.example/s",
        "ex:date": {"@value": "2024-01-01", "@type": XSD + "date"},
        "ex:label": {"@value": "hallo", "@language": "DE"},
    }
    check(
        doc,
        f"""
<http://a.example/s> <{EX}date> "2024-01-01"^^<{XSD}date> .
<http://a.example/s> <{EX}label> "hallo"@de .
""",
    )


def test_language_from_context_default():
    doc = {
        "@context": {"ex": EX, "@language": "en"},
        "@id": "http://a.example/s",
        "ex:label": "hello",
        "ex:num": 5,
    }
    check(
        doc,
        f"""
<http://a.example/s> <{EX}label> "hello"@en .
<http://a.example/s> <{EX}num> "5"^^<{XSD}integer> .
""",
    )


def test_i18n_direction_datatype():
    doc = {
        "@context": {"ex": EX},
        "@id": "http://a.example/s",
        "ex:t": {"@value": "hi", "@language": "en", "@direction": "ltr"},
    }
    check(
        doc,
        f"""
<http://a.example/s> <{EX}t> "hi"^^<https://www.w3.org/ns/i18n#en_ltr> .
""",
        rdf_direction="i18n-datatype",
    )


# ---- number canonicalization (to_rdf.rb:23-79 parity) -------------------

@pytest.mark.parametrize(
    "value,lex,dt",
    [
        (1, "1", "integer"),
        (True, "true", "boolean"),
        (False, "false", "boolean"),
        (1.0, "1", "integer"),  # integral float, no coercion → integer
        (1.1, "1.1E0", "double"),
        (-0.5, "-5.0E-1", "double"),
        (1e21, "1.0E21", "double"),
        (123456789.123, "1.23456789123E8", "double"),
    ],
)
def test_number_canonicalization(value, lex, dt):
    doc = {"@id": "http://a.example/s", EX + "v": value}
    check(doc, f'<http://a.example/s> <{EX}v> "{lex}"^^<{XSD}{dt}> .')


def test_double_coercion_of_integral():
    doc = {
        "@context": {"v": {"@id": EX + "v", "@type": XSD + "double"}},
        "@id": "http://a.example/s",
        "v": 3,
    }
    check(doc, f'<http://a.example/s> <{EX}v> "3.0E0"^^<{XSD}double> .')


def test_canonical_double_forms():
    assert canonical_double(1.1) == "1.1E0"
    assert canonical_double(0.0000123) == "1.23E-5"
    assert canonical_double(1e21) == "1.0E21"
    assert canonical_double(-2.0) == "-2.0E0"
    assert canonical_double(5.5e-10) == "5.5E-10"


# ---- @json literals (JCS, RFC 8785) --------------------------------------

def test_json_literal():
    doc = {
        "@context": {"j": {"@id": EX + "j", "@type": "@json"}},
        "@id": "http://a.example/s",
        "j": {"b": 2, "a": [True, None, 1.5]},
    }
    lex = '{\\"a\\":[true,null,1.5],\\"b\\":2}'
    check(doc, f'<http://a.example/s> <{EX}j> "{lex}"^^<{RDFNS}JSON> .')


def test_jcs_numbers():
    assert jcs_canonicalize({"x": 1.0}) == '{"x":1}'
    assert jcs_canonicalize(1e30) == "1e+30"
    assert jcs_canonicalize(0.0001) == "0.0001"


# ---- lists (nested) -------------------------------------------------------

def test_nested_list():
    doc = {
        "@id": "http://a.example/s",
        EX + "p": {"@list": [{"@list": [1]}, "x"]},
    }
    check(
        doc,
        f"""
<http://a.example/s> <{EX}p> _:o0 .
_:o0 <{RDFNS}first> _:i0 .
_:o0 <{RDFNS}rest> _:o1 .
_:i0 <{RDFNS}first> "1"^^<{XSD}integer> .
_:i0 <{RDFNS}rest> <{RDFNS}nil> .
_:o1 <{RDFNS}first> "x" .
_:o1 <{RDFNS}rest> <{RDFNS}nil> .
""",
    )


def test_empty_list():
    doc = {"@id": "http://a.example/s", EX + "p": {"@list": []}}
    check(doc, f"<http://a.example/s> <{EX}p> <{RDFNS}nil> .")


def test_list_container():
    doc = {
        "@context": {"p": {"@id": EX + "p", "@container": "@list"}},
        "@id": "http://a.example/s",
        "p": ["a", "b"],
    }
    check(
        doc,
        f"""
<http://a.example/s> <{EX}p> _:l0 .
_:l0 <{RDFNS}first> "a" .
_:l0 <{RDFNS}rest> _:l1 .
_:l1 <{RDFNS}first> "b" .
_:l1 <{RDFNS}rest> <{RDFNS}nil> .
""",
    )


# ---- @set -----------------------------------------------------------------

def test_set_unwrap():
    doc = {"@id": "http://a.example/s", EX + "p": {"@set": ["a", "b"]}}
    check(
        doc,
        f"""
<http://a.example/s> <{EX}p> "a" .
<http://a.example/s> <{EX}p> "b" .
""",
    )


# ---- language maps --------------------------------------------------------

def test_language_map():
    doc = {
        "@context": {"label": {"@id": EX + "label", "@container": "@language"}},
        "@id": "http://a.example/s",
        "label": {"en": "hello", "de": ["hallo", "moin"]},
    }
    check(
        doc,
        f"""
<http://a.example/s> <{EX}label> "hello"@en .
<http://a.example/s> <{EX}label> "hallo"@de .
<http://a.example/s> <{EX}label> "moin"@de .
""",
    )


# ---- index / id / type maps ------------------------------------------------

def test_index_map_drops_index_in_rdf():
    doc = {
        "@context": {"p": {"@id": EX + "p", "@container": "@index"}},
        "@id": "http://a.example/s",
        "p": {"i1": "a", "i2": "b"},
    }
    check(
        doc,
        f"""
<http://a.example/s> <{EX}p> "a" .
<http://a.example/s> <{EX}p> "b" .
""",
    )


def test_id_map():
    doc = {
        "@context": {"@base": "http://a.example/", "p": {"@id": EX + "p", "@container": "@id"}},
        "@id": "http://a.example/s",
        "p": {"http://a.example/x": {EX + "q": "v"}},
    }
    check(
        doc,
        f"""
<http://a.example/s> <{EX}p> <http://a.example/x> .
<http://a.example/x> <{EX}q> "v" .
""",
    )


def test_type_map():
    doc = {
        "@context": {
            "T": EX + "T",
            "p": {"@id": EX + "p", "@container": "@type"},
        },
        "@id": "http://a.example/s",
        "p": {"T": {"@id": "http://a.example/x"}},
    }
    check(
        doc,
        f"""
<http://a.example/s> <{EX}p> <http://a.example/x> .
<http://a.example/x> <{RDFNS}type> <{EX}T> .
""",
    )


# ---- @reverse ---------------------------------------------------------------

def test_reverse_property():
    doc = {
        "@context": {"children": {"@reverse": EX + "parent"}},
        "@id": "http://a.example/alice",
        "children": [{"@id": "http://a.example/bob"}],
    }
    check(
        doc,
        f"<http://a.example/bob> <{EX}parent> <http://a.example/alice> .",
    )


def test_reverse_keyword():
    doc = {
        "@id": "http://a.example/alice",
        "@reverse": {EX + "parent": {"@id": "http://a.example/bob"}},
    }
    check(
        doc,
        f"<http://a.example/bob> <{EX}parent> <http://a.example/alice> .",
    )


# ---- @nest -------------------------------------------------------------------

def test_nest():
    doc = {
        "@context": {"ex": EX, "meta": "@nest"},
        "@id": "http://a.example/s",
        "meta": {"ex:p": "v"},
    }
    check(doc, f'<http://a.example/s> <{EX}p> "v" .')


# ---- scoped contexts -----------------------------------------------------------

def test_property_scoped_context():
    doc = {
        "@context": {
            "ex": EX,
            "rel": {"@id": EX + "rel", "@context": {"name": EX + "name"}},
        },
        "@id": "http://a.example/s",
        "rel": {"@id": "http://a.example/o", "name": "inner"},
    }
    check(
        doc,
        f"""
<http://a.example/s> <{EX}rel> <http://a.example/o> .
<http://a.example/o> <{EX}name> "inner" .
""",
    )


def test_type_scoped_context():
    doc = {
        "@context": {
            "ex": EX,
            "Person": {"@id": EX + "Person", "@context": {"name": EX + "fullName"}},
        },
        "@id": "http://a.example/s",
        "@type": "Person",
        "name": "Alice",
    }
    check(
        doc,
        f"""
<http://a.example/s> <{RDFNS}type> <{EX}Person> .
<http://a.example/s> <{EX}fullName> "Alice" .
""",
    )


def test_type_scoped_context_does_not_propagate():
    doc = {
        "@context": {
            "ex": EX,
            "name": EX + "name",
            "Person": {"@id": EX + "Person", "@context": {"name": EX + "fullName"}},
        },
        "@id": "http://a.example/s",
        "@type": "Person",
        "name": "Alice",
        "ex:knows": {"@id": "http://a.example/o", "name": "Bob"},
    }
    # inside ex:knows the type-scoped context must have reverted
    check(
        doc,
        f"""
<http://a.example/s> <{RDFNS}type> <{EX}Person> .
<http://a.example/s> <{EX}fullName> "Alice" .
<http://a.example/s> <{EX}knows> <http://a.example/o> .
<http://a.example/o> <{EX}name> "Bob" .
""",
    )


# ---- named graphs -----------------------------------------------------------

def test_named_graph():
    doc = {
        "@id": "http://a.example/g",
        "@graph": [{"@id": "http://a.example/s", EX + "p": "v"}],
    }
    check(doc, f'<http://a.example/s> <{EX}p> "v" <http://a.example/g> .')


def test_graph_container():
    doc = {
        "@context": {"claims": {"@id": EX + "claims", "@container": "@graph"}},
        "@id": "http://a.example/s",
        "claims": {EX + "p": "v"},
    }
    triples = api.to_rdf(doc)
    # one triple linking s → graph bnode, one triple inside that graph
    assert len(triples) == 2
    linked = [t for t in triples if t.predicate.value == EX + "claims"]
    inner = [t for t in triples if t.graph is not None]
    assert len(linked) == 1 and len(inner) == 1
    assert linked[0].obj.kind == "bnode"
    assert inner[0].graph.value == linked[0].obj.value


# ---- base / vocab / relative IRIs --------------------------------------------

def test_base_and_relative_iris():
    doc = {
        "@context": {"@base": "http://a.example/dir/", "ex": EX},
        "@id": "doc#frag",
        "ex:rel": {"@id": "../other"},
    }
    check(
        doc,
        f"<http://a.example/dir/doc#frag> <{EX}rel> <http://a.example/other> .",
    )


def test_vocab_mapping():
    doc = {
        "@context": {"@vocab": EX},
        "@id": "http://a.example/s",
        "p": "v",
        "@type": "T",
    }
    check(
        doc,
        f"""
<http://a.example/s> <{RDFNS}type> <{EX}T> .
<http://a.example/s> <{EX}p> "v" .
""",
    )


# ---- drops ---------------------------------------------------------------------

def test_free_floating_values_dropped():
    doc = [
        {"@value": "dangling"},
        {"@id": "http://a.example/ref-only"},
        {"@id": "http://a.example/s", EX + "p": "kept"},
    ]
    check(doc, f'<http://a.example/s> <{EX}p> "kept" .')


def test_null_values_dropped():
    doc = {"@id": "http://a.example/s", EX + "p": None, EX + "q": "v"}
    check(doc, f'<http://a.example/s> <{EX}q> "v" .')


def test_bnode_predicates_dropped_unless_generalized():
    doc = {"@id": "http://a.example/s", "_:p": "v"}
    assert api.to_rdf(doc) == []
    gen = api.to_rdf(doc, produce_generalized_rdf=True)
    assert len(gen) == 1 and gen[0].predicate.kind == "bnode"


def test_relative_iri_objects_dropped():
    doc = {"@id": "http://a.example/s", EX + "p": {"@id": "relative-no-base"}}
    # no base → @id stays relative → dropped at RDF emission
    assert api.to_rdf(doc) == []


# ---- duplicate suppression in node map -----------------------------------------

def test_node_map_merges_duplicate_nodes():
    doc = [
        {"@id": "http://a.example/s", EX + "p": "v"},
        {"@id": "http://a.example/s", EX + "p": "v", EX + "q": "w"},
    ]
    triples = api.to_rdf(doc)
    assert len(triples) == 2  # duplicate (s,p,"v") merged


# ---- negative cases: coded errors (quarantine contract) -------------------------

@pytest.mark.parametrize(
    "doc,code",
    [
        ({"@context": {"id": "@id"}, "@id": "http://e/s", "id": "http://e/t"},
         "colliding keywords"),
        ({"@id": "http://e/s", "@value": "x"}, "invalid value object"),
        ({"@id": ["http://e/a", "http://e/b"]}, "invalid @id value"),
        ({EX + "p": {"@value": "x", "@language": "en", "@type": EX + "t"}},
         "invalid value object"),
        ({EX + "p": {"@value": {"a": 1}}}, "invalid value object value"),
        ({EX + "p": {"@list": ["a"], EX + "q": "b"}}, "invalid set or list object"),
        ({"@context": {"term": {"@id": EX + "t", "@container": "@bogus"}},
          "term": "x"}, "invalid container mapping"),
        ({"@context": {"@version": 2.0}, EX + "p": "x"}, "invalid @version value"),
        ({"@context": "http://not-preloaded.example/ctx", EX + "p": "x"},
         "loading remote context failed"),
    ],
)
def test_error_codes(doc, code):
    with pytest.raises(JsonLdError) as exc_info:
        api.to_rdf(doc)
    assert exc_info.value.code == code


def test_from_vocabulary():
    """Context#from_vocabulary parity (context.rb:1060-1120)."""
    from json_ld_spark.core.context import from_vocabulary
    from json_ld_spark.core.rdf import parse_nquads

    RDF_T = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    RDFS = "http://www.w3.org/2000/01/rdf-schema#"
    nq = f"""
<http://v/#Person> <{RDF_T}type> <{RDFS}Class> .
<http://v/#knows> <{RDF_T}type> <{RDF_T}Property> .
<http://v/#knows> <{RDFS}range> <http://v/#Person> .
<http://v/#age> <{RDF_T}type> <{RDF_T}Property> .
<http://v/#age> <{RDFS}range> <http://www.w3.org/2001/XMLSchema#integer> .
<http://v/#bio> <{RDF_T}type> <{RDF_T}Property> .
<http://v/#bio> <{RDFS}range> <{RDFS}Literal> .
"""
    ctx = from_vocabulary(parse_nquads(nq))
    assert ctx.terms["knows"].type_mapping == "@id"
    assert ctx.terms["age"].type_mapping.endswith("integer")
    assert "bio" not in ctx.terms  # literal range skipped
    assert ctx.terms["Person"].iri == "http://v/#Person"
    # the generated context actually drives expansion (importlib: the
    # package re-exports an `expand` FUNCTION that shadows the module)
    import importlib

    em = importlib.import_module("json_ld_spark.core.expand")
    out = em.expand({"@id": "http://e/a", "knows": "http://e/b", "age": 41},
                    None, ctx)
    node = out[0] if isinstance(out, list) else out
    assert node["http://v/#knows"] == [{"@id": "http://e/b"}]
    assert node["http://v/#age"] == [
        {"@value": 41, "@type": "http://www.w3.org/2001/XMLSchema#integer"}
    ]
