"""Property-based compact/expand coherence: for any document in
expanded form and any context from a bounded grammar, compacting with
the context and re-processing the compacted document must yield an
ISOMORPHIC RDF graph.

This is the spec's round-trip guarantee (compaction only changes
surface form, never graph content) quantified over generated inputs —
the harvested spec cases pin known shapes; this hunts the corners
between them: term selection vs coercion mismatches, @container
set/list, language maps, CURIE vs vocab compaction.

Parity target: the reference round-trips the same way in its compact
specs (spec/compact_spec.rb drives compact then checks expansion).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from json_ld_spark.core import api as core_api
from json_ld_spark.core.rdf import isomorphic

VOCAB = "http://vocab.example/"
IRIS = [VOCAB + n for n in ("name", "knows", "age", "tag")]
NODE_IDS = ["http://e/a", "http://e/b"]
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"


def contexts() -> st.SearchStrategy:
    """Term definitions over the fixed property set: plain, typed
    (@id / xsd:integer), language-tagged, @set/@list containers,
    plus optional @vocab and a CURIE prefix."""
    term_def = st.one_of(
        st.none(),  # term not mapped → compacts via @vocab/prefix/IRI
        st.just({}),
        st.just({"@type": "@id"}),
        st.just({"@type": XSD_INT}),
        st.just({"@language": "en"}),
        st.just({"@container": "@set"}),
        st.just({"@container": "@list"}),
    )

    def assemble(parts):
        use_vocab, use_prefix, defs = parts
        ctx: dict = {}
        if use_vocab:
            ctx["@vocab"] = VOCAB
        if use_prefix:
            ctx["v"] = VOCAB
        for iri, d in zip(IRIS, defs):
            term = iri.rsplit("/", 1)[1]
            if d is None:
                continue
            ctx[term] = iri if d == {} else {"@id": iri, **d}
        return ctx

    return st.tuples(
        st.booleans(), st.booleans(), st.lists(term_def, min_size=4, max_size=4)
    ).map(assemble)


scalars = st.one_of(
    st.text(alphabet="ab é", max_size=5),
    st.integers(min_value=-5, max_value=20),
    st.booleans(),
)

expanded_values = st.one_of(
    scalars.map(lambda v: {"@value": v}),
    st.text(alphabet="xy", max_size=4).map(
        lambda v: {"@value": v, "@language": "en"}
    ),
    st.integers(min_value=0, max_value=9).map(
        lambda v: {"@value": str(v), "@type": XSD_INT}
    ),
    st.sampled_from(NODE_IDS).map(lambda i: {"@id": i}),
)


list_objects = st.builds(
    lambda vs: {"@list": vs}, st.lists(expanded_values, max_size=3)
)


def non_list_objects(depth: int) -> st.SearchStrategy:
    if depth <= 0:
        return expanded_values
    return st.one_of(expanded_values, expanded_nodes(depth - 1))


def property_values(depth: int) -> st.SearchStrategy:
    """Either 1-2 non-list objects, or exactly ONE list object: a
    @list-container term can only represent a single list in compacted
    form — with multiple lists on one property, the spec's compaction
    algorithm (and the reference, compact.rb:230-235 add_value append)
    merges them lossily, an acknowledged non-round-trippable corner."""
    return st.one_of(
        st.lists(non_list_objects(depth), min_size=1, max_size=2),
        list_objects.map(lambda lo: [lo]),
    )


def expanded_nodes(depth: int) -> st.SearchStrategy:
    def assemble(parts):
        nid, props = parts
        doc: dict = {}
        if nid is not None:
            doc["@id"] = nid
        for iri, objs in props.items():
            doc[iri] = objs
        return doc

    return st.tuples(
        st.one_of(st.none(), st.sampled_from(NODE_IDS)),
        st.dictionaries(
            st.sampled_from(IRIS),
            property_values(depth),
            max_size=3,
        ),
    ).map(assemble)


@given(doc=expanded_nodes(2), ctx=contexts())
@settings(max_examples=200, deadline=None)
def test_compact_then_reprocess_is_graph_preserving(doc, ctx):
    expected = core_api.to_rdf([doc])
    compacted = core_api.compact([doc], ctx)
    # the compacted document re-enters the pipeline as a user document
    got = core_api.to_rdf(compacted)
    assert isomorphic(got, expected), (
        f"graph changed through compaction\ndoc: {doc!r}\nctx: {ctx!r}\n"
        f"compacted: {compacted!r}\n"
        f"expected: {sorted(map(str, expected))}\n"
        f"got:      {sorted(map(str, got))}"
    )
