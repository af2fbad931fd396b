"""Property-based parity: the raw streaming key-order reader and the
node-map toRDF path must produce ISOMORPHIC graphs on arbitrary
streaming-profile documents (or fail with the same spec error code).

The example-based tests pin known shapes; this generates documents
from a bounded grammar of the constructs both paths implement —
node objects, value objects (typed / language-tagged / @json),
lists (nested), @set, @reverse, @graph, index containers — always
emitted in streaming-profile key order (@context < @type < @id <
properties), which is the order the profile accepts by construction.

Parity target: streaming_reader.rb:29-643 vs to_rdf.rb via the same
input; the reference runs its streaming specs against the node-map
expectation the same way (spec/streaming_reader_spec.rb).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from json_ld_spark.core import api as core_api
from json_ld_spark.core.errors import JsonLdError
from json_ld_spark.core.rdf import isomorphic
from json_ld_spark.core.streaming_reader import stream_to_rdf

IRIS = [f"http://e/p{i}" for i in range(4)]
TYPES = ["http://e/T1", "http://e/T2"]
NODE_IDS = ["http://e/a", "http://e/b", "http://e/c"]
LANGS = ["en", "fr"]
DATATYPES = ["http://e/dt1", "http://www.w3.org/2001/XMLSchema#integer"]

scalars = st.one_of(
    st.text(alphabet="abßé日", min_size=0, max_size=6),
    st.integers(min_value=-3, max_value=10),
    st.booleans(),
    st.floats(min_value=-4, max_value=4, allow_nan=False, width=32),
)


def value_objects() -> st.SearchStrategy:
    typed = st.fixed_dictionaries(
        {"@type": st.sampled_from(DATATYPES), "@value": scalars}
    )
    tagged = st.fixed_dictionaries(
        {
            "@language": st.sampled_from(LANGS),
            "@value": st.text(alphabet="xyz ", max_size=5),
        }
    )
    js = st.fixed_dictionaries(
        {
            "@type": st.just("@json"),
            "@value": st.recursive(
                scalars,
                lambda c: st.lists(c, max_size=3)
                | st.dictionaries(st.sampled_from("abc"), c, max_size=3),
                max_leaves=6,
            ),
        }
    )
    return st.one_of(typed, tagged, js)


def list_entries(depth: int) -> st.SearchStrategy:
    """@list entries that expand to exactly ONE object. The reference
    streaming reader keeps only the LAST object of a multi-object list
    entry (entry_value reassignment, streaming_reader.rb:627-634) and
    drops statement-less entries, while its own node-map path splices
    them all — a by-design stream/node-map divergence in the reference
    itself, so the parity property quantifies over single-object
    entries only (the pinned example test covers the keep-last rule)."""
    base = st.one_of(
        scalars,
        value_objects(),
        st.fixed_dictionaries({"@id": st.sampled_from(NODE_IDS)}),
    )
    if depth <= 0:
        return base
    return st.one_of(
        base,
        st.fixed_dictionaries(
            {"@list": st.lists(list_entries(depth - 1), max_size=3)}
        ),
    )


def objects(depth: int) -> st.SearchStrategy:
    base = st.one_of(
        scalars,
        value_objects(),
        st.fixed_dictionaries({"@id": st.sampled_from(NODE_IDS)}),
    )
    if depth <= 0:
        return base
    return st.one_of(
        base,
        node_objects(depth - 1),
        st.fixed_dictionaries(
            {"@list": st.lists(list_entries(depth - 1), max_size=3)}
        ),
        st.fixed_dictionaries(
            {"@set": st.lists(objects(depth - 1), max_size=3)}
        ),
    )


def node_objects(depth: int) -> st.SearchStrategy:
    props = st.dictionaries(
        st.sampled_from(IRIS),
        st.one_of(objects(depth), st.lists(objects(depth), max_size=2)),
        max_size=3,
    )

    def assemble(parts):
        typ, nid, props, rev = parts
        # streaming-profile key order: @type, then @id, then properties
        doc: dict = {}
        if typ is not None:
            doc["@type"] = typ
        if nid is not None:
            doc["@id"] = nid
        doc.update(sorted(props.items()))
        if rev is not None:
            doc["@reverse"] = rev
        return doc

    return st.tuples(
        st.one_of(st.none(), st.sampled_from(TYPES),
                  st.lists(st.sampled_from(TYPES), max_size=2)),
        st.one_of(st.none(), st.sampled_from(NODE_IDS)),
        props,
        st.one_of(
            st.none(),
            st.dictionaries(
                st.sampled_from(IRIS),
                st.fixed_dictionaries({"@id": st.sampled_from(NODE_IDS)}),
                max_size=2,
            ),
        ),
    ).map(assemble)


documents = st.one_of(
    node_objects(2),
    st.lists(node_objects(1), max_size=3),
    st.fixed_dictionaries(
        {
            "@id": st.sampled_from(NODE_IDS),
            "@graph": st.lists(node_objects(1), max_size=2),
        }
    ),
)


# The streaming profile is STRICTER than the node-map path by design —
# these codes may fire on the stream side while the node-map side
# succeeds (each verified against the reference):
#   - key-order / keyword collisions: the profile's defining rule
#     (streaming_reader.rb:144-156,219-222);
#   - invalid reverse property value: a reversed node that makes no
#     claim on its subject (e.g. {"@reverse": {}} or an empty reversed
#     node) raises in the stream (has_own_subject check,
#     streaming_reader.rb:318-320) where expansion just drops it.
STREAM_STRICTER = {
    "invalid streaming key order",
    "colliding keywords",
    "invalid reverse property value",
}


@given(doc=documents)
@settings(max_examples=150, deadline=None)
def test_stream_path_isomorphic_to_node_map_path(doc):
    try:
        expected = core_api.to_rdf(doc)
        expected_err = None
    except JsonLdError as e:
        expected, expected_err = None, e.code
    try:
        streamed = stream_to_rdf(doc)
        streamed_err = None
    except JsonLdError as e:
        streamed, streamed_err = None, e.code
    if streamed_err in STREAM_STRICTER and expected_err is None:
        return  # by-design profile strictness (see above)
    if expected_err is not None or streamed_err is not None:
        assert expected_err == streamed_err, (
            f"error divergence on {doc!r}: "
            f"node-map={expected_err} stream={streamed_err}"
        )
        return
    assert isomorphic(streamed, expected), (
        f"graph divergence on {doc!r}:\n"
        f"stream:   {sorted(map(str, streamed))}\n"
        f"node-map: {sorted(map(str, expected))}"
    )
