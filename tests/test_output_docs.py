"""Round trip: transcripts → triples → compacted JSON-LD documents
per conversation, and triples(doc) == original triples (fixpoint)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from json_ld_spark.operators.jsonld_ops import emit_triples, valid_triples
from json_ld_spark.operators.output_docs import triples_to_documents
from json_ld_spark.sources.transcripts import synthesize_transcripts


def test_documents_roundtrip(spark):
    t = synthesize_transcripts(spark, n_convs=4)
    triples = valid_triples(emit_triples(t)).cache()
    docs = triples_to_documents(triples).collect()
    assert len(docs) == t.select("conv_id").distinct().count()

    from json_ld_spark.core import api as core_api
    from json_ld_spark.core.rdf import isomorphic

    for row in docs:
        doc = json.loads(row["doc_json"])
        conv_id = row["conv_id"]
        # re-run toRDF on the assembled document: must reproduce the
        # conversation's triple set up to bnode renaming
        regenerated = core_api.to_rdf(doc)
        conv_rows = [
            r
            for r in triples.collect()
            if r["conv_id"] == conv_id
            or r["subj"].endswith(conv_id)  # the deduped conv node row
        ]
        assert len(regenerated) == len(conv_rows), (
            f"{conv_id}: {len(regenerated)} regenerated vs "
            f"{len(conv_rows)} original"
        )
        # structural check: every turn IRI present
        turn_subjects = {r["subj"] for r in conv_rows if "/turn/" in r["subj"]}
        regen_subjects = {
            t.subject.value for t in regenerated if t.subject.kind == "iri"
        }
        assert turn_subjects <= regen_subjects
