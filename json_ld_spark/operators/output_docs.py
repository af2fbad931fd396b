"""Output formatting: graph triples → JSON-LD documents
(fromRDF → compact with the pipeline @context), distributed per
conversation.

Parity: Writer.write_epilogue (/root/reference/lib/json/ld/
writer.rb:313-364) buffers statements and serializes via fromRdf +
optional compaction; here the buffer is a DataFrame group and the
serialization runs in applyInPandas per conv_id — compaction is a
downstream view of the triple table (SURVEY §2.1 Writer row).
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from json_ld_spark.sources.gazetteer import KG_CONTEXT


def triples_to_documents(triples: DataFrame) -> DataFrame:
    """(conv_id, doc_json): one compacted JSON-LD document per
    conversation, reassembled from its triples.

    groupBy(conv_id).applyInPandas — each group is one conversation's
    triples (bounded by conversation size; the same salting story as
    the forward path applies for pathological conversations)."""

    def _assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        from json_ld_spark.core import api as core_api
        from json_ld_spark.core.rdf import Term, Triple

        conv_id = pdf["conv_id"].iloc[0]
        trs = []
        for subj, pred, obj_value, obj_is_iri, obj_dt, obj_lang in zip(
            pdf["subj"], pdf["pred"], pdf["obj_value"], pdf["obj_is_iri"],
            pdf["obj_datatype"], pdf["obj_language"],
        ):
            s = (
                Term("bnode", subj[2:])
                if subj.startswith("_:")
                else Term("iri", subj)
            )
            p = Term("iri", pred)
            if obj_is_iri:
                o = (
                    Term("bnode", obj_value[2:])
                    if obj_value.startswith("_:")
                    else Term("iri", obj_value)
                )
            else:
                o = Term(
                    "literal", obj_value,
                    obj_dt if pd.notna(obj_dt) else None,
                    obj_lang if pd.notna(obj_lang) else None,
                )
            trs.append(Triple(s, p, o, None))
        expanded = core_api.from_rdf(trs, use_native_types=True)
        compacted = core_api.compact(
            expanded, {"@context": KG_CONTEXT}, expanded_input=True
        )
        return pd.DataFrame(
            {"conv_id": [conv_id], "doc_json": [json.dumps(compacted, sort_keys=True)]}
        )

    valid = triples.filter(triples["error_code"].isNull()) if "error_code" in triples.columns else triples
    return valid.groupBy("conv_id").applyInPandas(
        _assemble, schema="conv_id string, doc_json string"
    )


def documents_to_triples(
    docs: DataFrame, json_col: str = "doc_json"
) -> DataFrame:
    """Inverse of triples_to_documents: expand each compacted JSON-LD
    document and re-emit its triples with a pass-through bnode namer
    (labels preserved verbatim). Parity: Reader (reader.rb:76-121) —
    documents back to statements.

    This closes the round-trip correctness gate for the writer path:
    triples → fromRdf+compact → expand+toRdf must reproduce the
    original triple set exactly (incl. bnode labels), so the DuckDB
    triple oracle validates the document JSON end-to-end."""

    def _emit(batches) -> "Iterator[pd.DataFrame]":
        from json_ld_spark.core import api as core_api
        from json_ld_spark.core.keywords import BlankNodeMapper

        for pdf in batches:
            rows = []
            for doc_json in pdf[json_col]:
                doc = json.loads(doc_json)
                for t in core_api.to_rdf(doc, namer=BlankNodeMapper()):
                    subj = (
                        "_:" + t.subject.value
                        if t.subject.kind == "bnode"
                        else t.subject.value
                    )
                    obj_is_iri = t.obj.kind != "literal"
                    obj_value = (
                        "_:" + t.obj.value
                        if t.obj.kind == "bnode"
                        else t.obj.value
                    )
                    rows.append(
                        (
                            subj,
                            t.predicate.value,
                            obj_value,
                            obj_is_iri,
                            None if obj_is_iri else t.obj.datatype,
                            None if obj_is_iri else t.obj.language,
                            (
                                "_:" + t.graph.value
                                if t.graph.kind == "bnode"
                                else t.graph.value
                            )
                            if t.graph is not None
                            else None,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "subj", "pred", "obj_value", "obj_is_iri",
                    "obj_datatype", "obj_language", "graph",
                ],
            )

    return docs.mapInPandas(
        _emit,
        schema=(
            "subj string, pred string, obj_value string, "
            "obj_is_iri boolean, obj_datatype string, "
            "obj_language string, graph string"
        ),
    )


def frame_conversations(triples: DataFrame) -> DataFrame:
    """(conv_id, framed_json): frame each conversation's triples into
    one nested Conversation document — framing (the reference's
    declarative query language, frame.rb:26-215) run distributed,
    one frame evaluation per conversation group.

    The frame matches the Conversation node and embeds its turns via
    @reverse partOf, so the output nests turn → mention chains."""

    def _frame(pdf: pd.DataFrame) -> pd.DataFrame:
        from json_ld_spark.core import api as core_api
        from json_ld_spark.core.rdf import Term, Triple
        from json_ld_spark.sources.gazetteer import CONV_NS, VOCAB

        conv_id = pdf["conv_id"].iloc[0]
        trs = []
        for subj, pred, obj_value, obj_is_iri, obj_dt, obj_lang in zip(
            pdf["subj"], pdf["pred"], pdf["obj_value"], pdf["obj_is_iri"],
            pdf["obj_datatype"], pdf["obj_language"],
        ):
            s = (
                Term("bnode", subj[2:])
                if subj.startswith("_:")
                else Term("iri", subj)
            )
            p = Term("iri", pred)
            if obj_is_iri:
                o = (
                    Term("bnode", obj_value[2:])
                    if obj_value.startswith("_:")
                    else Term("iri", obj_value)
                )
            else:
                o = Term(
                    "literal", obj_value,
                    obj_dt if pd.notna(obj_dt) else None,
                    obj_lang if pd.notna(obj_lang) else None,
                )
            trs.append(Triple(s, p, o, None))
        expanded = core_api.from_rdf(trs, use_native_types=True)
        # @container @set on turns/mentions: arrays stay arrays even
        # when singletons, so downstream relational extraction
        # (from_json with a fixed array schema) never sees a bare
        # object — semantically neutral, shape-stabilizing
        frame = {
            "@context": {
                **KG_CONTEXT,
                "turns": {"@reverse": VOCAB + "partOf", "@container": "@set"},
                "mentions": {
                    "@id": VOCAB + "mentions",
                    "@type": "@id",
                    "@container": "@set",
                },
            },
            "@id": CONV_NS + conv_id,
            "turns": {},
        }
        framed = core_api.frame(expanded, frame)
        return pd.DataFrame(
            {"conv_id": [conv_id],
             "framed_json": [json.dumps(framed, sort_keys=True)]}
        )

    valid = (
        triples.filter(triples["error_code"].isNull())
        if "error_code" in triples.columns
        else triples
    )
    return valid.groupBy("conv_id").applyInPandas(
        _frame, schema="conv_id string, framed_json string"
    )
