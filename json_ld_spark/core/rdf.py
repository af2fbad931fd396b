"""RDF triple model + canonical literal forms + N-Quads I/O +
bnode-isomorphism graph comparison.

Literal canonicalization parity (must be bit-exact for triple P/R):
  - boolean/number/string forms  /root/reference/lib/json/ld/to_rdf.rb:23-79
  - double threshold value>=1e21 to_rdf.rb:42
  - E+NN → ENN normalization     to_rdf.rb:43-50
  - @json via JCS                to_rdf.rb:38,52-54 (RFC 8785)
Graph isomorphism compare parity: spec/suite_helper.rb:268-274 (the
reference's own harness compares toRDF results up to bnode renaming).
"""

from __future__ import annotations

import json
import math
import re
from dataclasses import dataclass
from itertools import permutations
from typing import Any, Iterable, Optional

from json_ld_spark.core.keywords import (
    RDF_JSON,
    RDF_LANGSTRING,
    XSD_BOOLEAN,
    XSD_DOUBLE,
    XSD_INTEGER,
    XSD_STRING,
)

# term kinds
IRI = "iri"
BNODE = "bnode"
LITERAL = "literal"
QUOTED = "quoted"  # RDF-star quoted triple: value holds a Triple


@dataclass(frozen=True)
class Term:
    kind: str  # iri | bnode | literal
    value: str
    datatype: Optional[str] = None  # literals only
    language: Optional[str] = None

    def is_iri(self) -> bool:
        return self.kind == IRI

    def is_bnode(self) -> bool:
        return self.kind == BNODE


@dataclass(frozen=True)
class Triple:
    subject: Term
    predicate: Term
    obj: Term
    graph: Optional[Term] = None  # None = default graph


_IRI_INTERN: dict = {}


def iri(v: str) -> Term:
    # predicates/types repeat across millions of documents; interning
    # skips dataclass construction on the hot path (Term is frozen)
    t = _IRI_INTERN.get(v)
    if t is None:
        if len(_IRI_INTERN) >= 4096:
            _IRI_INTERN.clear()
        t = Term(IRI, v)
        _IRI_INTERN[v] = t
    return t


def bnode(v: str) -> Term:
    return Term(BNODE, v[2:] if v.startswith("_:") else v)


def literal(value: str, datatype: Optional[str] = None, language: Optional[str] = None) -> Term:
    if language:
        return Term(LITERAL, value, RDF_LANGSTRING, language)
    return Term(LITERAL, value, datatype or XSD_STRING, None)


def as_term(v: str) -> Term:
    """'_:x' → bnode else IRI. Parity: utils.rb:105-114."""
    return bnode(v) if v.startswith("_:") else iri(v)


def quoted(t: "Triple") -> Term:
    """RDF-star quoted-triple term (subject/object position)."""
    return Term(QUOTED, t)


# ---------------------------------------------------------------------------
# canonical lexical forms
# ---------------------------------------------------------------------------

def canonical_double(value: float) -> str:
    """Canonical xsd:double lexical form, matching Ruby's
    RDF::Literal::Double#canonicalize + the E+→E rewrite
    (to_rdf.rb:43-50): mantissa with one leading digit and no trailing
    zeros (at least one fraction digit), exponent without '+' or
    leading zeros.
    """
    if math.isnan(value):
        return "NaN"
    if math.isinf(value):
        return "INF" if value > 0 else "-INF"
    if value == 0:
        return "-0.0E0" if math.copysign(1.0, value) < 0 else "0.0E0"
    s = f"{value:.15E}"
    mantissa, _, exponent = s.partition("E")
    # trim mantissa trailing zeros but keep one fraction digit
    if "." in mantissa:
        mantissa = mantissa.rstrip("0")
        if mantissa.endswith("."):
            mantissa += "0"
    exp = int(exponent)
    # round-trip check: %.15E can produce a non-shortest mantissa; use
    # repr-based shortest form when it round-trips to the same float
    short = repr(value)
    m = re.match(r"^(-?)(\d)(?:\.(\d+))?[eE]([+-]?\d+)$", short)
    if m:
        sign, lead, frac, e = m.groups()
        mantissa = f"{sign}{lead}.{frac or '0'}"
        exp = int(e)
    else:
        m2 = re.match(r"^(-?)(\d+)(?:\.(\d+))?$", short)
        if m2:
            sign, intpart, frac = m2.groups()
            digits = (intpart + (frac or "")).lstrip("0") or "0"
            # position of decimal point after first digit
            first_nonzero = 0
            full = intpart + "." if not frac else intpart + "." + frac
            # compute exponent from value directly
            exp = math.floor(math.log10(abs(value))) if value != 0 else 0
            # build mantissa from digits
            dstr = digits.rstrip("0") or "0"
            mantissa = f"{sign}{dstr[0]}.{dstr[1:] or '0'}"
            # verify
            if float(f"{mantissa}E{exp}") != value:
                s = f"{value:.17E}"
                mantissa, _, exponent = s.partition("E")
                mantissa = mantissa.rstrip("0")
                if mantissa.endswith("."):
                    mantissa += "0"
                exp = int(exponent)
    return f"{mantissa}E{exp}"


_ES_NUM_INT = re.compile(r"^-?\d+$")


def _jcs_number(value: Any) -> str:
    """RFC 8785 (JCS) number serialization = ECMAScript Number→String."""
    if isinstance(value, int):
        return str(value)
    if value != value:  # NaN
        raise ValueError("NaN not allowed in JSON")
    if value == int(value) and abs(value) < 1e21:
        return str(int(value))
    # shortest repr that round-trips, ECMA-style exponent formatting
    s = repr(value)
    if "e" in s or "E" in s:
        mant, _, exp = s.partition("e")
        expi = int(exp)
        if "." in mant:
            mant = mant.rstrip("0").rstrip(".")
        return f"{mant}e{'+' if expi >= 0 else ''}{expi}"
    return s


def jcs_canonicalize(value: Any) -> str:
    """RFC 8785 JSON Canonicalization Scheme (subset sufficient for
    rdf:JSON literals). Parity: to_json_c14n, to_rdf.rb:38,52-54."""
    if value is None:
        return "null"
    if value is True:
        return "true"
    if value is False:
        return "false"
    if isinstance(value, (int, float)):
        return _jcs_number(value)
    if isinstance(value, str):
        return json.dumps(value, ensure_ascii=False)
    if isinstance(value, list):
        return "[" + ",".join(jcs_canonicalize(v) for v in value) + "]"
    if isinstance(value, dict):
        items = sorted(value.items(), key=lambda kv: kv[0].encode("utf-16-be"))
        return (
            "{"
            + ",".join(
                json.dumps(k, ensure_ascii=False) + ":" + jcs_canonicalize(v)
                for k, v in items
            )
            + "}"
        )
    raise ValueError(f"not JSON-serializable: {value!r}")


def object_to_rdf_literal(value: Any, datatype: Optional[str], language: Optional[str],
                          direction: Optional[str] = None,
                          rdf_direction: Optional[str] = None) -> Term:
    """Scalar JSON value (+coercions) → RDF literal term.

    Parity: item_to_rdf value-object branch, to_rdf.rb:23-79.
    """
    if datatype == "@json" or datatype == RDF_JSON:
        return Term(LITERAL, jcs_canonicalize(value), RDF_JSON, None)
    if isinstance(value, bool):
        lex = "true" if value else "false"
        return Term(LITERAL, lex, datatype or XSD_BOOLEAN, None)
    if isinstance(value, float) or (
        isinstance(value, int) and datatype == XSD_DOUBLE
    ):
        v = float(value)
        if (
            (isinstance(value, int) or v == math.ceil(v))
            and abs(v) < 1e21
            and datatype in (None, XSD_INTEGER)
        ):
            return Term(LITERAL, str(int(v)), XSD_INTEGER, None)
        return Term(LITERAL, canonical_double(v), datatype or XSD_DOUBLE, None)
    if isinstance(value, int):
        return Term(LITERAL, str(value), datatype or XSD_INTEGER, None)
    # string
    value = str(value)
    # language tags lowercase in RDF literals (to_rdf.rb:58,76 via
    # RDF::Literal canonical form), though expansion preserves case
    if direction is not None and rdf_direction == "i18n-datatype":
        dt = f"https://www.w3.org/ns/i18n#{(language or '').lower()}_{direction}"
        return Term(LITERAL, value, dt, None)
    if language is not None:
        return Term(LITERAL, value, RDF_LANGSTRING, language.lower())
    return Term(LITERAL, value, datatype or XSD_STRING, None)


# ---------------------------------------------------------------------------
# N-Quads serialization / parsing (for tests and goldens)
# ---------------------------------------------------------------------------

_ESCAPES = {"\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r", "\t": "\\t"}


def _escape(s: str) -> str:
    return "".join(_ESCAPES.get(c, c) for c in s)


def term_to_nquads(t: Term) -> str:
    if t.kind == QUOTED:
        tr = t.value
        return (
            "<< "
            + term_to_nquads(tr.subject)
            + " "
            + term_to_nquads(tr.predicate)
            + " "
            + term_to_nquads(tr.obj)
            + " >>"
        )
    if t.kind == IRI:
        return f"<{t.value}>"
    if t.kind == BNODE:
        return f"_:{t.value}"
    out = f'"{_escape(t.value)}"'
    if t.datatype == RDF_LANGSTRING and t.language:
        out += f"@{t.language}"
    elif t.datatype and t.datatype != XSD_STRING:
        out += f"^^<{t.datatype}>"
    return out


def triple_to_nquads(t: Triple) -> str:
    parts = [
        term_to_nquads(t.subject),
        term_to_nquads(t.predicate),
        term_to_nquads(t.obj),
    ]
    if t.graph is not None:
        parts.append(term_to_nquads(t.graph))
    return " ".join(parts) + " ."


_NQ_TERM = r"""(<[^>]*>|_:[^\s]+|"(?:[^"\\]|\\.)*"(?:@[A-Za-z0-9\-]+|\^\^<[^>]*>)?)"""
_NQ_RE = re.compile(
    rf"^\s*{_NQ_TERM}\s+{_NQ_TERM}\s+{_NQ_TERM}(?:\s+{_NQ_TERM})?\s*\.\s*$"
)
_UNESCAPES = {"\\\\": "\\", '\\"': '"', "\\n": "\n", "\\r": "\r", "\\t": "\t"}


def _unescape(s: str) -> str:
    def repl(m: re.Match) -> str:
        e = m.group(0)
        if e in _UNESCAPES:
            return _UNESCAPES[e]
        if e.startswith("\\u"):
            return chr(int(e[2:], 16))
        if e.startswith("\\U"):
            return chr(int(e[2:], 16))
        return e[1]

    return re.sub(r"\\U[0-9A-Fa-f]{8}|\\u[0-9A-Fa-f]{4}|\\.", repl, s)


def parse_nquads_term(s: str) -> Term:
    if s.startswith("<"):
        return iri(_unescape(s[1:-1]))
    if s.startswith("_:"):
        return bnode(s)
    m = re.match(r'^"((?:[^"\\]|\\.)*)"(?:@([A-Za-z0-9\-]+)|\^\^<([^>]*)>)?$', s)
    assert m, s
    value = _unescape(m.group(1))
    if m.group(2):
        return Term(LITERAL, value, RDF_LANGSTRING, m.group(2))
    return Term(LITERAL, value, m.group(3) or XSD_STRING, None)


_NQ_STAR_TOKEN = re.compile(
    r'<<|>>|<[^>]*>|_:[^\s]+'
    r'|"(?:[^"\\]|\\.)*"(?:@[A-Za-z0-9\-]+|\^\^<[^>]*>)?|\.'
)


def _parse_nq_star_line(line: str) -> Triple:
    """N-Quads-star line with << s p o >> quoted-triple terms."""
    toks = _NQ_STAR_TOKEN.findall(line)
    pos = 0

    def parse_term() -> Term:
        nonlocal pos
        t = toks[pos]
        if t == "<<":
            pos += 1
            s = parse_term()
            p = parse_term()
            o = parse_term()
            if toks[pos] != ">>":
                raise ValueError(f"unterminated quoted triple: {line!r}")
            pos += 1
            return Term(QUOTED, Triple(s, p, o, None))
        pos += 1
        return parse_nquads_term(t)

    s = parse_term()
    p = parse_term()
    o = parse_term()
    g = None
    if pos < len(toks) and toks[pos] != ".":
        g = parse_term()
    return Triple(s, p, o, g)


def parse_nquads(text: str) -> list[Triple]:
    out = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        if line.startswith("<<") or " << " in line:
            out.append(_parse_nq_star_line(line))
            continue
        m = _NQ_RE.match(line)
        if not m:
            raise ValueError(f"bad N-Quads line: {line!r}")
        s, p, o, g = m.groups()
        out.append(
            Triple(
                parse_nquads_term(s),
                parse_nquads_term(p),
                parse_nquads_term(o),
                parse_nquads_term(g) if g else None,
            )
        )
    return out


# ---------------------------------------------------------------------------
# bnode-isomorphism comparison
# ---------------------------------------------------------------------------

def _signature(t: Triple) -> tuple:
    """Triple with bnodes wildcarded — used for grouping."""

    def w(term: Optional[Term]):
        if term is None:
            return None
        if term.kind == BNODE:
            return ("?",)
        if term.kind == QUOTED:
            tr = term.value
            return ("Q", w(tr.subject), w(tr.predicate), w(tr.obj))
        return (term.kind, term.value, term.datatype, term.language)

    return (w(t.subject), w(t.predicate), w(t.obj), w(t.graph))


def isomorphic(a: Iterable[Triple], b: Iterable[Triple], max_bnodes: int = 8) -> bool:
    """True if triple sets are equal up to bnode renaming.

    Exact bijection search with signature pre-check; documents in this
    pipeline have few bnodes so the permutation bound is fine (the
    reference harness also does per-test isomorphism,
    spec/suite_helper.rb:268-274).
    """
    a, b = list(set(a)), list(set(b))
    if len(a) != len(b):
        return False
    from collections import Counter

    if Counter(_signature(t) for t in a) != Counter(_signature(t) for t in b):
        return False
    def _bnodes_of(triples):
        out = set()

        def visit(term):
            if term is None:
                return
            if term.kind == BNODE:
                out.add(term.value)
            elif term.kind == QUOTED:
                tr = term.value
                visit(tr.subject)
                visit(tr.obj)

        for tr in triples:
            visit(tr.subject)
            visit(tr.obj)
            visit(tr.graph)
        return out

    a_bn = sorted(_bnodes_of(a))
    b_bn = sorted(_bnodes_of(b))
    if len(a_bn) != len(b_bn):
        return False
    if not a_bn:
        return set(a) == set(b)
    if len(a_bn) > max_bnodes:
        # fall back to canonical-hash comparison (deterministic refinement)
        return _canonical_hash(a) == _canonical_hash(b)

    set_b = set(b)

    def rename(tr: Triple, mapping: dict[str, str]) -> Triple:
        def m(term: Optional[Term]):
            if term is None:
                return term
            if term.kind == BNODE:
                return Term(BNODE, mapping[term.value])
            if term.kind == QUOTED:
                return Term(QUOTED, rename(term.value, mapping))
            return term

        return Triple(m(tr.subject), tr.predicate, m(tr.obj), m(tr.graph))

    for perm in permutations(b_bn):
        mapping = dict(zip(a_bn, perm))
        if all(rename(tr, mapping) in set_b for tr in a):
            return True
    return False


def _canonical_hash(triples: list[Triple]) -> str:
    """Iterative-refinement canonical labeling (URDNA2015-flavored but
    simplified): hash each bnode by its incident non-bnode structure,
    refine until stable, then serialize sorted."""
    import hashlib

    labels: dict[str, str] = {}
    bnodes = {
        t.value
        for tr in triples
        for t in (tr.subject, tr.obj) + ((tr.graph,) if tr.graph else ())
        if t.kind == BNODE
    }
    labels = {b: "" for b in bnodes}
    for _ in range(len(bnodes) + 2):
        new_labels = {}
        for b in bnodes:
            parts = []
            for tr in triples:
                def lab(term):
                    if term is None:
                        return "∅"
                    if term.kind == BNODE:
                        return "B" + labels[term.value] if term.value != b else "SELF"
                    return term.kind + term.value + (term.datatype or "") + (term.language or "")

                if (tr.subject.kind == BNODE and tr.subject.value == b) or (
                    tr.obj.kind == BNODE and tr.obj.value == b
                ):
                    parts.append(
                        "|".join([lab(tr.subject), lab(tr.predicate), lab(tr.obj), lab(tr.graph)])
                    )
            parts.sort()
            new_labels[b] = hashlib.sha256("\n".join(parts).encode()).hexdigest()
        if new_labels == labels:
            break
        labels = new_labels
    lines = []
    for tr in triples:
        def fin(term):
            if term is None:
                return "∅"
            if term.kind == BNODE:
                return "_:" + labels[term.value]
            return term_to_nquads(term)

        lines.append(" ".join([fin(tr.subject), fin(tr.predicate), fin(tr.obj), fin(tr.graph)]))
    lines.sort()
    import hashlib as h

    return h.sha256("\n".join(lines).encode()).hexdigest()
